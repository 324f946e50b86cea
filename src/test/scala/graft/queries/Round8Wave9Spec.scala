package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 ninth wave
  * (fuzzy match / Benford / cohort LTV / Naive Bayes) at sf0.001. */
class Round8Wave9Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---------------------------------------------------- fuzzy match

  test("fuzzy_match: pairs equal a Scala blocked-levenshtein recompute") {
    val dict = Tables.part(spark, sf).select("p_name").collect()
      .map(_.getString(0)).groupBy(identity).map { case (n, xs) =>
        n -> xs.length.toLong
      }
    val names = dict.keys.toSeq.sorted
    val expect = (for {
      a <- names; b <- names
      if a < b && a.take(2) == b.take(2) && lev(a, b) <= 4
    } yield (a, b, lev(a, b))).toSet
    val out = SparkEntry.queries("q_fuzzy_match")(spark, sf).collect()
    assert(out.map(r => (r.getString(0), r.getString(1),
      r.getAs[Int]("dist"))).toSet === expect)
    out.foreach { r =>
      assert(r.getAs[Long]("support1") === dict(r.getString(0)))
      assert(r.getAs[Long]("support2") === dict(r.getString(1)))
    }
  }

  test("fuzzy_match: dictionary self-join broadcasts inside blocks") {
    val plan = SparkEntry.queries("q_fuzzy_match")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the block key must be the equi-join key with the dictionary broadcast")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "blocking must keep levenshtein out of an all-pairs join")
  }

  // -------------------------------------------------------- benford

  test("benford: digits partition the orders and chi2 terms are exact") {
    val cents = Tables.orders(spark, sf).selectExpr(
      "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").collect()
      .map(_.getLong(0))
    val byDigit = cents.groupBy(_.toString.head.asDigit)
      .map { case (k, v) => k -> v.length.toLong }
    val out = SparkEntry.queries("q_benford")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("observed")).sum === cents.length.toLong)
    out.foreach { r =>
      assert(r.getAs[Long]("observed") === byDigit(r.getAs[Int]("digit")))
      assert(r.getAs[Double]("chi2_term") >= 0)
      assert(r.getAs[Double]("expected") > 0)
    }
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // Prices are uniform-ish, not Benford: digits 1-4 dominate (the
    // audit must actually discriminate, not rubber-stamp).
    val m = out.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("observed"))
      .toMap
    assert(m(1) > m(9) * 3, "uniform prices should flunk Benford visibly")
  }

  // ----------------------------------------------------- cohort ltv

  test("cohort_ltv: triangle invariants and monotone cumulative value") {
    val out = SparkEntry.queries("q_cohort_ltv")(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_orders")).sum === nOrders)
    out.groupBy(_.getAs[java.sql.Date]("cohort")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("age"))
      assert(sorted.head.getAs[Int]("age") === 0,
        "every cohort starts at age 0 (each customer's first order)")
      assert(sorted.head.getAs[Long]("n_active") ===
        sorted.head.getAs[Long]("cohort_size"))
      val ltv = sorted.map(_.getAs[Double]("ltv"))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a },
        "cumulative value per customer never decreases")
      rs.foreach(r => assert(r.getAs[Long]("n_active") <=
        r.getAs[Long]("cohort_size")))
    }
  }

  test("cohort_ltv: one window shuffle, cohort sizes broadcast back") {
    val plan = SparkEntry.queries("q_cohort_ltv")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastHashJoin"),
      "the age-0 size frame must broadcast onto the triangle")
  }

  // ---------------------------------------------------- naive bayes

  test("naive_bayes: confusion matrix matches an exact Scala recompute") {
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    def md5h28(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def r9(x: Double): JBD =
      new JBD(x, MathContext.DECIMAL128).setScale(9, RoundingMode.HALF_UP)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").filter(_.nonEmpty)))
    val (train, test) = docs.partition { case (id, _, _) =>
      md5h28(s"split#$id") < 214748365L
    }
    val ct = train.flatMap { case (_, l, w) => w.map((l, _)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tokc = train.flatMap { case (_, l, w) => w.map(_ => l) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val vocab = train.flatMap(_._3).toSet
    val langs = tokc.keys.toSeq.sorted
    val prior = train.groupBy(_._2).map { case (l, xs) =>
      l -> r9(math.log(xs.length.toDouble / train.length)).doubleValue
    }
    val lnp = (for (t <- vocab; l <- langs) yield (t, l) ->
      r9(math.log((ct.getOrElse((l, t), 0L) + 1).toDouble /
        (tokc(l) + vocab.size))).doubleValue).toMap
    val confusion = test.map { case (_, actual, w) =>
      val scores = langs.map { l =>
        val known = w.filter(vocab.contains)
        val tsum = known.map(t => r9(lnp((t, l))))
          .foldLeft(JBD.ZERO)(_.add(_)).doubleValue
        l -> r9(prior(l) + tsum).doubleValue
      }
      val predicted = scores.minBy { case (l, v) => (-v, l) }._1
      (actual, predicted)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = SparkEntry.queries("q_naive_bayes")(spark, sf).collect()
    assert(out.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("n")).toMap === confusion)
    assert(out.map(_.getAs[Long]("n")).sum === test.length.toLong)
  }

  test("naive_bayes: model frames broadcast onto the token stream") {
    val plan = SparkEntry.queries("q_naive_bayes")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      "the dense log-prob table and priors must broadcast, never shuffle")
  }
}
