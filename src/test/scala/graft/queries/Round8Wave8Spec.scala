package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 eighth wave
  * (association rules / Gini / Kaplan-Meier / RFM) at sf0.001. */
class Round8Wave8Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------- association rules

  test("assoc_rules: counts and lift match a Scala recompute of the baskets") {
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val icnt = baskets.groupBy(_._2).map { case (p, xs) =>
      p -> xs.length.toLong
    }
    val pcnt = baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- ps.indices if ps(i) < ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val out = SparkEntry.queries("q_assoc_rules")(spark, sf).collect()
    assert(out.length === math.min(100, pcnt.size))
    out.foreach { r =>
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      assert(r.getAs[Long]("pair_cnt") === pcnt((p1, p2)), s"pair @ $p1,$p2")
      assert(r.getAs[Long]("cnt1") === icnt(p1))
      assert(r.getAs[Long]("cnt2") === icnt(p2))
      val lift = pcnt((p1, p2)).toDouble * nOrders / (icnt(p1) * icnt(p2))
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-5)
      assert(r.getAs[Double]("confidence") <= 1.0 + 1e-9)
    }
    // Descending lift with (p1, p2) tie-break.
    val key = out.map(r => (-r.getAs[Double]("lift"),
      r.getAs[Long]("p1"), r.getAs[Long]("p2"))).toSeq
    assert(key === key.sorted)
  }

  test("assoc_rules: item counts broadcast, top-100 is TakeOrdered") {
    val plan = SparkEntry.queries("q_assoc_rules")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      "item-count frames must broadcast onto the pair frame")
  }

  // --------------------------------------------------------- gini

  test("gini: matches the rank-formula recompute per priority") {
    val rows = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "round(o_totalprice, 6)", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val out = SparkEntry.queries("q_gini")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val prio = r.getAs[String]("prio")
      val xs = rows.filter(_._1 == prio).sortBy(t => (t._2, t._3))
      val n = xs.length.toLong
      val s = xs.map(x => BigDecimal(x._2).setScale(6)).sum.toDouble
      val ws = xs.zipWithIndex.map { case ((_, x, _), i) =>
        BigDecimal(math.rint((i + 1) * x * 1e6) / 1e6).setScale(6)
      }.sum.toDouble
      val gini = (2 * ws - (n + 1) * s) / (n * s)
      assert(r.getAs[Long]("n") === n)
      assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-5, s"gini @ $prio")
      assert(r.getAs[Double]("gini") >= 0 && r.getAs[Double]("gini") < 1)
    }
  }

  // ----------------------------------------------------- survival

  test("survival: curve matches a Scala Kaplan-Meier recompute") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day",
        "round(value, 6) > 200 AS hi").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getBoolean(2)))
    // .toSeq BEFORE .map: mapping a Map to (dur, observed) pairs
    // would re-key by dur and silently collapse same-duration users.
    val users = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val t0 = xs.map(_._2).min
      val conv = xs.filter(_._3).map(_._2)
      if (conv.nonEmpty)
        (java.time.temporal.ChronoUnit.DAYS.between(t0, conv.min), true)
      else
        (java.time.temporal.ChronoUnit.DAYS.between(t0, xs.map(_._2).max),
          false)
    }.toSeq
    val out = SparkEntry.queries("q_survival")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("d_events")).sum ===
      users.count(_._2).toLong)
    assert(out.map(_.getAs[Long]("censored")).sum ===
      users.count(!_._2).toLong)
    var atRisk = users.size.toLong
    var surv = 1.0
    out.sortBy(_.getAs[Int]("dur")).foreach { r =>
      val dur = r.getAs[Int]("dur").toLong
      assert(r.getAs[Long]("at_risk") === atRisk, s"at_risk @ $dur")
      val d = r.getAs[Long]("d_events")
      if (d > 0) surv *= 1.0 - d.toDouble / atRisk
      assert(math.abs(r.getAs[Double]("survival") - surv) < 1e-5,
        s"S @ $dur")
      atRisk -= users.count(_._1 == dur).toLong
    }
    // KM is nonincreasing and bounded by (0, 1].
    val s = out.sortBy(_.getAs[Int]("dur")).map(_.getAs[Double]("survival"))
    assert(s.sameElements(s.sorted.reverse))
    assert(s.forall(v => v >= 0 && v <= 1))
  }

  test("survival: one pass over events — conditional min, no self-join") {
    val plan = SparkEntry.queries("q_survival")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length === 1,
      "per-user extent must fold in one scan")
    assert(!plan.contains("SortMergeJoin"))
  }

  // ---------------------------------------------------------- rfm

  test("rfm: cells partition the customers and scores stay in range") {
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    val out = SparkEntry.queries("q_rfm")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n")).sum === nCust)
    out.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c)
        assert(v >= 1 && v <= 5, s"$c = $v")
      }
      val (rs, fs, ms) = (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
        r.getAs[Int]("m_score"))
      val expect =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (fs >= 4) "loyal"
        else if (ms >= 4) "big_spender"
        else if (rs <= 2 && fs >= 3) "at_risk"
        else if (rs <= 2) "hibernating"
        else "regular"
      assert(r.getAs[String]("segment") === expect)
    }
    // Quintiles: no single score value may hold more than ~3/5 of
    // customers (equal-frequency boundaries with heavy ties can
    // merge at most adjacent buckets).
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val byScore = out.groupBy(_.getAs[Int](c))
        .map { case (_, rs) => rs.map(_.getAs[Long]("n")).sum }
      assert(byScore.max <= (nCust * 3) / 5 + 1, s"$c too concentrated")
    }
  }

  test("rfm: boundary frame broadcasts — no shuffle join, no window") {
    val plan = SparkEntry.queries("q_rfm")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("Window"),
      "scores come from broadcast boundaries, not a global rank")
  }
}
