package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 twenty-third
  * wave (Pareto mass / MMR rerank / skew audit) at sf0.001. */
class Round8Wave23Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // ---------------------------------------------------- pareto_mass

  test("pareto_mass: crossings match an exact sorted replay") {
    val cents = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT)")
      .collect().map(_.getLong(0)).sortBy(-_)
    val total = cents.map(BigInt(_)).sum
    val n = cents.length.toLong
    val out = SparkEntry.queries("q_pareto_mass")(spark, sf).collect()
    assert(out.map(_.getAs[Int]("pct")).toSeq === Seq(50, 90, 99))
    out.foreach { r =>
      val pct = r.getAs[Int]("pct")
      var cum = BigInt(0); var rows = 0
      while (cum * 100 < total * pct) { cum += cents(rows); rows += 1 }
      // ties on the crossing value share a distinct-frame row: the
      // operator counts whole distinct-value groups
      val cutoff = cents(rows - 1)
      val rowsWhole = cents.count(_ >= cutoff).toLong
      assert(r.getAs[Long]("rows_needed") === rowsWhole, s"pct $pct")
      assert(r.getAs[Double]("cutoff_value") ===
        round6(cutoff.toDouble / 100))
      assert(r.getAs[Double]("rows_frac") ===
        math.floor((2.0 * rowsWhole * 1000000 + n) / (2.0 * n)) / 1e6)
    }
    // monotonicity: more mass needs more rows
    val rn = out.map(_.getAs[Long]("rows_needed"))
    assert(rn.zip(rn.tail).forall { case (a, b) => a <= b })
  }

  // ----------------------------------------------------- mmr_rerank

  test("mmr_rerank: greedy picks match a driver-side MMR replay") {
    val e = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = e.toMap
    def dist(x: Array[Double], y: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      round6(1 - dot / math.sqrt(nx * ny))
    }
    val qv = byId(0L)
    val cand = e.filter(_._1 != 0L)
      .map { case (id, v) => (id, round6(1 - dist(v, qv))) }
      .sortBy { case (id, rel) => (1 - rel, id) }.take(20)
    val sims = (for ((i, _) <- cand; (j, _) <- cand if i != j)
      yield ((i, j), round6(1 - dist(byId(i), byId(j))))).toMap
    var selected = List.empty[Long]
    val exp = (1 to 5).map { r =>
      val picks = cand.filterNot(c => selected.contains(c._1))
        .map { case (id, rel) =>
          val red =
            if (selected.isEmpty) 0.0
            else selected.map(s => sims((id, s))).max
          val mmr = new java.math.BigDecimal(0.7 * rel - 0.3 * red)
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
          (id, rel, red, mmr)
        }
      val best = picks.minBy { case (id, _, _, mmr) => (-mmr, id) }
      selected = selected :+ best._1
      (r.toLong, best._1, best._2, round6(best._3), best._4)
    }
    val out = SparkEntry.queries("q_mmr_rerank")(spark, sf).collect()
    assert(out.length === 5)
    out.zip(exp).foreach { case (r, (rank, id, rel, red, mmr)) =>
      assert(r.getAs[Long]("rank") === rank)
      assert(r.getAs[Long]("vec_id") === id, s"rank $rank")
      assert(r.getAs[Double]("relevance") === rel)
      assert(r.getAs[Double]("redundancy") === red)
      assert(r.getAs[Double]("mmr_score") === mmr)
    }
    // diversification: the 5 picks are distinct and mmr non-increasing
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length === 5)
  }

  // ----------------------------------------------------- skew_audit

  test("skew_audit: bucket stats match an exact hash replay") {
    def h28(e: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(e.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 7), 16)
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = SparkEntry.queries("q_skew_audit")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("l_partkey", "l_suppkey"))
    Seq(("l_partkey", li.map(_._1)), ("l_suppkey", li.map(_._2)))
      .zip(out).foreach { case ((name, keys), r) =>
        val buckets = keys.map(k => h28(s"skew#$k") % 32)
          .groupBy(identity).map(_._2.size.toLong)
        assert(r.getAs[Long]("n_buckets") === buckets.size.toLong)
        assert(r.getAs[Long]("min_rows") === buckets.min)
        assert(r.getAs[Long]("max_rows") === buckets.max)
        assert(r.getAs[Double]("skew_ratio") === round6(
          buckets.max.toDouble * buckets.size / buckets.sum), name)
        assert(r.getAs[Double]("skew_ratio") >= 1.0)
      }
  }

  test("skew_audit: single fold — no joins, no windows") {
    val plan = SparkEntry.queries("q_skew_audit")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(!plan.contains("Window"))
  }
}
