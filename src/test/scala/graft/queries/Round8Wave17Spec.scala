package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 seventeenth wave
  * (ACF / info-gain stump / local clustering coefficient) at sf0.001. */
class Round8Wave17Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // ------------------------------------------------------------ acf

  test("acf: lags match an exact integer-deviation replay") {
    val days = Tables.events(spark, sf)
      .selectExpr("CAST(ts AS DATE) AS d").groupBy("d").count()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val n = days.length.toLong
    val total = days.map(_._2).sum
    val dev = days.map { case (d, y) => (d, BigInt(y * n - total)) }.toMap
    val den = dev.values.map(e => e * e).sum
    val exp = (1 to 14).flatMap { k =>
      val pairs = dev.keys.toSeq.flatMap(d =>
        dev.get(d.minusDays(k)).map(ep => dev(d) * ep))
      if (pairs.isEmpty) None
      else Some(k.toLong ->
        (pairs.length.toLong,
          round6((BigDecimal(pairs.sum) / BigDecimal(den)).toDouble)))
    }.toMap
    val out = SparkEntry.queries("q_acf")(spark, sf).collect()
    assert(out.length === exp.size)
    out.foreach { r =>
      val k = r.getAs[Number]("lag").longValue
      val (np, acf) = exp(k)
      assert(r.getAs[Long]("n_pairs") === np, s"pairs @ lag $k")
      assert(r.getAs[Double]("acf") === acf, s"acf @ lag $k")
    }
    // lag-0 identity sanity: every |r_k| <= 1
    assert(out.forall(r => math.abs(r.getAs[Double]("acf")) <= 1.0))
  }

  test("acf: day-frame self-join broadcasts — no SortMergeJoin") {
    val plan = SparkEntry.queries("q_acf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }

  // ------------------------------------------------------ info_gain

  test("info_gain: best split matches an exhaustive replay") {
    val rows = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT)",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val svals = rows.map(_._1).distinct.sorted
    val tp = rows.count(_._2 == 1).toLong
    val tn = rows.length - tp
    val nTot = tp + tn
    def pl(c: Long, n: Long): Double =
      if (c == 0) 0.0
      else round9(c.toDouble / n * math.log(c.toDouble / n))
    val h0 = -(pl(tp, nTot) + pl(tn, nTot))
    val cands = svals.map { s =>
      val ca = rows.count(t => t._1 <= s && t._2 == 1).toLong
      val cb = rows.count(t => t._1 <= s && t._2 == 0).toLong
      (s, ca, cb)
    }.filter { case (_, ca, cb) => ca + cb < nTot }
    val igs = cands.map { case (s, ca, cb) =>
      val nl = ca + cb; val nr = nTot - nl
      val hl = -(pl(ca, nl) + pl(cb, nl))
      val hr = -(pl(tp - ca, nr) + pl(tn - cb, nr))
      (s, ca, cb,
        round9(h0 - nl.toDouble / nTot * hl - nr.toDouble / nTot * hr))
    }
    val (bs, bca, bcb, big) = igs.maxBy { case (s, _, _, ig) => (ig, -s) }
    val out = SparkEntry.queries("q_info_gain")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("split_value") === round6(bs.toDouble / 100))
    assert(r.getAs[Long]("n_left") === bca + bcb)
    assert(r.getAs[Long]("pos_left") === bca)
    assert(r.getAs[Long]("n_right") === nTot - bca - bcb)
    assert(r.getAs[Double]("entropy_before") === round9(h0))
    assert(r.getAs[Double]("info_gain") === big)
    assert(big >= 0.0 && big <= r.getAs[Double]("entropy_before"))
  }

  test("info_gain: sharded prefix + top-1 pick (no global window)") {
    val plan = SparkEntry.queries("q_info_gain")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  // ----------------------------------------------- clustering_coeff

  test("clustering_coeff: coefficients match a brute-force replay") {
    val li = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        TextKit.h28("concat('tri#', CAST(l_partkey AS STRING))")) % 2 === 0)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val nbrs = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exp = nbrs.filter(_._2.size >= 2).map { case (v, nb) =>
      val t = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => edges.contains(if (a < b) (a, b) else (b, a)) }
      val d = nb.size.toLong
      (v, (d, t.toLong, round9(2.0 * t / (d.toDouble * (d - 1)))))
    }
    val out = SparkEntry.queries("q_clustering_coeff")(spark, sf).collect()
    assert(out.length === math.min(50, exp.size))
    out.foreach { r =>
      val (d, t, c) = exp(r.getAs[Long]("node"))
      assert(r.getAs[Long]("degree") === d)
      assert(r.getAs[Long]("triangles") === t)
      assert(r.getAs[Double]("coeff") === c)
    }
    // the returned prefix is the top of the total order
    val got = out.map(r => (r.getAs[Double]("coeff"),
      r.getAs[Long]("degree"), r.getAs[Long]("node")))
    val sorted = exp.toSeq.map { case (v, (d, _, c)) => (c, d, v) }
      .sortBy { case (c, d, v) => (-c, -d, v) }
      .take(math.min(50, exp.size)).map(t => (t._1, t._2, t._3))
    assert(got.toSeq === sorted)
  }

  test("clustering_coeff: triangle corners broadcast onto degrees") {
    val plan = SparkEntry.queries("q_clustering_coeff")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
