package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 fourteenth wave
  * (ROC AUC / explicit HLL registers / k-core peeling) at sf0.001. */
class Round8Wave14Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  // ------------------------------------------------------------ auc

  test("auc: matches the brute-force pairwise Mann-Whitney AUC") {
    val rows = Tables.orders(spark, sf)
      .select("o_totalprice", "o_orderstatus").collect()
      .map { r =>
        val cents = (new java.math.BigDecimal(r.getDouble(0))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .doubleValue * 100 + 0.5).floor.toLong
        (cents, r.getString(1) == "F")
      }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    // 2U = #(pos > neg)·2 + #(pos == neg) — exact integer.
    var u2 = BigInt(0)
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val auc = round9(u2.toDouble / (2.0 * pos.length * neg.length))
    val out = SparkEntry.queries("q_auc")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pos") === pos.length.toLong)
    assert(r.getAs[Long]("n_neg") === neg.length.toLong)
    assert(r.getAs[Double]("auc") === auc)
    assert(r.getAs[Double]("gini_coef") ===
      round9(u2.toDouble / (1.0 * pos.length * neg.length) - 1))
  }

  test("auc: no SortMergeJoin and no partition-less data window") {
    val plan = SparkEntry.queries("q_auc")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    // Every Window in the plan must be partitioned (by the shard id).
    plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .foreach(l => assert(l.contains("bkt"), s"unpartitioned window: $l"))
  }

  // -------------------------------------------------- hll registers

  test("hll_registers: estimate matches an exact register replay") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val keys = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0))
    val reg = Array.fill(64)(0L)
    keys.foreach { ck =>
      val h = h60(s"hll#$ck")
      val idx = (h % 64).toInt
      val w = h / 64
      val rho =
        if (w == 0) 55L else 55L - java.lang.Long.toBinaryString(w).length
      if (rho > reg(idx)) reg(idx) = rho
    }
    val s2 = reg.map(m => 1L << (55 - m)).sum
    val vZero = reg.count(_ == 0).toLong
    val estRaw = round6(
      0.7213 / (1 + 1.079 / 64) * 64 * 64 * math.pow(2.0, 55) / s2)
    val est =
      if (estRaw <= 160.0 && vZero > 0) round6(64 * math.log(64.0 / vZero))
      else estRaw
    val exact = keys.distinct.length.toLong
    val out = SparkEntry.queries("q_hll_registers")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Int]("m") === 64)
    assert(r.getAs[Long]("v_zero") === vZero)
    assert(r.getAs[Double]("est_raw") === estRaw)
    assert(r.getAs[Double]("est") === est)
    assert(r.getAs[Long]("n_exact") === exact)
    assert(r.getAs[Double]("rel_err") === round6((est - exact) / exact))
    // HLL with m=64 has ~13% standard error; 4σ sanity bound.
    assert(math.abs(est - exact) / exact < 0.52)
  }

  // ---------------------------------------------------------- kcore

  test("kcore: convergence-stopped peeling (cap 8) reaches the exact fixpoint") {
    val ep = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (s"p${r.getLong(0)}", s"s${r.getLong(1)}"))
    var edges: Set[(String, String)] =
      (ep ++ ep.map { case (p, s) => (s, p) }).toSet
    var changed = true
    var rounds = 0
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
      rounds += 1
    }
    // The engine stops at the measured fixpoint (unchanged edge
    // count) and caps at the oracle's 8 peels; if the true fixpoint
    // ever needs more than 8, cap and oracle must move together.
    assert(rounds <= 8, s"fixpoint took $rounds rounds — raise the cap")
    val expect = edges.groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val out = SparkEntry.queries("q_kcore")(spark, sf).collect()
    assert(out.length === expect.size)
    out.foreach { r =>
      assert(r.getAs[Long]("deg") === expect(r.getString(0)))
      assert(r.getAs[Long]("deg") >= 3)
    }
    assert(out.map(_.getString(0)).toSeq === expect.keys.toSeq.sorted)
  }

  test("kcore: node frames broadcast — no SortMergeJoin in the plan") {
    val plan = SparkEntry.queries("q_kcore")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }
}
