package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 sixteenth wave
  * (Zipf tail exponent) at sf0.001. */
class Round8Wave16Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // ----------------------------------------------------- zipf_alpha

  test("zipf_alpha: MLE matches an exact token-frequency replay") {
    val freqs = Tables.documents(spark, sf)
      .select("text").collect().iterator
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
      .toSeq.groupBy(identity).map { case (_, v) => v.size.toLong }.toSeq
    val vocab = freqs.size.toLong
    val nTokens = freqs.sum
    val tail = freqs.filter(_ >= 5L)
    val s = round9(tail.map(f =>
      BigDecimal(round9(math.log(f / 4.5)))).sum.toDouble)
    val alpha = round6(1 + tail.size / s)
    val out = SparkEntry.queries("q_zipf_alpha")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("vocab") === vocab)
    assert(r.getAs[Long]("n_tokens") === nTokens)
    assert(r.getAs[Long]("n_tail") === tail.size.toLong)
    assert(r.getAs[Double]("alpha") === alpha)
    // a natural-language-ish fixture lands in the broad Zipf band
    assert(alpha > 1.0 && alpha < 4.0)
  }

  test("zipf_alpha: folds on the frequency frame — no SortMergeJoin") {
    val plan = SparkEntry.queries("q_zipf_alpha")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }

  // -------------------------------------------------------- ks_test

  test("ks_test: D, location, and p match an exact CDF replay") {
    val rows = Tables.events(spark, sf)
      .filter("event_type IN ('view', 'click')")
      .selectExpr("event_type",
        "CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = rows.filter(_._1 == "view").map(_._2).sorted
    val b = rows.filter(_._1 == "click").map(_._2).sorted
    val (ta, tb) = (a.length.toLong, b.length.toLong)
    val svals = (a ++ b).distinct.sorted
    val cands = svals.map { s =>
      val ca = a.count(_ <= s).toLong; val cb = b.count(_ <= s).toLong
      (s, (BigInt(ca) * tb - BigInt(cb) * ta).abs)
    }
    val (loc, dnum) = cands.maxBy { case (s, d) => (d, -s) }
    val d = round9(dnum.toDouble / (ta.toDouble * tb))
    val out = SparkEntry.queries("q_ks_test")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") === ta)
    assert(r.getAs[Long]("n_b") === tb)
    assert(r.getAs[Double]("ks_value") ===
      round6(loc.toDouble / 1000000))
    assert(r.getAs[Double]("d_stat") === d)
    // p recomputed through the same rounded-argument chain
    val dr = dnum.toDouble / (ta.toDouble * tb)
    val z = round9(-2 * dr * dr * (ta.toDouble * tb / (ta + tb)))
    assert(r.getAs[Double]("p_asymp") ===
      round6(math.min(1.0, 2 * math.exp(z))))
    assert(d > 0 && d < 1)
  }

  test("ks_test: sharded prefix, top-1 pick — no partition-less window") {
    val plan = SparkEntry.queries("q_ks_test")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
    // every Window must be partitioned (the shard key)
    assert(!Range(0, 1).exists(_ =>
      plan.contains("Window") && plan.contains("PartitionBy: []")))
  }

  // ---------------------------------------------------- bloom_probe

  test("bloom_probe: bits, positives, and fpr match an exact replay") {
    def h60(e: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(e.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val build = Tables.orders(spark, sf)
      .filter("o_orderstatus = 'F'").select("o_custkey")
      .collect().map(_.getLong(0)).toSet
    val bits = (for (k <- build; i <- 0 to 2)
      yield h60(s"bloom#$i#$k") % 4096).toSet
    val probe = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0))
    val positive = probe.filter(k =>
      (0 to 2).forall(i => bits.contains(h60(s"bloom#$i#$k") % 4096)))
    val inSet = probe.filter(build.contains)
    val out = SparkEntry.queries("q_bloom_probe")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_build") === build.size.toLong)
    assert(r.getAs[Long]("bits_set") === bits.size.toLong)
    assert(r.getAs[Long]("n_probe") === probe.length.toLong)
    assert(r.getAs[Long]("n_positive") === positive.length.toLong)
    assert(r.getAs[Long]("n_in_set") === inSet.length.toLong)
    // the Bloom contract: NO false negatives — every in-set key
    // probes positive, so positives ⊇ in-set
    assert(positive.length >= inSet.length)
    assert(r.getAs[Long]("n_false_pos") ===
      positive.length.toLong - inSet.length)
    assert(r.getAs[Double]("fpr_observed") === round9(
      (positive.length - inSet.length).toDouble /
        (probe.length - inSet.length)))
  }

  test("bloom_probe: bit frame broadcasts into the probe join") {
    val plan = SparkEntry.queries("q_bloom_probe")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
