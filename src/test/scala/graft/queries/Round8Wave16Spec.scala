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
}
