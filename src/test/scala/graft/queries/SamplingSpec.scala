package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Invariants of the sampling/export/mixture operators the oracle
  * hash can't express. */
class SamplingSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("export shards partition the corpus exactly (counts sum to |docs|)") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val shards = SparkEntry.queries("q_export_shards")(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(shards.map(_.getAs[Long]("n")).sum === total)
    assert(shards.forall(_.getAs[Long]("shard") < 16))
    // Deterministic: a second run yields the identical manifest.
    val again = SparkEntry.queries("q_export_shards")(spark, sf).collect()
    assert(shards.map(_.toSeq) === again.map(_.toSeq))
  }

  test("mixture weights sum to 1 and temperature flattens the head") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val rows = SparkEntry.queries("q_mixture_weights")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("toks"), r.getAs[Double]("weight")))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-5)
    // τ = 0.7 < 1 compresses ratios: the weight ratio between head
    // and tail languages must be strictly smaller than the raw token
    // ratio (that's the whole point of the knob).
    val byToks = rows.sortBy(-_._2)
    val (head, tail) = (byToks.head, byToks.last)
    assert(head._3 / tail._3 < head._2.toDouble / tail._2,
      s"temperature did not flatten: $head vs $tail")
  }
}
