package graft

/** Golden end-to-end run mirroring the reference's only test artifact
  * (examples.txt:11-33, a pasted search session with expected output):
  * q_knn_text on the sf0.001 fixture must return exactly these five
  * (vec_id, label, dist) rows, and the flagship entry must be
  * non-empty. Skipped when the testdata volume is absent. */
class GoldenSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q_knn_text golden rows on sf0.001") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val got = SparkEntry.queries("q_knn_text")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val expected = Seq(
      (7L, 1, 0.0),
      (382L, 6, 0.650146),
      (466L, 8, 0.675996),
      (209L, 4, 0.69375),
      (329L, 3, 0.694889))
    assert(got === expected)
  }

  test("flagship entry returns rows") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_knn_pq: the query vector self-encodes (ADC 0, rank 1), distances ascend") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    // vec_id 0 is both the query and a codebook entry: every subspace's
    // nearest code to its own sub-slice is itself at distance 0, so its
    // ADC total must be exactly 0.0 and it must rank first.
    val rows = SparkEntry.queries("q_knn_pq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows.head === ((0L, 0.0)))
    assert(rows.map(_._2) === rows.map(_._2).sorted)
    assert(rows.size === 5)
  }
}
