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
}
