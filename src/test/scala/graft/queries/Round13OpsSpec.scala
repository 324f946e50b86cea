package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Round-13 fix specs (round-12 advice): q_emd_drift's degenerate
  * corpora must still return the oracle's one global row, and
  * q_contrastive_pairs must emit NO triplets for a single-label
  * corpus (the label ring would wrap the negative onto the anchor's
  * own label). Each pins a planted fixture the driver testdata never
  * exercises. */
class Round13OpsSpec extends SparkTestBase {

  private def plantEvents(rows: Seq[(Long, String, Double, Long)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13_")
    rows.zipWithIndex.map { case ((u, t, v, ts), i) =>
      (i.toLong, ts, u, t, v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir.toString
  }

  private val t0 = 1700000000000000000L // 2023-11-14 UTC, nanos
  private def sec(n: Long): Long = t0 + n * 1000000000L

  // ---------------------------------------------------- q_emd_drift

  test("emd_drift: a single-distinct-value corpus still returns ONE " +
    "row (global agg), with NULL emd — matching the oracle's shape") {
    // All views and clicks share value 5.0 → one distinct value, the
    // term frame (needs a lead) is EMPTY. The old grouped plan
    // returned 0 rows here; the oracle returns 1 row with NULL emd.
    val out = SparkEntry.queries("q_emd_drift")(
      spark, plantEvents(Seq(
        (1L, "view", 5.0, sec(0)),
        (2L, "view", 5.0, sec(1)),
        (3L, "click", 5.0, sec(2))))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_view") === 2L)
    assert(r.getAs[Long]("n_click") === 1L)
    assert(r.getAs[Long]("n_values") === 1L)
    assert(r.isNullAt(r.fieldIndex("emd")), "empty term frame -> NULL emd")
  }

  test("emd_drift: two-point shifted distributions give the exact " +
    "hand-computable EMD") {
    // views at {0, 1}, clicks at {1}: F_view - F_click on [0,1) is
    // 0.5 - 0 = 0.5, width 1 → EMD = 0.5.
    val out = SparkEntry.queries("q_emd_drift")(
      spark, plantEvents(Seq(
        (1L, "view", 0.0, sec(0)),
        (2L, "view", 1.0, sec(1)),
        (3L, "click", 1.0, sec(2))))).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("emd") === 0.5)
  }

  // --------------------------------------------- q_contrastive_pairs

  test("contrastive_pairs: a single-label corpus emits no triplets " +
    "(no valid negative exists — the ring must not wrap onto the " +
    "anchor's own label)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13_")
    (0 until 8).map(i =>
      (i.toLong, Array(i.toFloat, 1.0f, 0.0f, 2.0f), 7))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_contrastive_pairs")(spark, dir.toString)
    assert(out.count() === 0L)
    // Two labels: every anchor gets a triplet again, and no negative
    // shares the anchor's label.
    val dir2 = java.nio.file.Files.createTempDirectory("graft_r13_")
    val rows =
      (0 until 6).map(i => (i.toLong, Array(i.toFloat, 1f, 0f, 2f), 0)) ++
      (6 until 12).map(i => (i.toLong, Array(1f, i.toFloat, 3f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir2/embeddings.parquet")
    val got = SparkEntry.queries("q_contrastive_pairs")(spark, dir2.toString)
      .collect()
    assert(got.length === 12)
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    got.foreach { r =>
      val a = r.getAs[Long]("vec_id"); val n = r.getAs[Long]("neg_id")
      val p = r.getAs[Long]("pos_id")
      assert(labelOf(a) === labelOf(p) && a != p)
      assert(labelOf(a) != labelOf(n))
    }
  }
}
