package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Correctness signal for the sketch aggregate the DuckDB oracle
  * can't replay (HLL++ implementations differ across engines): the
  * approximate distinct must sit within the error the sketch
  * declares. rsd=0.02 ⇒ |approx − exact| / exact ≤ 3σ = 0.06 per
  * group (and the testdata cardinalities are far inside the regime
  * where HLL++ uses its bias-corrected dense path). */
class AggregatesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within 3×rsd of the exact twin per group") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.06,
        s"event_type=${r.get(0)}: approx=$approx exact=$exact relErr=$relErr > 0.06")
    }
  }
}
