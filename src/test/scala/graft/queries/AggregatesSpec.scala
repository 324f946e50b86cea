package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Error-bound proofs for the deterministic sketch aggregates. Both
  * sketches are hash-oracled in CORRECTNESS (DuckDB replays the same
  * md5-derived algorithm), so these tests pin the other half of the
  * contract: the approximation actually approximates — the KMV
  * estimate sits within its declared rsd of the exact twin, and the
  * histogram quantile within one bucket width — and the KMV top-k
  * runs as a partial per-map WindowGroupLimit (the fixed-memory
  * shuffle shape that makes it a sketch at 100 TB, not a sort). */
class AggregatesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.01"

  test("KMV approx distinct stays within 3×rsd of the exact twin per group") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    // k = 64 ⇒ rsd ≈ 1/√(k−2) ≈ 0.127; 3σ ≈ 0.38.
    val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.38,
        s"event_type=${r.get(0)}: approx=$approx exact=$exact relErr=$relErr > 0.38")
    }
  }

  test("KMV rank<=k filter runs as a partial WindowGroupLimit before the shuffle") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val plan = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=64 not pushed to a per-map group limit:\n$plan")
  }

  test("histogram quantile sits within one bucket width of the exact value") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val rows = SparkEntry.queries("q_agg_approx_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val widths = graft.Tables.events(spark, sf).groupBy("event_type")
      .agg(((max(col("value")) - min(col("value"))) / 128).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val et = r.getString(0)
      val w = widths(et)
      val a50 = r.getAs[Double]("approx_p50")
      val a90 = r.getAs[Double]("approx_p90")
      val e50 = r.getAs[Double]("exact_p50")
      val e90 = r.getAs[Double]("exact_p90")
      assert(math.abs(a50 - e50) <= w, s"$et p50: |$a50 - $e50| > bucket width $w")
      assert(math.abs(a90 - e90) <= w, s"$et p90: |$a90 - $e90| > bucket width $w")
    }
  }
}
