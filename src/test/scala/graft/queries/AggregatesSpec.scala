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

  test("approx_percentile sits within the declared rank error of the exact value") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    // accuracy=1000 bounds the RANK error at n/1000; converting rank
    // tolerance to value space, the approx p-quantile must lie
    // between the exact (p−ε) and (p+ε) quantiles with ε = 5/1000
    // (5× the bound — generous against interpolation differences,
    // still catches a broken sketch outright).
    val rows = SparkEntry.queries("q_agg_approx_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val bounds = graft.Tables.events(spark, sf).groupBy("event_type")
      .agg(expr("percentile(value, array(0.495, 0.505, 0.895, 0.905))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val et = r.getString(0)
      val Seq(lo50, hi50, lo90, hi90) = bounds(et)
      val a50 = r.getAs[Double]("approx_p50")
      val a90 = r.getAs[Double]("approx_p90")
      assert(a50 >= lo50 && a50 <= hi50, s"$et p50: $a50 outside [$lo50, $hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"$et p90: $a90 outside [$lo90, $hi90]")
    }
  }
}
