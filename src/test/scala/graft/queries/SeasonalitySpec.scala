package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan shape for q_seasonality at sf0.001. */
class SeasonalitySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("seasonality: cells partition each type and the index matches a Scala recompute") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "weekday(ts) + 1 AS dow", "hour(ts) AS hod",
        "CAST(round(value * 1000000) AS BIGINT) AS y6").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val out = SparkEntry.queries("q_seasonality")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n")).sum === ev.length)
    assert(out.forall { r =>
      val d = r.getAs[Int]("dow"); val h = r.getAs[Int]("hod")
      d >= 1 && d <= 7 && h >= 0 && h <= 23
    })
    ev.groupBy(_._1).foreach { case (typ, rows) =>
      val st = rows.map(_._4).sum
      val nt = rows.length.toLong
      val cells = rows.groupBy(e => (e._2, e._3))
      val mine = out.filter(_.getAs[String]("event_type") == typ)
      assert(mine.length === cells.size)
      mine.foreach { r =>
        val key = (r.getAs[Int]("dow"), r.getAs[Int]("hod"))
        val cell = cells(key)
        val s = cell.map(_._4).sum
        val n = cell.length.toLong
        assert(r.getAs[Long]("n") === n, s"n @ $typ $key")
        val mean = math.floor((2 * s + n) / (2.0 * n)) / 1e6
        assert(math.abs(r.getAs[Double]("mean_value") - mean) < 1e-12)
        val idx = (s.toDouble / n) / (st.toDouble / nt)
        assert(math.abs(r.getAs[Double]("seasonal_index") - idx) < 1e-6,
          s"index @ $typ $key")
      }
      // Count-weighted mean of the index over a type is 1 by
      // construction (Σ n·s/n / (N·S/N) = 1).
      val wsum = mine.map(r =>
        r.getAs[Long]("n") * r.getAs[Double]("seasonal_index")).sum
      assert(math.abs(wsum / nt - 1.0) < 1e-4, s"index normalization @ $typ")
    }
  }

  test("seasonality: corpus read once, totals broadcast") {
    val plan = SparkEntry.queries("q_seasonality")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "totals must aggregate the pinned cell frame")
    assert(!plan.contains("SortMergeJoin"))
  }
}
