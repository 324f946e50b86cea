package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan shape for q_discretize at sf0.001: broadcast
  * decile binning must partition each type exactly and put
  * near-equal mass in each bucket, without ever sorting or
  * windowing the fact table. */
class DiscretizeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("discretize: buckets partition each type; assignment matches a Scala fold") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val out = SparkEntry.queries("q_discretize")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n")).sum === ev.length)
    ev.groupBy(_._1).foreach { case (typ, rows) =>
      val vals = rows.map(_._2).sorted
      // Boundary recompute: linear-interpolated quantiles (the
      // percentile/quantile_cont contract), rounded to 6dp.
      val qs = (1 to 9).map { i =>
        val idx = (vals.length - 1) * i / 10.0
        val lo = vals(idx.toInt)
        val hi = vals(math.min(idx.toInt + 1, vals.length - 1))
        math.rint((lo + (hi - lo) * (idx - idx.toInt)) * 1e6) / 1e6
      }
      val counts = rows.map { case (_, v) =>
        qs.count(q => math.rint(v * 1e6) / 1e6 > q)
      }.groupBy(identity).map { case (k, v) => k -> v.size }
      val mine = out.filter(_.getAs[String]("event_type") == typ)
      assert(mine.map(_.getAs[Long]("n")).sum === rows.length)
      mine.foreach { r =>
        val b = r.getAs[Int]("bucket")
        assert(r.getAs[Long]("n") === counts.getOrElse(b, 0).toLong,
          s"bucket $b @ $typ")
        if (b > 0) assert(math.abs(r.getAs[Double]("lo") - qs(b - 1)) < 1e-9)
        else assert(r.isNullAt(r.fieldIndex("lo")))
        if (b < 9) assert(math.abs(r.getAs[Double]("hi") - qs(b)) < 1e-9)
        else assert(r.isNullAt(r.fieldIndex("hi")))
      }
      // Equal-frequency property: each decile holds ~10% of the type.
      val n = rows.length
      mine.foreach { r =>
        assert(math.abs(r.getAs[Long]("n") - n / 10.0) <= n * 0.05 + 2,
          s"bucket mass skew @ $typ: ${r.getAs[Long]("n")} of $n")
      }
    }
  }

  test("discretize: no window, no shuffle join — boundaries broadcast onto the scan") {
    val plan = SparkEntry.queries("q_discretize")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "binning must be broadcast-assignment, not a ranked window")
    assert(!plan.contains("SortMergeJoin"))
  }
}
