package graft.queries

import java.math.{BigDecimal => JBD, RoundingMode}
import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 eleventh wave
  * (multivariate OLS / seasonal decomposition / inverted index) at
  * sf0.001. */
class Round8Wave11Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    new JBD(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  // ----------------------------------------------------- ols multi

  test("ols_multi: coefficients match a Scala Cramer recompute") {
    val rows = Tables.lineitem(spark, sf).selectExpr("l_returnflag",
      "round(l_quantity, 6)", "round(l_discount, 6)",
      "round(l_extendedprice, 6)").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => new JBD(r6(x)).setScale(6, RoundingMode.HALF_UP))
        .foldLeft(JBD.ZERO)(_.add(_)).doubleValue
    val out = SparkEntry.queries("q_ols_multi")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val g = rows.filter(_._1 == r.getString(0))
      val n = g.length.toDouble
      val (sx1, sx2, sy) = (dsum(g.map(_._2)), dsum(g.map(_._3)),
        dsum(g.map(_._4)))
      val sx11 = dsum(g.map(x => x._2 * x._2))
      val sx12 = dsum(g.map(x => x._2 * x._3))
      val sx22 = dsum(g.map(x => x._3 * x._3))
      val sx1y = dsum(g.map(x => x._2 * x._4))
      val sx2y = dsum(g.map(x => x._3 * x._4))
      val syy = dsum(g.map(x => x._4 * x._4))
      val det = n * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
      val b0 = r6((sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)) / det)
      val b1 = r6((n * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx2y - sx1y * sx2)) / det)
      val b2 = r6((n * (sx11 * sx2y - sx1y * sx12) -
        sx1 * (sx1 * sx2y - sx1y * sx2) +
        sy * (sx1 * sx12 - sx11 * sx2)) / det)
      assert(r.getAs[Long]("n") === g.length.toLong)
      assert(math.abs(r.getAs[Double]("b0") - b0) < 2e-6, "b0")
      assert(math.abs(r.getAs[Double]("b1") - b1) < 2e-6, "b1")
      assert(math.abs(r.getAs[Double]("b2") - b2) < 2e-6, "b2")
      val r2 = r.getAs[Double]("r2")
      assert(r2 > -1e-3 && r2 < 1, s"r2 = $r2")
    }
  }

  test("ols_multi: one pass — ten moments, no join, no window") {
    val plan = SparkEntry.queries("q_ols_multi")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length === 1)
    assert(!plan.contains("Join") && !plan.contains("Window"))
  }

  // -------------------------------------------- seasonal decompose

  test("seasonal_decompose: integer-micro identity and edge NULLs") {
    val days = Tables.events(spark, sf)
      .selectExpr("CAST(ts AS DATE)").collect()
      .map(_.getDate(0).toLocalDate)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = SparkEntry.queries("q_seasonal_decompose")(spark, sf)
      .collect().sortBy(_.getAs[java.sql.Date]("d").toLocalDate.toEpochDay)
    assert(out.length === days.size)
    // Edges: the centered 7-day window is incomplete for the first
    // and last 3 days — trend and residual must be NULL there.
    (out.take(3) ++ out.takeRight(3)).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("trend")))
      assert(r.isNullAt(r.fieldIndex("residual")))
    }
    out.foreach { r =>
      assert(days(r.getAs[java.sql.Date]("d").toLocalDate) ===
        r.getAs[Long]("y"))
      if (!r.isNullAt(r.fieldIndex("trend"))) {
        // Additive identity, exact at 6dp by integer-micro design.
        val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
          r.getAs[Double]("residual")
        assert(math.abs(back - r.getAs[Long]("y")) < 1e-6,
          s"y != t+s+r @ ${r.getAs[java.sql.Date]("d")}")
      }
    }
    // Seasonal indices are a 7-value dow profile repeated across rows.
    val byDow = out.filter(!_.isNullAt(2))
      .groupBy(_.getAs[java.sql.Date]("d").toLocalDate.getDayOfWeek)
      .values.map(_.map(_.getAs[Double]("seasonal")).distinct)
    byDow.foreach(vs => assert(vs.length === 1))
  }

  test("seasonal_decompose: calendar-frame plan, seasonal broadcast") {
    val plan = SparkEntry.queries("q_seasonal_decompose")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastHashJoin"),
      "the 7-row dow profile must broadcast onto the day frame")
  }

  // ------------------------------------------------ inverted index

  test("inverted_index: df/cf/postings match a Scala recompute") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
    val tf = docs.flatMap { case (id, ws) => ws.map((_, id)) }
      .groupBy(identity).map { case ((t, id), xs) =>
        (t, id) -> xs.length.toLong
      }
    val byTok = tf.groupBy(_._1._1)
    val out = SparkEntry.queries("q_inverted_index")(spark, sf).collect()
    assert(out.length === math.min(100, byTok.size))
    out.foreach { r =>
      val t = r.getString(0)
      val posts = byTok(t).toSeq
        .map { case ((_, id), c) => (id, c) }
      assert(r.getAs[Long]("df") === posts.length.toLong)
      assert(r.getAs[Long]("cf") === posts.map(_._2).sum)
      val expect = posts.sortBy { case (id, c) => (-c, id) }.take(5)
        .map { case (id, c) => s"$id:$c" }.mkString("|")
      assert(r.getAs[String]("top_postings") === expect, s"postings @ $t")
    }
    // df-descending output with token tie-break.
    val key = out.map(r => (-r.getAs[Long]("df"), r.getString(0))).toSeq
    assert(key === key.sorted)
  }

  test("inverted_index: token-key co-partitioned, top-100 TakeOrdered") {
    val plan = SparkEntry.queries("q_inverted_index")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
