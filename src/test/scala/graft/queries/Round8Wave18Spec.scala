package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 eighteenth wave
  * (power analysis / conformal interval / gains curve) at sf0.001. */
class Round8Wave18Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  // ------------------------------------------------- power_analysis

  test("power_analysis: n_required grows as variance/mean² does") {
    val out = SparkEntry.queries("q_power_analysis")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val mean = r.getAs[Double]("mean")
      val varce = r.getAs[Double]("variance")
      val mde = r.getAs[Double]("mde")
      val req = r.getAs[Long]("n_required")
      assert(n >= 2 && mean > 0 && varce > 0 && mde > 0)
      // the closed form, recomputed coarsely: within ±1 of ceil
      val z2 = 2.801585 * 2.801585
      val approx = 2 * varce * z2 / (mde * mde)
      assert(math.abs(req - math.ceil(approx)) <= 1,
        s"${r.getString(0)}: req=$req approx=$approx")
    }
  }

  test("power_analysis: single moment fold — no join, no window") {
    val plan = SparkEntry.queries("q_power_analysis")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(!plan.contains("Window"))
  }

  // --------------------------------------------- conformal_interval

  test("conformal: q_resid is the k-th residual and coverage >= 0.9") {
    def h28(e: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(e.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 7), 16)
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "event_id",
        "CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = rows.groupBy(_._1)
    val out = SparkEntry.queries("q_conformal_interval")(spark, sf)
      .collect()
    assert(out.map(_.getString(0)).toSet === byType.keySet)
    out.foreach { r =>
      val et = r.getString(0)
      val (train, cal) = byType(et).partition(t => h28(s"cf#${t._2}") % 2 == 0)
      val yhat = (2 * train.map(_._3).sum + train.size) / (2L * train.size)
      val resid = cal.map(t => math.abs(t._3 - yhat)).sorted
      val k = ((9 * (cal.size + 1) + 9) / 10.0).floor.toInt
      assert(r.getAs[Long]("n_train") === train.size.toLong)
      assert(r.getAs[Long]("n_cal") === cal.size.toLong)
      assert(r.getAs[Long]("q_index") === k.toLong)
      val qr = resid(k - 1)
      assert(r.getAs[Double]("q_resid") ===
        round9(qr.toDouble / 1000000))
      val cov = resid.count(_ <= qr).toDouble / resid.size
      assert(r.getAs[Double]("coverage") === round9(cov))
      // the conformal guarantee on the calibration set itself
      assert(cov >= 0.9, s"$et coverage $cov")
    }
  }

  test("conformal: mean frame broadcasts — no SortMergeJoin") {
    val plan = SparkEntry.queries("q_conformal_interval")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }

  // ------------------------------------------------------ gains

  test("gains_curve: deciles partition the corpus; gain ends at 1") {
    val out = SparkEntry.queries("q_gains_curve")(spark, sf).collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val n = Tables.orders(spark, sf).count()
    val tp = Tables.orders(spark, sf)
      .filter("o_orderstatus = 'F'").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === n)
    assert(out.map(_.getAs[Long]("n_pos")).sum === tp)
    val last = out.last
    assert(last.getAs[Long]("cum_rows") === n)
    assert(last.getAs[Long]("cum_pos") === tp)
    assert(last.getAs[Double]("gain") === 1.0)
    // equal-frequency up to score-tie granularity: each decile
    // within 20% of n/10
    out.foreach(r => assert(
      math.abs(r.getAs[Long]("n_rows") - n / 10.0) <= n / 10.0 * 0.2))
    // cumulative gain is non-decreasing
    val gains = out.map(_.getAs[Double]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
  }

  test("gains_curve: sharded descending prefix — no global window") {
    val plan = SparkEntry.queries("q_gains_curve")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }
}
