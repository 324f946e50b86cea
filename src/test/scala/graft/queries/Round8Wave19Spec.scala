package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 nineteenth wave
  * (KMV sketch / quantile sketch / greedy cover) at sf0.001. */
class Round8Wave19Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def h60(e: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(e.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  // ----------------------------------------------------- kmv_sketch

  test("kmv: sketch estimates and set algebra match an exact replay") {
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = orders.filter(_._2 == "F").map(_._1).toSet
    val b = orders.filter(_._2 == "O").map(_._1).toSet
    def sketch(s: Set[Long]) =
      s.toSeq.map(k => h60(s"kmv#$k")).sorted.take(256)
    val (ha, hb) = (sketch(a), sketch(b))
    val hu = (ha ++ hb).distinct.sorted.take(256)
    def est(n: Long, mx: Long): Double =
      if (n <= 256) n.toDouble
      else new java.math.BigDecimal(255.0 * 1152921504606846976.0 / mx)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val out = SparkEntry.queries("q_kmv_sketch")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") === a.size.toLong)
    assert(r.getAs[Long]("n_b") === b.size.toLong)
    assert(r.getAs[Long]("n_union") === (a ++ b).size.toLong)
    assert(r.getAs[Long]("n_inter") === a.intersect(b).size.toLong)
    assert(r.getAs[Double]("est_a") === est(a.size, ha.max))
    assert(r.getAs[Double]("est_b") === est(b.size, hb.max))
    // sketch relative error stays inside the KMV bound ballpark
    // when estimating (exact when the set fits the sketch)
    if (a.size > 256)
      assert(math.abs(r.getAs[Double]("est_a") - a.size) < a.size * 0.25)
    val bothCnt = hu.count(h => ha.contains(h) && hb.contains(h))
    assert(r.getAs[Double]("jaccard_est") ===
      new java.math.BigDecimal(bothCnt.toDouble / hu.size)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
  }

  test("kmv: sketch build is a TakeOrdered heap; algebra broadcasts") {
    // the pinned sketches hide their build stage from the final
    // lineage — assert the build shape on an un-pinned twin
    val build = Tables.orders(spark, sf)
      .filter("o_orderstatus = 'F'")
      .select(org.apache.spark.sql.functions.col("o_custkey").as("k"))
      .distinct()
      .selectExpr(TextKit.h60("concat('kmv#', CAST(k AS STRING))") + " AS h")
      .orderBy("h").limit(256)
    assert(build.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val plan = SparkEntry.queries("q_kmv_sketch")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }

  // ------------------------------------------------ quantile_sketch

  test("quantile_sketch: exact arm is the true order statistic") {
    val ys = Tables.events(spark, sf)
      .selectExpr("CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT)")
      .collect().map(_.getLong(0)).sorted
    val n = ys.length.toLong
    val expects = Map("p50" -> (1L, 2L), "p90" -> (9L, 10L),
      "p99" -> (99L, 100L)).map { case (l, (num, den)) =>
      val k = math.floor((num * n + den - 1) / den.toDouble).toLong
      l -> (k, ys((k - 1).toInt))
    }
    val out = SparkEntry.queries("q_quantile_sketch")(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (k, xm) = expects(r.getString(0))
      assert(r.getAs[Long]("k_pos") === k)
      assert(r.getAs[Double]("exact") ===
        new java.math.BigDecimal(xm.toDouble / 1000000)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      // the estimate interpolates within one bin: error bounded by
      // a bin width
      val lo = ys.head; val hi = ys.last
      val w = (hi - lo).toDouble / 32 / 1000000
      assert(r.getAs[Double]("abs_err") <= w + 1e-9,
        s"${r.getString(0)} err ${r.getAs[Double]("abs_err")} > $w")
    }
  }

  // ----------------------------------------------------- greedy_cover

  test("greedy_cover: gains are the true greedy marginal gains") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        r.getLong(0) -> w.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSet
      }.toMap
    var covered = Set.empty[String]
    val exp = (1 to 5).flatMap { step =>
      val cands = docs.view.mapValues(t => (t -- covered).size)
        .filter(_._2 > 0).toSeq
      if (cands.isEmpty) None
      else {
        val (doc, gain) = cands.minBy { case (id, g) => (-g, id) }
        covered = covered ++ docs(doc)
        Some((step.toLong, doc, gain.toLong, covered.size.toLong))
      }
    }
    val out = SparkEntry.queries("q_greedy_cover")(spark, sf).collect()
    assert(out.length === exp.length)
    out.zip(exp).foreach { case (r, (step, doc, gain, cov)) =>
      assert(r.getAs[Long]("step") === step)
      assert(r.getAs[Long]("doc_id") === doc, s"step $step")
      assert(r.getAs[Long]("gain") === gain)
      assert(r.getAs[Long]("covered") === cov)
    }
    // submodularity: marginal gains never increase
    val gains = out.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
  }
}
