package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 third wave
  * (A/B readout / χ² independence / Markov transitions) at sf0.001.
  * Each operator is checked against an independent Scala recompute,
  * plus the shuffle-shape claims the 100 TB notes make (PLANS.md). */
class Round8Wave3Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Test-side mirror of TextKit.h28 (first 7 md5 hex chars as a
    * 28-bit int). */
  private def h28(sx: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  // --------------------------------------------------------- abtest

  test("abtest: arms partition the events and Welch t matches a Scala recompute") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val out = SparkEntry.queries("q_abtest")(spark, sf).collect()
    assert(out.map(r => r.getAs[Long]("na") + r.getAs[Long]("nb")).sum
      === ev.length)
    out.foreach { r =>
      val typ = r.getAs[String]("event_type")
      val arms = ev.filter(_._2 == typ).map { case (u, _, v) =>
        (if (h28(s"ab1#$u") % 2 == 0) "A" else "B",
          math.rint(v * 1e6) / 1e6)
      }
      val a = arms.filter(_._1 == "A").map(_._2)
      val b = arms.filter(_._1 == "B").map(_._2)
      assert(r.getAs[Long]("na") === a.length, s"na @ $typ")
      assert(r.getAs[Long]("nb") === b.length, s"nb @ $typ")
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-4)
      assert(math.abs(r.getAs[Double]("mean_b") - mb) < 1e-4)
      def svar(x: Array[Double], m: Double) =
        x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
      val t = (mb - ma) /
        math.sqrt(svar(a, ma) / a.length + svar(b, mb) / b.length)
      assert(math.abs(r.getAs[Double]("t_welch") - t) < 1e-3,
        s"welch t @ $typ: got ${r.getAs[Double]("t_welch")}, want $t")
      assert(math.abs(r.getAs[Double]("lift") - (mb - ma) / ma) < 1e-4)
    }
  }

  test("abtest: one aggregation pass — no join, no window, one hash exchange") {
    val plan = SparkEntry.queries("q_abtest")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "both arms must fold in one groupBy")
    assert(!plan.contains("Window"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1)
  }

  // ----------------------------------------------------------- chi2

  test("chi2_indep: expected/contrib match a Scala recompute and marginals are consistent") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toDouble
    val rt = docs.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ct = docs.groupBy(_._2).map { case (k, v) => k -> v.length }
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length }
    val out = SparkEntry.queries("q_chi2_indep")(spark, sf).collect()
    assert(out.length === cells.size)
    assert(out.map(_.getAs[Long]("o")).sum === docs.length)
    out.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      assert(r.getAs[Long]("o") === cells(key).toLong)
      val e = rt(key._1).toDouble * ct(key._2) / n
      assert(math.abs(r.getAs[Double]("expected") - e) < 1e-6)
      val c = (cells(key) - e) * (cells(key) - e) / e
      assert(math.abs(r.getAs[Double]("contrib") - c) < 1e-5, s"contrib @ $key")
    }
  }

  test("chi2_indep: corpus read once — final plan has zero parquet scans, joins broadcast") {
    val plan = SparkEntry.queries("q_chi2_indep")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "totals must aggregate the pinned cell frame, not re-scan the corpus")
    assert(!plan.contains("SortMergeJoin"),
      "cell-frame-sized totals must broadcast")
  }

  // --------------------------------------------------------- markov

  test("markov_transitions: pair counts match a Scala recompute and rows sum to 1") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { seq =>
      val s = seq.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val out = SparkEntry.queries("q_markov_transitions")(spark, sf).collect()
    assert(out.length === pairs.size)
    out.foreach { r =>
      val key = (r.getAs[String]("src"), r.getAs[String]("dst"))
      assert(r.getAs[Long]("cnt") === pairs(key).toLong, s"cnt @ $key")
    }
    // Each source row of the matrix is a probability distribution.
    out.groupBy(_.getAs[String]("src")).foreach { case (src, rows) =>
      val p = rows.map(_.getAs[Double]("prob")).sum
      assert(math.abs(p - 1.0) < 1e-5, s"row sum @ $src = $p")
      val total = rows.head.getAs[Long]("total")
      assert(rows.map(_.getAs[Long]("cnt")).sum === total)
    }
  }

  test("markov_transitions: totals join is broadcast, not a shuffle join") {
    val plan = SparkEntry.queries("q_markov_transitions")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
