package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Round-9 operator specs. First: q_anova, the one-way F-test that
  * landed in the round-8 snapshot commit without a spec (round-8
  * VERDICT "What's wrong" #1) — covered here with a real-data
  * recompute, planted separated/identical groups, and the plan
  * shape claim its SURVEY row makes (one conditional-moment
  * groupBy; everything after runs on the ≤k-row group frame). */
class Round9OpsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- anova

  test("anova: moments, df and F match a Scala recompute on real data") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.rint(r.getDouble(1) * 1e6) / 1e6))
    val groups = ev.groupBy(_._1).map { case (t, vs) =>
      t -> vs.map(_._2)
    }
    val k = groups.size
    val nn = ev.length
    val grand = ev.map(_._2).sum / nn
    val ssb = groups.values.map { vs =>
      val m = vs.sum / vs.length
      vs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { vs =>
      val m = vs.sum / vs.length
      vs.map(v => (v - m) * (v - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (nn - k))

    val out = SparkEntry.queries("q_anova")(spark, sf).collect()
    assert(out.length === k, "one row per factor level")
    assert(out.map(_.getAs[Long]("n")).sum === nn.toLong)
    out.foreach { r =>
      val typ = r.getAs[String]("event_type")
      val vs = groups(typ)
      assert(r.getAs[Long]("n") === vs.length.toLong, s"n @ $typ")
      assert(math.abs(r.getAs[Double]("group_mean") - vs.sum / vs.length)
        < 1e-4, s"mean @ $typ")
      assert(r.getAs[Long]("df1") === (k - 1).toLong)
      assert(r.getAs[Long]("df2") === (nn - k).toLong)
      assert(math.abs(r.getAs[Double]("ss_between") - ssb) < 1e-2 * ssb)
      assert(math.abs(r.getAs[Double]("ss_within") - ssw) < 1e-4 * ssw)
      assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-3 * math.max(f, 1.0),
        s"F @ $typ: got ${r.getAs[Double]("f_stat")}, want $f")
    }
  }

  /** Plant an events table with chosen per-group value distributions
    * and run q_anova on it (the StreamingSpec temp-parquet pattern;
    * ts must exist for the Tables.events nanos cast). */
  private def anovaOn(rows: Seq[(String, Double)]): Array[org.apache.spark.sql.Row] = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_anova_")
    rows.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, t, v, 1700000000000000000L + i * 1000000L)
    }.toDF("user_id", "event_type", "value", "ts")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_anova")(spark, dir.toString).collect()
  }

  test("anova: planted separated groups give a large F; identical groups give F = 0") {
    // Three groups, means 1 / 5 / 9, tiny within-group spread: F huge.
    val sep = for {
      (t, m) <- Seq("a" -> 1.0, "b" -> 5.0, "c" -> 9.0)
      i <- 0 until 8
    } yield (t, m + (i % 4) * 0.01)
    val hot = anovaOn(sep)
    assert(hot.length === 3)
    assert(hot.head.getAs[Double]("f_stat") > 1e4,
      s"separated means must dominate within-noise, F=${hot.head.getAs[Double]("f_stat")}")

    // Same multiset of values in every group: SSB = 0 exactly → F = 0.
    val flat = for {
      t <- Seq("a", "b", "c"); i <- 0 until 8
    } yield (t, 2.0 + (i % 4) * 0.5)
    val cold = anovaOn(flat)
    assert(cold.length === 3)
    assert(cold.head.getAs[Double]("ss_between") === 0.0)
    assert(cold.head.getAs[Double]("f_stat") === 0.0)
  }

  test("anova: nothing data-sized downstream of the moment groupBy") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    // The moment groupBy (the ONLY data-sized exchange) sits behind the
    // localCheckpoint boundary; everything in the final plan runs on
    // the ≤k-row group frame: no further hash exchange, and the grand
    // total joins back as a broadcast, never a shuffle join.
    val plan = SparkEntry.queries("q_anova")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "post-checkpoint stages must run on the k-row group frame")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "grand totals must re-join as a broadcast, not a shuffle join")
    assert(plan.contains("Scan ExistingRDD"),
      "the moment frame is checkpoint-pinned (O(1) lineage)")
  }
}
