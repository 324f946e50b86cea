package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape invariants for the round-4 pipeline verbs
  * (sessionize / SCD2 merge / compaction plan / winsorize / BM25 /
  * span dedup / semantic dedup) at sf0.001. The oracle hash-compare
  * proves cross-engine equality; these pin the properties a hash
  * can't see — interval algebra, packing bounds, recall against the
  * exact pair list — and the shuffle counts the 100 TB claims rest
  * on. */
class PipelineOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("sessionize: sessions are disjoint, gap-separated, and cover every event") {
    val out = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    assert(out.nonEmpty)
    val nEvents = Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_events")).sum === nEvents)
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val byNo = rows.sortBy(_.getAs[Long]("session_no"))
      byNo.foreach { r =>
        assert(!r.getAs[java.sql.Timestamp]("session_start")
          .after(r.getAs[java.sql.Timestamp]("session_end")))
      }
      byNo.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gapMs > 30 * 60 * 1000,
            s"consecutive sessions only $gapMs ms apart")
        case _ =>
      }
    }
  }

  test("sessionize: window and aggregation share ONE hash exchange") {
    val plan = SparkEntry.queries("q_sessionize")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx === 1, s"expected 1 hash exchange, plan had $hashEx")
  }

  test("scd2 merge: one current row per key, contiguous intervals, both change cases") {
    val out = SparkEntry.queries("q_merge_scd2")(spark, sf).collect()
    val byKey = out.groupBy(_.getAs[Long]("c_custkey"))
    byKey.foreach { case (k, rows) =>
      assert(rows.count(_.getAs[Int]("is_current") === 1) === 1,
        s"key $k: expected exactly one current version")
      val sorted = rows.sortBy(_.getAs[java.sql.Timestamp]("valid_from").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ===
            b.getAs[java.sql.Timestamp]("valid_from"),
            s"key $k: interval gap between versions")
        case _ =>
      }
      assert(sorted.last.getAs[java.sql.Timestamp]("valid_to") == null)
    }
    val updated = byKey.filter { case (k, rows) => k % 7 == 0 && k < 1000000 }
    assert(updated.nonEmpty && updated.values.forall(_.length === 2))
    assert(byKey.keys.exists(_ > 1000000), "no inserted NEWCOMER keys")
  }

  test("compact plan: bins cover the manifest and overflow by at most one file") {
    val out = SparkEntry.queries("q_compact_plan")(spark, sf).collect()
    val manifestFiles = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts"))).count().count()
    assert(out.map(_.getAs[Long]("n_files")).sum === manifestFiles)
    val target = 65536L
    out.groupBy(_.getAs[String]("event_type")).foreach { case (et, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted
      assert(bins.distinct.length === bins.length)
      // prefix-sum packing: every bin's byte total is < target + one
      // file, and only the last bin may be under-full relative to
      // where the running total crosses bin boundaries.
      rows.foreach { r =>
        val maxFile = 120L * Tables.events(spark, sf)
          .filter(col("event_type") === et)
          .groupBy(date_trunc("hour", col("ts"))).count()
          .agg(max("count")).head.getLong(0)
        assert(r.getAs[Long]("tot_bytes") <= target + 120L * maxFile,
          s"bin ${r.getAs[Long]("bin")} of $et overflows by more than one file")
      }
    }
  }

  test("bm25: at most 8 query terms hit, scores positive and sorted") {
    val out = SparkEntry.queries("q_bm25")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_hit") <= 8))
    assert(out.forall(_.getAs[Double]("score") > 0))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("span dedup: exact-duplicate documents score dup_frac 1.0") {
    // The corpus plants verbatim duplicates (q_dedup_exact's re-ingest
    // scenario builds on them); any two docs with identical text must
    // have every span duplicated.
    val docs = Tables.documents(spark, sf)
    val twins = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id")).distinct().collect().map(_.getLong(0)).toSet
    val out = SparkEntry.queries("q_span_dedup")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_frac")).toMap
    if (twins.nonEmpty)
      twins.foreach(id => assert(out(id) === 1.0, s"twin doc $id not fully dup"))
    // And fully-unique docs exist (the statistic is not degenerate).
    assert(out.values.exists(_ === 0.0))
  }

  test("semdedup: flagged dups are a subset of the exact pair list (precision 1)") {
    val out = SparkEntry.queries("q_semdedup")(spark, sf).collect()
    assert(out.map(_.getAs[Int]("cluster")).distinct.length <= 16)
    val flagged = out.filter(_.getAs[Int]("is_dup") === 1)
      .map(_.getAs[Long]("vec_id")).toSet
    val exactDup = SimilarityStages
      .allPairsSim(Tables.embeddings(spark, sf), tau = 0.4)
      .select(col("id2")).distinct().collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(exactDup),
      s"false positives: ${(flagged -- exactDup).take(5)}")
    // Recall is partial BY DESIGN (cross-cluster pairs unseen) but the
    // operator must actually find a meaningful share within clusters.
    if (exactDup.nonEmpty) {
      val recall = flagged.size.toDouble / exactDup.size
      assert(recall >= 0.2, s"semdedup recall $recall vs exact join")
    }
  }

  test("semdedup: the within-cluster join is an equi-join, never a cartesian") {
    val plan = SparkEntry.queries("q_semdedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "within-cluster pair join degraded to a cartesian product")
  }

  test("partition-pruned scan: the event_type filter resolves at planning time") {
    val df = SparkEntry.queries("q_partition_pruned")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters:[^\\]]*event_type#\\d+ = click".r
      .findFirstIn(plan).isDefined,
      s"no partition filter in scan:\n${plan.take(2000)}")
    // the pruned scan reads only the click partition's files, and the
    // result still covers every click row
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(df.agg(sum("n")).head.getLong(0) === clicks)
  }

  test("count-min sketch never undercounts and estimates are grid minima") {
    val out = SparkEntry.queries("q_agg_cms")(spark, sf).collect()
    assert(out.length === 10)
    assert(out.forall(_.getAs[Long]("overcount") >= 0),
      "CMS undercounted — the one thing it must never do")
    assert(out.forall(r => r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n")))
  }

  test("bitmap distinct: map-side combined and equal to the naive count") {
    val df = SparkEntry.queries("q_agg_bitmap_distinct")(spark, sf)
    assert(df.queryExecution.executedPlan.toString
      .contains("partial_bitmap_construct_agg"),
      "bitmap aggregation is not map-side combined")
    val naive = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach(r =>
      assert(r.getAs[Long]("ndv") === naive(r.getAs[String]("event_type"))))
  }

  test("time decay: newer events outweigh older ones at equal value") {
    val s = spark
    import s.implicits._
    // two synthetic users, same values, shifted 60 days apart
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val old = java.sql.Timestamp.valueOf("2024-04-02 00:00:00")
    val ev = Seq((1L, base, 10.0), (2L, old, 10.0)).toDF("user_id", "ts", "value")
    val decayed = ev.withColumn("term",
        col("value") * exp((unix_timestamp(col("ts")) - lit(1735689600L))
          * lit(math.log(2)) / lit(2592000.0)))
      .groupBy("user_id").agg(sum("term").as("dv"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(decayed(1L) > decayed(2L) * 3.9 && decayed(1L) < decayed(2L) * 4.1,
      s"60 days = 2 half-lives should quarter the weight: $decayed")
  }

  test("analyze stats: one row per column with sane bounds") {
    val out = SparkEntry.queries("q_analyze_stats")(spark, sf).collect()
    assert(out.length === 5)
    val n = Tables.lineitem(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("ndv") <= n && r.getAs[Long]("ndv") > 0)
      assert(r.getAs[Long]("n_null") === 0)
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("vmax"))
    }
  }
}
