package graft

import org.apache.spark.sql.functions._

/** Ad-hoc STAGE profiler (round 18): times named internal stages of
  * the cost-cell queries that [[Profile]]'s whole-query timing can't
  * decompose — which stage of the banded dedup route owns the 100×
  * cell, and whether q_source_binary's cell is file LISTING,
  * scan-task scheduling, or byte throughput. Not part of the driver
  * contract; each probe prints `[probe] <name>: <sec> s` lines.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10.0 scripts/run.sh \
  *   graft.ProbeStages dedup_band dedup_pairs bin
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.GraftFunctions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    args.foreach {
      case "dedup_band" =>
        // The band build + (band, mh) exchange + checkpoint, alone.
        val docs = Tables.documents(spark, sfDir)
        time("dedup_band build+materialize") {
          noop(queries.DedupStages.bandedFrame(docs))
        }
      case "dedup_pairs" =>
        // Band build + bucket self-join + minimal-band screen +
        // scoring (no τ filter, no heap fold). Fresh banded frame —
        // run in its own JVM for a clean split vs dedup_band.
        val docs = Tables.documents(spark, sfDir)
        time("dedup_pairs scored-candidates") {
          noop(queries.DedupStages.bandedScoredPairs(docs, 64))
        }
      case "bin" =>
        // q_source_binary decomposition: staging (memoized, timed
        // separately on first build), LISTING (read.load builds the
        // InMemoryFileIndex eagerly), then the scan itself twice.
        val q = SparkEntry.queries("q_source_binary")
        val df0 = time("bin stage+construct")(q(spark, sfDir))
        time("bin scan 1 (incl. first listing reuse)")(noop(df0))
        val df1 = time("bin re-list+construct")(q(spark, sfDir))
        println(s"[probe] bin scan partitions: ${df1.rdd.getNumPartitions}")
        time("bin scan 2")(noop(df1))
      case name =>
        // Fallback: whole-query timing ×2 (Profile's behavior).
        (1 to 2).foreach { i =>
          time(s"$name iter $i")(noop(SparkEntry.queries(name)(spark, sfDir)))
        }
    }
    spark.stop()
  }
}
