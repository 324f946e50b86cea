package graft

/** Ad-hoc per-query profiler: run named queries N times (default 2 —
  * warm-up vs steady-state) against SPARK_GRAFT_SF_DIR with the
  * bench's noop sink. Not part of the driver contract.
  *
  * Round-18 additions for the sweep-variance hunt: per-iteration GC
  * time, old-gen occupancy and live persisted-block bytes are
  * printed, and SPARK_GRAFT_PROFILE_UNPERSIST=1 drops orphaned
  * persisted RDDs between iterations (the Bench hygiene) so the
  * accumulation hypothesis can be A/B'd on a single key.
  * SPARK_GRAFT_PROFILE_REPS overrides the iteration count. */
object Profile {
  def main(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val reps = sys.env.get("SPARK_GRAFT_PROFILE_REPS").map(_.toInt).getOrElse(2)
    val unp = sys.env.get("SPARK_GRAFT_PROFILE_UNPERSIST").contains("1")
    val gcBeans =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    val oldPools =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.toLowerCase.contains("old") ||
          p.getName.toLowerCase.contains("tenured"))
    var lastGc = gcBeans.map(_.getCollectionTime).sum
    args.foreach { name =>
      (1 to reps).foreach { it =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val gc = gcBeans.map(_.getCollectionTime).sum
        val gcSec = (gc - lastGc) / 1000.0; lastGc = gc
        val oldMb = oldPools.map(_.getUsage.getUsed).sum / 1048576
        val cachedMb = spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum / 1048576
        println(f"[profile] $name iter $it: $sec%.2f s  " +
          f"gc=$gcSec%.1f s old=$oldMb MB cached=$cachedMb MB")
        if (unp) {
          // BLOCKING unpersist BEFORE clearCache, as in Bench: the
          // non-blocking form defers the multi-GB MemoryStore
          // eviction into the next iteration's timed window, and the
          // reverse order races clearCache's async buffer removal.
          spark.sparkContext.getPersistentRDDs.values.foreach { r =>
            try r.unpersist(blocking = true)
            catch { case _: Throwable => () }
          }
          spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
