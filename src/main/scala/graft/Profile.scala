package graft

/** Ad-hoc per-query profiler: run named queries twice (warm-up vs
  * steady-state) against SPARK_GRAFT_SF_DIR with the bench's noop
  * sink. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { name =>
      (1 to 2).foreach { it =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        println(f"[profile] $name iter $it: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
