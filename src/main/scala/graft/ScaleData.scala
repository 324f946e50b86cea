package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator for the large-SF self-checks (round-10
  * verdict #3): replicates the driver-generated sf tables `factor`×
  * with DISJOINT key ranges into a scratch directory, preserving
  * referential integrity (every foreign key is offset by the same
  * replica stride as its parent key), so a 10×/100× corpus exercises
  * the real plans without synthesizing a new distribution.
  *
  * Perturbations mirror the round-10 smoke so the dedup/similarity
  * regimes stay honest at scale:
  *  - `documents.text` of replica i > 0 gets a per-replica suffix
  *    token → replicas form factor-member NEAR-dup groups (Jaccard
  *    just under 1), not exact dups; n_chars is recomputed.
  *  - `embeddings.embedding` of replica i > 0 is shifted by a tiny
  *    per-replica epsilon → factor-member cosine near-dup clusters.
  *  - `events.ts` / `orders.o_orderdate` are NOT shifted: the
  *    calendar span is a constant of the workload (the global-window
  *    audit's bound), so 10× data = 10× rows per day, as a larger
  *    deployment would see.
  *
  * Usage: scripts/run.sh graft.ScaleData <srcSfDir> <outDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ScaleData <srcSfDir> <outDir> <factor>")
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    try generate(spark, src, out, factor)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // Dimension tables are fixed-cardinality by declaration.
    Seq("region", "nation").foreach(t => write(read(t), t))

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val cStride = stride(read("customer"), "c_custkey")
    val sStride = stride(read("supplier"), "s_suppkey")
    val pStride = stride(read("part"), "p_partkey")
    val oStride = stride(read("orders"), "o_orderkey")
    val eStride = stride(read("events"), "event_id")
    val uStride = stride(read("events"), "user_id")
    val dStride = stride(read("documents"), "doc_id")
    val vStride = stride(read("embeddings"), "vec_id")

    /** Union of `factor` shifted copies; `shifts` maps key column →
      * per-replica stride. `mutate` lets a table perturb payload
      * columns as a function of the replica index. */
    def replicate(df: DataFrame, shifts: Map[String, Long],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (k, st)) =>
          d.withColumn(k, col(k) + lit(i * st)) }
        mutate(shifted, i)
      }.reduce(_ unionByName _)

    write(replicate(read("customer"), Map("c_custkey" -> cStride)), "customer")
    write(replicate(read("supplier"), Map("s_suppkey" -> sStride)), "supplier")
    write(replicate(read("part"), Map("p_partkey" -> pStride)), "part")
    write(replicate(read("orders"),
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)), "orders")
    write(replicate(read("lineitem"),
      Map("l_orderkey" -> oStride, "l_partkey" -> pStride,
        "l_suppkey" -> sStride)), "lineitem")
    write(replicate(read("events"),
      Map("event_id" -> eStride, "user_id" -> uStride)), "events")
    write(replicate(read("documents"), Map("doc_id" -> dStride),
      mutate = (d, i) =>
        if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" r$i")))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents")
    write(replicate(read("embeddings"), Map("vec_id" -> vStride),
      mutate = (d, i) =>
        if (i == 0) d
        else d.withColumn("embedding",
          expr(s"transform(embedding, x -> CAST(x + ${i}e-4 AS FLOAT))"))),
      "embeddings")
  }
}
