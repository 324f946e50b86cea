package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GraftFunctions
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Declared operator inventory (SURVEY.md §2). Order is the build
    * order; names are the §2 query keys. */
  def registry: Seq[Q] =
    VectorSearch.qs ++ Relational.qs ++ Joins.qs ++
      Aggregates.qs ++ Windows.qs ++ TextOps.qs ++ DedupSketches.qs ++
      Embedded.qs ++ Streaming.qs ++ ArrayOps.qs ++ Reshape.qs ++
      Multimodal.qs ++ Sampling.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_knn_filtered: scan → pushed filter → codegen cosine distance →
    * top-k (the reference's raison d'être, A8-A11). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_knn_filtered")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        Sessions.prepare(s)
        GraftFunctions.register(s)
        q.build(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
