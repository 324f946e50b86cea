package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One declared operator from SURVEY.md §2: a Spark builder and an
    * optional DuckDB oracle (ANSI SQL over the same parquet tables).
    * `oracle = None` → driver records a weaker rows-only check
    * (reserved for inherently non-SQL ops: ML surrogates, sketches).
    */
  final case class Q(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(
        build: (SparkSession, String) => DataFrame): Q =
      Q(name, build, Some(oracle))
    def noOracle(name: String)(
        build: (SparkSession, String) => DataFrame): Q =
      Q(name, build, None)
  }
}
