package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md /
  * FIXTURES.md). One parquet file per table under the scale-factor
  * directory passed to every query.
  *
  * Reads are plain `spark.read.parquet` so Catalyst's column pruning
  * and predicate pushdown reach the scan (verify with
  * `.explain("formatted")` → `ReadSchema` / `PushedFilters`). On a
  * real cluster these paths would be catalog tables with
  * partitioning; the loader seam keeps that swap local.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set at session build —
    * [[Sessions]]) and truncate to microsecond TimestampType —
    * lossless here (the generator emits µs-precision values; verified
    * ns remainder is 0 across sf0.01) and matches DuckDB's
    * `CAST(ts AS TIMESTAMP)` in every oracle.
    *
    * `DIV 1000` truncates toward zero, which equals floor only for
    * ts >= 0 — the generator emits 2024 epochs only; a pre-1970 feed
    * would need floor semantics ((ts - ((ts % 1000) + 1000) % 1000)
    * DIV 1000) to round consistently. */
  def events(s: SparkSession, d: String): DataFrame = {
    Sessions.prepare(s)
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("CAST(ts DIV 1000 AS LONG)")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
