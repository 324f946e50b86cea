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
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Note the session's current fixture dir: scale routes that have
    // no dir in scope (the loop-frame storage route below) read it
    // back. Every query reads its tables before pinning frames, so
    // the note is always fresh by the time loopPin consults it.
    spark.conf.set("spark.graft.fixture.dir", dir)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Total on-disk bytes of a table's parquet footprint — a FREE
    * driver-side size signal for plan gating (a directory listing,
    * no Spark job; on a real cluster this is the catalog's
    * sizeInBytes statistic). 0 for a missing table so gates degrade
    * to their small-input plan instead of throwing. */
  def tableBytes(d: String, name: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(walk).sum)
      else f.length()
    val f = new java.io.File(s"$d/$name.parquet")
    if (f.exists()) walk(f) else 0L
  }

  /** Per-(JVM, fixture-dir) documents row-count memo (round-15
    * verdict #5): every size-gated text/dedup route reads this to
    * dispatch, and the count is a parquet-footer-only job — but two
    * footer scans per query invocation is pure overhead at
    * 10⁶-file scale. The fixtures are immutable per run, so a stale
    * entry cannot occur; a long-lived service would key this on the
    * table's commit version instead. */
  private val docCountMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def docCount(s: SparkSession, d: String): Long =
    docCountMemo.computeIfAbsent(d, dir => documents(s, dir).count())

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.ts normalization to session-zoned microsecond
    * TimestampType, robust to the parquet vintage the generator
    * emitted — the testdata has shipped `ts` both as
    * TIMESTAMP(NANOS) (read as BIGINT under
    * `spark.sql.legacy.parquet.nanosAsLong`, set at session build —
    * [[Sessions]]) and as plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Branch on the READ dtype, not an assumed file
    * layout, so a regenerated table never breaks every downstream
    * plan again:
    *
    *  - BIGINT → nanos: truncate to micros. Lossless here (the
    *    generator emits µs-precision values) and matches DuckDB's
    *    `CAST(ts AS TIMESTAMP)` in every oracle. `DIV 1000`
    *    truncates toward zero, which equals floor only for ts >= 0 —
    *    the generator emits 2024 epochs only.
    *  - TIMESTAMP/TIMESTAMP_NTZ → `CAST(ts AS TIMESTAMP)`; the
    *    session timezone is UTC ([[Sessions]]), so the NTZ wall
    *    clock maps to the same instant the nanos path produced.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    Sessions.prepare(s)
    val raw = table(s, d, "events")
    normalizeTs(raw)
  }

  /** Shared by the batch loader and the streaming source
    * ([[graft.streaming.StreamingOps]]) so both read paths stay in
    * lockstep on future schema drift. */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("CAST(ts DIV 1000 AS LONG)")))
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet-read type $other; " +
            "expected BIGINT (nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  private val dirBytesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total on-disk bytes of a fixture directory (memoized — the
    * fixtures are immutable per run). Drives the loop-frame storage
    * route; on a real cluster this is the catalog's table-level
    * sizeInBytes statistic. */
  def fixtureBytes(d: String): Long =
    dirBytesMemo.computeIfAbsent(d, { dir =>
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(walk).sum)
        else f.length()
      walk(new java.io.File(dir))
    })

  /** Loop-frame storage route (round 18): how a data-sized frame
    * that a query re-scans many times (graph-loop edge frames, the
    * banded dedup frame) gets pinned.
    *
    *  - COLUMNAR `persist()` above the gate: compressed columnar
    *    batches are ~8× smaller than deserialized checkpoint blocks
    *    (which hold one UnsafeRow object per row in old-gen — ~12 GB
    *    for one q_hits invocation at the 100× fixture, the measured
    *    GC-churn mechanism behind the round-17 sweep's heavy-tail
    *    variance), scans read them vectorized, and
    *    InMemoryTableScan preserves outputPartitioning exactly as
    *    LogicalRDD did, so exchange-free loop shapes survive.
    *    Measured at 100×: 1.3–2.2× faster across the graph family
    *    with per-key GC 21 s → sub-2 s (BENCH.md round 18).
    *  - DESERIALIZED `localCheckpoint` below it: at sf0.1 the same
    *    conversion READ 1.3–1.7× slower (q_triangle_count 3.3→5.4 s,
    *    q_sssp 2.2→3.3 s) — the per-scan columnar→row decode
    *    dominates when the frame is a few MB and GC pressure is nil.
    *
    * The gate is the session's fixture footprint (100 MB — sf0.1 is
    * 17 MB, the 10×/100× fixtures are 154 MB/1.5 GB), a free
    * driver-side listing, conf-overridable for A/B and specs:
    * `spark.graft.loop.columnar` = on | off | auto (default), with
    * the taken route readable from `spark.graft.loop.lastStorage` —
    * the same dispatch discipline as the dedup/ann doc-count gates. */
  def loopPin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val columnar = s.conf.get("spark.graft.loop.columnar", "auto") match {
      case "on"  => true
      case "off" => false
      case _ =>
        val d = s.conf.get("spark.graft.fixture.dir", "")
        d.nonEmpty && fixtureBytes(d) >= (100L << 20)
    }
    s.conf.set("spark.graft.loop.lastStorage",
      if (columnar) "columnar" else "checkpoint")
    if (columnar) df.persist() else df.localCheckpoint(eager = false)
  }
}
