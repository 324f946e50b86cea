package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Sessions

/** Structured Streaming harness for the q_stream_* queries.
  *
  * The reference's ingest is incremental — `add_or_update_photo`
  * called per new file (photo_vector_search.py:94) — which in Spark
  * is a streaming file source feeding windowed/stateful operators.
  * Each declared query builds a REAL streaming job: `readStream` over
  * the events parquet, event-time watermark, windowed aggregation /
  * stateful dedup, drained with `Trigger.AvailableNow` into a
  * `foreachBatch` parquet sink, then read back for the batch-twin
  * oracle compare.
  *
  * On the testdata the source is one file → one micro-batch, so the
  * watermark never discards anything and the streaming result equals
  * the batch twin exactly; the MemoryStream test suite covers the
  * multi-batch/late-data semantics the single-batch drain can't.
  * At scale the same plans run continuously: the watermark bounds
  * state (per-window partial aggregates live in the state store until
  * watermark passage), and `foreachBatch` is where the A7 merge-upsert
  * sink would attach.
  */
object StreamingOps {

  /** The streaming file source requires a DIRECTORY to watch (it is
    * a feed, not a file); the testdata ships one parquet file per
    * table, so stage it into a per-sf temp dir once per JVM. */
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def eventsDir(d: String): String =
    staged.computeIfAbsent(d, { _ =>
      val tmp = Files.createTempDirectory("graft_events_src_")
      Files.copy(java.nio.file.Paths.get(s"$d/events.parquet"),
        tmp.resolve("events.parquet"))
      tmp.toString
    })

  /** readStream over the events table with the same nanos→micros
    * normalization as the batch loader (graft.Tables.events).
    *
    * Runs in a CHILD session with fewer shuffle partitions: every
    * stateful operator materializes one state-store instance and one
    * task per shuffle partition per micro-batch, so a 32-partition
    * default spends more on task/state bookkeeping than on the
    * actual rows at this volume. (On a real cluster this is the
    * same tuning decision, just with larger numbers.) Results are
    * partition-count-independent. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    Sessions.prepare(s)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    Sessions.prepare(ss)
    val dir = eventsDir(d)
    val schema = ss.read.parquet(dir).schema // nanos read as LONG
    ss.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("CAST(ts DIV 1000 AS LONG)")))
  }

  /** Run a streaming DataFrame to completion on currently-available
    * input and return the materialized result. */
  def drain(s: SparkSession, streamed: DataFrame, mode: String): DataFrame = {
    val out = Files.createTempDirectory("graft_stream_").toString
    val sink = s"$out/data"
    // The query runs on the child session the stream was built on;
    // the result is read back on the caller's session.
    val q = streamed.writeStream
      .outputMode(mode)
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(sink)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sink)
  }
}
