package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Environment-drift tripwires (round-9 VERDICT #3/#4).
  *
  * Round 9's testdata regeneration silently changed events.ts from
  * parquet TIMESTAMP(NANOS) to timestamp[us]; the loader's hard-coded
  * nanos conversion then failed ANALYSIS for 69 of 234 registry
  * queries — surfacing as 57 scattered suite failures and a
  * correctness artifact that simply OMITTED the broken rows. These
  * two specs make any recurrence fail as one named test, in seconds:
  *
  *  1. the registry analysis smoke touches `queryExecution.analyzed`
  *     for every declared key — plan-time resolution only, no jobs —
  *     so a loader/schema/testdata break anywhere in the registry
  *     dies here first with the offending key in the message;
  *  2. the Tables.events schema-robustness test pins that BOTH
  *     parquet vintages the generator has shipped (int64 nanos under
  *     `nanosAsLong`, and timestamp[us] with or without UTC
  *     adjustment) load to the same TimestampType instants.
  */
class RegistrySmokeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("every registry key analyzes against the current testdata") {
    assume(new java.io.File(s"$sf/lineitem.parquet").exists())
    // Build + analyze only: no action is triggered, so this stays
    // cheap even for the heavy iterative queries. Queries whose
    // BUILD closure itself stages data (Sources/Lakehouse families)
    // do run that one-time step — bounded at sf0.001.
    val broken = SparkEntry.registry.flatMap { q =>
      try {
        SparkEntry.queries(q.name)(spark, sf).queryExecution.analyzed
        None
      } catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage.take(200)}")
      }
    }
    assert(broken.isEmpty,
      s"${broken.size} registry keys fail at analysis:\n${broken.mkString("\n")}")
  }

  test("Tables.events loads every shipped ts parquet vintage identically") {
    val s = spark
    import s.implicits._
    // Reference instants (µs precision, 2024 epochs like the
    // generator's) written through three physical layouts.
    val micros = Seq(1709296496789012L, 1709296497000000L, 1709382896123456L)
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")

    def stage(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column,
              expectedRead: org.apache.spark.sql.types.DataType): String = {
      val dir = Files.createTempDirectory("graft_events_vintage_").toString
      base.select(col("event_id"), write(base).as("ts"))
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val readType = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(readType === expectedRead,
        s"fixture staged wrong physical type: $readType")
      dir
    }

    // (a) int64 nanos — how TIMESTAMP(NANOS) files read under
    //     spark.sql.legacy.parquet.nanosAsLong (the pre-Aug-13 data).
    val nanosDir = stage(df => (col("us") * 1000L).cast(LongType), LongType)
    // (b) timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ (the
    //     regenerated data).
    val ntzDir = stage(df => timestamp_micros(col("us")).cast(TimestampNTZType),
      TimestampNTZType)
    // (c) timestamp[us] isAdjustedToUTC=true → TimestampType.
    val tzDir = stage(df => timestamp_micros(col("us")), TimestampType)

    def load(dir: String): Seq[(Long, java.sql.Timestamp)] = {
      val out = Tables.events(s, dir)
      assert(out.schema("ts").dataType === TimestampType,
        s"loader must normalize to TimestampType, got ${out.schema("ts").dataType}")
      out.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
        .collect().sortBy(_._1).toSeq
    }

    val fromNanos = load(nanosDir)
    assert(fromNanos === load(ntzDir), "nanos vs timestamp[us] NTZ drift")
    assert(fromNanos === load(tzDir), "nanos vs timestamp[us] UTC drift")
    // And the values themselves are the staged instants (UTC session).
    assert(fromNanos.map(_._2.getTime) ===
      micros.map(_ / 1000L), "wall-clock drift vs staged epoch millis")
  }
}
