package graft

import org.apache.spark.sql.GraftTestShims
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Registry-wide audit of partition-less windows (round-10 verdict
  * #7). A `Window` with an empty partitionSpec serializes its whole
  * input through ONE task — acceptable ONLY when the input frame is
  * bounded by a constant that does not grow with the data (calendar
  * days, a fixed decile/bin grid), never by row count. The engine has
  * a small documented set of such sites; this spec
  *
  *  1. enumerates them mechanically over ALL registry plans, so a
  *     future edit that slips a new global window into any of the
  *     234 declared plans fails one named test here, and
  *  2. MEASURES each allowed site's window input at two sfs (10×
  *     apart) against its documented constant bound — comments can't
  *     drift from reality, because the bound is executed, not read.
  */
class GlobalWindowAuditSpec extends SparkTestBase {
  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"

  /** query key → (constant bound on the global window's input rows,
    * why that bound is data-size-independent).
    *
    * NOTE this is the RETURNED-plan truth, which differs from a
    * source-level grep in both directions: q_seasonal_decompose /
    * q_ewma_forecast / q_rolling_corr build their calendar-day
    * global windows behind localCheckpoint boundaries (executed at
    * build time over ≤31-day frames, invisible in the returned
    * plan), while the OVER () grand-total windows in the stats
    * family only show up here. */
  private val allowed: Map[String, (Long, String)] = Map(
    "q_survival" -> (3000L,
      "distinct duration DAYS - bounded by the orders calendar span"),
    "q_gains_curve" -> (10L, "exactly the 10 decile rows"),
    "q_rolling_corr" -> (366L,
      "one row per calendar day of the events window"),
    "q_anova" -> (100L, "OVER () totals on the per-group aggregate frame"),
    "q_ate_strata" -> (100L, "OVER () totals on the per-stratum frame"),
    "q_mutual_info" -> (100L, "OVER () totals on the contingency cells"),
    "q_psi" -> (100L, "OVER () totals on the fixed bin frame"),
    "q_modularity" -> (100L, "OVER () totals on the per-community frame"),
    "q_emd_drift" -> (40000L,
      "cumulative-CDF/lead windows on the distinct-VALUE frame — " +
        "bounded by the 2dp value domain (≤ ~33k cells), not by rows"),
    "q_spearman" -> (200L,
      "prefix-sum of range-partition totals — one row per shuffle " +
        "partition (the two-level distributed rank's constant top " +
        "level); the per-value cumulative runs partition-KEYED"),
    "q_seq_ab" -> (366L,
      "cumulative-look windows over the calendar-day frame — one " +
        "row per day of the experiment, the rolling_corr bound"),
    "q_mann_whitney" -> (40000L,
      "double-rank cumulative window on the distinct-VALUE frame — " +
        "the q_emd_drift 2dp value-domain bound, not row count"),
    "q_kruskal_wallis" -> (40000L,
      "double-rank cumulative window on the distinct-VALUE frame — " +
        "the q_emd_drift 2dp value-domain bound, not row count"),
    "q_granger" -> (366L,
      "lag windows on the calendar-day frame — the rolling_corr bound"),
    // (q_hurst's day-rank global window is checkpoint-hidden — see
    // the calendar-day test below, which bounds its source frame.)
    "q_heaps_law" -> (12L,
      "cumulative growth sums on the FIXED 10-bucket frame"))

  private def globalWindows(name: String, sf: String): Seq[LWindow] =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }

  test("the registry's only partition-less windows are the documented sites") {
    assume(new java.io.File(s"$sfSmall/lineitem.parquet").exists())
    val found = SparkEntry.registry.flatMap { q =>
      val ws = globalWindows(q.name, sfSmall)
      if (ws.isEmpty) None else Some(q.name -> ws.size)
    }.toMap
    assert(found.keySet === allowed.keySet,
      s"global-window sites drifted: unexpected ${found.keySet -- allowed.keySet}, " +
        s"missing ${allowed.keySet -- found.keySet} — a NEW partition-less window " +
        "is a single-task scale hazard; either partition it or document a " +
        "constant bound here")
    // The known multi-window site: q_survival's Kaplan-Meier suffix
    // and prefix sums share one bounded duration frame.
    assert(found("q_survival") === 2, found.toString)
  }

  test("the checkpoint-hidden calendar-day windows stay bounded too") {
    // Sites the returned plan can't show (the window runs at build
    // time behind a localCheckpoint): q_seasonal_decompose /
    // q_ewma_forecast / q_rolling_corr / q_hurst (round 13: its
    // day-rank window hides behind the block-stats checkpoint).
    // Assert the SOURCE frames they window over — one row per
    // calendar day of events — stay within the documented 366 bound
    // at both sfs.
    assume(new java.io.File(s"$sfBig/events.parquet").exists())
    Seq(sfSmall, sfBig).foreach { sf =>
      val days = Tables.events(spark, sf)
        .select(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("d"))
        .distinct().count()
      assert(days <= 366L,
        s"events at $sf span $days calendar days — the " +
          "q_seasonal_decompose/q_ewma_forecast/q_rolling_corr global " +
          "windows are only sound while the day frame is calendar-bounded")
    }
  }

  test("each allowed global window feeds from a constant-bounded frame at BOTH sfs") {
    assume(new java.io.File(s"$sfBig/lineitem.parquet").exists())
    val failures = allowed.toSeq.sortBy(_._1).flatMap { case (name, (bound, why)) =>
      Seq(sfSmall, sfBig).flatMap { sf =>
        val ws = globalWindows(name, sf)
        if (ws.isEmpty) Seq(s"$name at $sf: expected global window vanished")
        else ws.flatMap { w =>
          val n = GraftTestShims.ofRows(spark, w.child).count()
          if (n <= bound) None
          else Some(s"$name at $sf: global window input is $n rows, " +
            s"documented constant bound $bound ($why)")
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
