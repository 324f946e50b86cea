package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation surface (SURVEY §2B): hash aggregate (TPC-H Q1 shape),
  * exact + approximate distinct, rollup/cube/grouping sets, and the
  * vector-centroid aggregate (per-label mean embedding — the batch
  * "training" aggregate over the multimodal column).
  *
  * Scale notes: every groupBy here is a partial (map-side) + final
  * aggregate — the shuffle carries one row per (partition, group),
  * not the data. Averages are written sum/count with DECIMAL
  * accumulation (see `dsum`) so results are order-independent.
  * approx_count_distinct is the one declared sketch: HLL++ partials
  * merge associatively, the 100 TB-friendly distinct; its exact twin
  * q_agg_distinct is the oracle-checked variant.
  */
object Aggregates {

  private def davg(c: String, scale: Int = 6): String =
    s"round(CAST(sum(CAST($c AS DECIMAL(38,$scale))) AS DOUBLE) / count(*), 6)"

  val qs: Seq[Q] = Seq(

    // TPC-H Q1 pricing summary — partial+final HashAggregate.
    Q("q_agg_hash",
      s"""SELECT l_returnflag, l_linestatus,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_base,
         |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_disc,
         |  ${davg("l_quantity")} AS avg_qty,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        dsum(col("l_quantity")).alias("sum_qty"),
        dsum(col("l_extendedprice")).alias("sum_base"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .alias("sum_disc"),
        round(sum(col("l_quantity").cast("decimal(38,6)")).cast("double")
          / count(lit(1)), 6).alias("avg_qty"),
        count(lit(1)).alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Exact distinct per group (expand + two-phase aggregate).
    Q("q_agg_distinct",
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).groupBy("l_partkey")
          .agg(countDistinct("l_suppkey").alias("n_supp"),
            count(lit(1)).alias("n_rows"))
          .orderBy("l_partkey")
    },

    // HLL++ sketch distinct — THE distinct for 100 TB (associative
    // partial merge, fixed memory). Sketch algorithms differ across
    // engines, so no SQL oracle for the approx column (rows-only
    // check) — but the query carries its OWN correctness signal: the
    // exact distinct is computed alongside, and AggregatesSpec bounds
    // the relative error at 3× the declared rsd (0.02) per group.
    Q.noOracle("q_agg_approx_distinct") { (s, d) =>
      fanout(Tables.events(s, d)).groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.02).alias("approx_users"),
          countDistinct("user_id").alias("exact_users"))
        .orderBy("event_type")
    },

    // Deterministic grouped MODE: each user cohort's most frequent
    // event type. Both engines' built-in mode() breaks frequency
    // ties arbitrarily, so the operator pins the tiebreak (highest
    // count, then lexicographically first value) via max_by over a
    // (count, reversed-tiebreak) struct — two partial-aggregated
    // shuffles, deterministic everywhere.
    Q("q_agg_mode",
      """WITH c AS (SELECT user_id % 10 AS cohort, event_type,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT cohort, event_type, cnt, row_number() OVER (
        |    PARTITION BY cohort ORDER BY cnt DESC, event_type) AS rn
        |  FROM c)
        |SELECT cohort, event_type AS mode_type, cnt
        |FROM r WHERE rn = 1 ORDER BY cohort""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("cohort"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("cohort")
        .agg(expr("min_by(struct(event_type, cnt), struct(-cnt, event_type))").as("m"))
        .select(col("cohort"), col("m.event_type").as("mode_type"),
          col("m.cnt").as("cnt"))
        .orderBy("cohort")
    },

    // Quantile sketch — the percentile for 100 TB: approx_percentile
    // (Greenwald-Khanna summaries) merges associatively in fixed
    // memory, where exact percentile must materialize the whole group.
    // Same correctness contract as the HLL query above: sketch
    // internals aren't engine-portable (rows-only check), so the
    // exact interpolated percentile rides along in the same row and
    // AggregatesSpec bounds the sketch's RANK error at the declared
    // 1/accuracy.
    Q.noOracle("q_agg_approx_quantile") { (s, d) =>
      fanout(Tables.events(s, d)).groupBy("event_type")
        .agg(expr("approx_percentile(value, array(0.5, 0.9), 1000)")
            .alias("approx_p"),
          expr("percentile(value, array(0.5, 0.9))").alias("exact_p"),
          count(lit(1)).alias("n"))
        .select(col("event_type"),
          round(element_at(col("approx_p"), 1), 6).alias("approx_p50"),
          round(element_at(col("approx_p"), 2), 6).alias("approx_p90"),
          round(element_at(col("exact_p"), 1), 6).alias("exact_p50"),
          round(element_at(col("exact_p"), 2), 6).alias("exact_p90"),
          col("n"))
        .orderBy("event_type")
    },

    // Moment statistics built from EXACT decimal power sums instead
    // of the built-in stddev/var (whose float accumulation is
    // partition-order-dependent and drifts past round(6) across
    // engines): Σx and Σx² are DECIMAL-exact and associative, the
    // variance formula is then identical double arithmetic on both
    // sides. This is also the shuffle-friendly shape: two partial
    // sums per group, not a per-row sort.
    Q("q_agg_stats",
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS mean_qty,
        |  round((CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |         - CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |           * CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*))
        |        / (count(*) - 1), 6) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        val sx = sum(col("l_quantity").cast("decimal(38,6)")).cast("double")
        val sx2 = sum((col("l_quantity") * col("l_quantity"))
          .cast("decimal(38,6)")).cast("double")
        val n = count(lit(1))
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(n.as("n"),
            round(sx / n, 6).as("mean_qty"),
            round((sx2 - sx * sx / n) / (n - 1), 6).as("var_qty"))
          .orderBy("l_returnflag")
    },

    // Interpolated percentiles (median + p90) — order statistics are
    // input-order independent, and Spark's `percentile` uses the same
    // p·(n-1) linear interpolation as DuckDB's quantile_cont.
    Q("q_agg_median",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"))
          .orderBy("l_returnflag")
    },

    // Rollup over (returnflag, linestatus).
    Q("q_agg_rollup",
      """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).rollup("l_returnflag", "l_linestatus").agg(
        grouping_id().alias("gid"),
        count(lit(1)).alias("n"),
        dsum(col("l_quantity")).alias("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).alias("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).alias("ls"),
          col("n"), col("sum_qty"))
        .orderBy("gid", "rf", "ls")
    },

    // Cube over (returnflag, linestatus).
    Q("q_agg_cube",
      """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).cube("l_returnflag", "l_linestatus").agg(
        grouping_id().alias("gid"),
        count(lit(1)).alias("n"),
        dsum(col("l_quantity")).alias("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).alias("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).alias("ls"),
          col("n"), col("sum_qty"))
        .orderBy("gid", "rf", "ls")
    },

    // Explicit grouping sets (SQL surface).
    Q("q_agg_gsets",
      """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gsets")
      s.sql(
        """SELECT CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          |  coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
          |  count(*) AS n
          |FROM lineitem_gsets
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, rf, ls""".stripMargin)
    },

    // Per-label mean embedding (vector centroid). Exploded output
    // (label, pos, c) — arrays stay out of the compared result. Plan:
    // posexplode → two-phase hash aggregate on (label, pos); the
    // shuffle carries 64 rows per label, not vectors. DECIMAL(38,12)
    // accumulation for order independence at component magnitude.
    Q("q_vector_centroid",
      """SELECT label, CAST(t.i AS INT) AS pos,
        |  round(CAST(sum(CAST(CAST(embedding[t.i + 1] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
        |        / count(*), 6) AS c
        |FROM embeddings, UNNEST(generate_series(0, len(embedding) - 1)) AS t(i)
        |GROUP BY label, t.i ORDER BY label, pos""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(sum(col("v").cast("decimal(38,12)")).cast("double")
          / count(lit(1)), 6).alias("c"))
        .orderBy("label", "pos")
    },

    // Same centroid via a custom typed Aggregator (UDAF surface): one
    // pass over whole vectors, one (sums, count) buffer per group per
    // partition in the shuffle — dim× less shuffle traffic than the
    // posexplode plan. Exact integer accumulation (floor(x·2^40)) so
    // partition order can't move the result; see CentroidAggregator.
    Q("q_vector_centroid_agg",
      """SELECT label, CAST(t.i AS INT) AS pos,
        |  round((CAST(sum(CAST(floor(CAST(embedding[t.i + 1] AS DOUBLE) * 1099511627776)
        |                       AS BIGINT)) AS DOUBLE) / 1099511627776) / count(*), 6) AS c
        |FROM embeddings, UNNEST(generate_series(0, len(embedding) - 1)) AS t(i)
        |GROUP BY label, t.i ORDER BY label, pos""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.embeddings(s, d)
        .select(col("label"), col("embedding")).as[(Int, Array[Float])]
      val cent = ds.groupByKey(_._1).mapValues(_._2)
        .agg(new graft.functions.CentroidAggregator().toColumn.name("cent"))
        .toDF("label", "cent")
      cent.select(col("label"), posexplode(col("cent")).as(Seq("pos", "v")))
        .select(col("label"), col("pos"), round(col("v"), 6).as("c"))
        .orderBy("label", "pos")
    },
  )
}
