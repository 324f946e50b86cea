package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextKit.{h28, h28Duck}

/** Aggregation surface (SURVEY §2B): hash aggregate (TPC-H Q1 shape),
  * exact + approximate distinct, rollup/cube/grouping sets, and the
  * vector-centroid aggregate (per-label mean embedding — the batch
  * "training" aggregate over the multimodal column).
  *
  * Scale notes: every groupBy here is a partial (map-side) + final
  * aggregate — the shuffle carries one row per (partition, group),
  * not the data. Averages are written sum/count with DECIMAL
  * accumulation (see `dsum`) so results are order-independent.
  * The declared sketches (KMV distinct, histogram quantiles) are
  * deterministic md5-derived algorithms whose partials merge
  * associatively in fixed memory — 100 TB-friendly AND exactly
  * reproducible in the DuckDB oracle, so even the approximate
  * values are hash-checked.
  */
object Aggregates {

  private def davg(c: String, scale: Int = 6): String =
    s"round(CAST(sum(CAST($c AS DECIMAL(38,$scale))) AS DOUBLE) / count(*), 6)"

  val qs: Seq[Q] = Seq(

    // TPC-H Q1 pricing summary — partial+final HashAggregate. The
    // exact sums ride the INTEGER-MICROS form (msum — native long
    // adds in codegen, bit-identical output to the Decimal128 dsum
    // it replaced; see package.scala): the 4 measures' 2–4 dp values
    // sum exactly through ~10⁷ rows per group, and this query's
    // groups are the 4 (returnflag, linestatus) cells — the flagged
    // hot cell of round-11 verdict #6.
    Q("q_agg_hash",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${msumSql("l_quantity")} AS sum_qty,
         |  ${msumSql("l_extendedprice")} AS sum_base,
         |  ${msumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc,
         |  round(CAST(sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT))
         |        AS DOUBLE) / 1000000 / count(*), 6) AS avg_qty,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        msum(col("l_quantity")).alias("sum_qty"),
        msum(col("l_extendedprice")).alias("sum_base"),
        msum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .alias("sum_disc"),
        round((sum(round(col("l_quantity") * lit(1000000L), 0)
          .cast("long")).cast("double") / lit(1000000L))
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

    // Approximate distinct via a KMV (k-minimum-values) sketch
    // (Bar-Yossef et al., RANDOM 2002): hash every user id with the
    // md5-derived h28, keep the k = 64 smallest DISTINCT hash values
    // per group, estimate D ≈ (k−1)·M / h_(k) (M = 2^28). Fully
    // deterministic and engine-portable, so unlike HLL++ (whose
    // sketch internals differ per engine) the approximate VALUE
    // itself is hash-oracled — no rows-only escape hatch; the error
    // bound (rsd ≈ 1/√(k−2)) is separately pinned in AggregatesSpec
    // against the exact twin carried in-row. Scale shape: the
    // rank ≤ k filter becomes a WindowGroupLimit (partial per-map
    // top-k BEFORE the shuffle — asserted on the plan in
    // AggregatesSpec), so the shuffle carries ≤ k rows per group per
    // map task, the same fixed-memory merge posture as HLL.
    Q("q_agg_approx_distinct",
      s"""WITH h AS (SELECT DISTINCT event_type,
         |        ${h28Duck("user_id::VARCHAR")} AS h FROM events),
         |r AS (SELECT event_type, h, row_number() OVER (
         |        PARTITION BY event_type ORDER BY h) AS rk FROM h),
         |tk AS (SELECT event_type, count(*) AS nh, max(h) AS kth
         |       FROM r WHERE rk <= 64 GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |       FROM events GROUP BY 1)
         |SELECT t.event_type,
         |  CASE WHEN t.nh < 64 THEN t.nh
         |       ELSE CAST(round(63 * 268435456.0 / t.kth, 0) AS BIGINT)
         |  END AS approx_users,
         |  e.exact_users
         |FROM tk t JOIN ex e USING (event_type)
         |ORDER BY t.event_type""".stripMargin) { (s, d) =>
      val ev = fanout(Tables.events(s, d))
      val hashes = ev.select(col("event_type"),
        expr(h28("CAST(user_id AS STRING)")).as("h")).distinct()
      val w = Window.partitionBy("event_type").orderBy("h")
      val tk = hashes.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 64)
        .groupBy("event_type").agg(count(lit(1)).as("nh"), max("h").as("kth"))
      val ex = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"))
      tk.join(ex, "event_type")
        .select(col("event_type"),
          when(col("nh") < 64, col("nh"))
            .otherwise(round(lit(63 * 268435456.0) / col("kth"), 0).cast("long"))
            .as("approx_users"),
          col("exact_users"))
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

    // Approximate quantiles via a fixed-width HISTOGRAM sketch:
    // B = 128 equi-width buckets over [min, max] per group, the
    // p-quantile estimated as the midpoint of the bucket where the
    // cumulative count crosses p·n. Counts merge associatively in
    // fixed memory (the 100 TB property approx_percentile's GK
    // summaries buy) while staying fully deterministic and
    // engine-portable — so the approximate VALUES are hash-oracled,
    // unlike GK/t-digest internals. The value error is bounded by
    // one bucket width ((max−min)/B); AggregatesSpec pins that
    // against the exact interpolated percentile carried in-row
    // (percentile ↔ quantile_cont, portable per q_agg_median).
    Q("q_agg_approx_quantile",
      """WITH st AS (SELECT event_type, count(*) AS n,
        |        min(value) AS mn, max(value) AS mx FROM events GROUP BY 1),
        |bk AS (SELECT e.event_type,
        |         CASE WHEN s.mx = s.mn THEN 0
        |              ELSE least(127, CAST(floor((e.value - s.mn)
        |                     / (s.mx - s.mn) * 128) AS INT)) END AS b
        |       FROM events e JOIN st s USING (event_type)),
        |c AS (SELECT event_type, b, count(*) AS c FROM bk GROUP BY 1, 2),
        |cm AS (SELECT event_type, b, sum(c) OVER (
        |         PARTITION BY event_type ORDER BY b) AS cum FROM c),
        |qb AS (SELECT cm.event_type,
        |         min(CASE WHEN cm.cum >= s.n * 0.5 THEN cm.b END) AS b50,
        |         min(CASE WHEN cm.cum >= s.n * 0.9 THEN cm.b END) AS b90
        |       FROM cm JOIN st s USING (event_type) GROUP BY 1),
        |ex AS (SELECT event_type,
        |         round(quantile_cont(value, 0.5), 6) AS exact_p50,
        |         round(quantile_cont(value, 0.9), 6) AS exact_p90
        |       FROM events GROUP BY 1)
        |SELECT q.event_type,
        |  round(s.mn + (q.b50 + 0.5) * (s.mx - s.mn) / 128, 6) AS approx_p50,
        |  round(s.mn + (q.b90 + 0.5) * (s.mx - s.mn) / 128, 6) AS approx_p90,
        |  e.exact_p50, e.exact_p90, s.n
        |FROM qb q JOIN st s USING (event_type) JOIN ex e USING (event_type)
        |ORDER BY q.event_type""".stripMargin) { (s, d) =>
      val ev = fanout(Tables.events(s, d)).select("event_type", "value")
      val st = ev.groupBy("event_type").agg(count(lit(1)).as("n"),
        min("value").as("mn"), max("value").as("mx"))
      val bkt = ev.join(broadcast(st), "event_type")
        .select(col("event_type"),
          when(col("mx") === col("mn"), lit(0)).otherwise(
            least(lit(127), floor((col("value") - col("mn"))
              / (col("mx") - col("mn")) * 128).cast("int"))).as("b"))
        .groupBy("event_type", "b").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("b")
      val cum = bkt.withColumn("cum", sum("c").over(w))
      val qb = cum.join(broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(min(when(col("cum") >= col("n") * 0.5, col("b"))).as("b50"),
          min(when(col("cum") >= col("n") * 0.9, col("b"))).as("b90"))
      val ex = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 6).as("exact_p50"),
          round(expr("percentile(value, 0.9)"), 6).as("exact_p90"))
      qb.join(broadcast(st), "event_type").join(ex, "event_type")
        .select(col("event_type"),
          round(col("mn") + (col("b50") + lit(0.5))
            * (col("mx") - col("mn")) / lit(128), 6).as("approx_p50"),
          round(col("mn") + (col("b90") + lit(0.5))
            * (col("mx") - col("mn")) / lit(128), 6).as("approx_p90"),
          col("exact_p50"), col("exact_p90"), col("n"))
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

    // EXACT distinct counting via bitmap aggregation (Spark 4's
    // bitmap_construct_agg): each (group, 32k-bucket) pair folds its
    // ids into a fixed 4 KiB bitmap — partial-aggregated, so the
    // shuffle carries one bounded buffer per (group, bucket) no
    // matter how many input rows — then per-bucket popcounts sum.
    // The dense-int-domain EXACT counterpart of the KMV estimate
    // (q_agg_approx_distinct): same two-level shape, zero error,
    // memory ∝ id-range/8 bytes instead of k hashes. The oracle is
    // plain COUNT(DISTINCT) — bitmaps are exact, so they hash-match.
    Q("q_agg_bitmap_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS ndv
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("bitmap_bucket_number(user_id)").as("bkt"))
          .agg(expr("bitmap_count(bitmap_construct_agg(" +
            "bitmap_bit_position(user_id)))").as("cnt"))
          .groupBy("event_type").agg(sum("cnt").as("ndv"))
          .orderBy("event_type")
    },

    // INCREMENTAL AGGREGATE MAINTENANCE — materialized-view refresh
    // without recompute: a stored per-group partial state (count +
    // exact DECIMAL sum, built from the 80% "already ingested" slice
    // of lineitem) is merged with the state of the newly-arrived 20%
    // delta; finalization (cast + avg) happens only on the merged
    // state. The oracle is the FULL recompute over base ∪ delta —
    // passing means the merge is exactly lossless, which is the
    // entire contract of incremental MV maintenance. Scale: refresh
    // cost is one partial-aggregated scan of the DELTA plus a merge
    // over |groups| rows (metadata-sized); the 100 TB base is never
    // rescanned. Works because (count, decimal-sum) is a commutative
    // monoid — the same property the sketch aggregates (KMV, CMS,
    // bitmap) exploit; avg is derived at finalize, never averaged
    // across partials.
    Q("q_incremental_agg",
      s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${davg("l_quantity")} AS avg_qty
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val l = Tables.lineitem(s, d)
      def state(df: DataFrame): DataFrame =
        df.groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(38, 6))).as("s_qty"))
      val stored = state(l.filter(col("l_orderkey") % 10 < 8)) // the MV
      val delta = state(l.filter(col("l_orderkey") % 10 >= 8)) // new data
      stored.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("cnt").as("cnt"), sum("s_qty").as("s"))
        .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
          round(col("s").cast("double"), 6).as("sum_qty"),
          round(col("s").cast("double") / col("cnt"), 6).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },
  )
}
