package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import TextKit.{h28, h28Duck}

/** Quantitative event analytics — the downsample/trend/privacy passes
  * an events-at-scale pipeline runs before publishing metrics or
  * releasing a dataset (reference analog: the store's ingest counters
  * are the degenerate 1-bucket form of these rollups).
  *
  * Scale design notes (100 TB posture):
  *  - Every operator here is ONE partial-aggregated groupBy over the
  *    fact scan (map-side combine absorbs the per-bucket/per-group
  *    volume) — no joins, no windows, no second pass over the data.
  *  - Regression/OHLC determinism: per-row terms are rounded to a
  *    fixed scale BEFORE the distributed DECIMAL sums, and all
  *    post-aggregation math runs on identical double operands written
  *    identically in both engines, so results hash-match at any
  *    partitioning / accumulation order.
  */
object Analytics {

  /** Total-order tie-break key for open/close picks: zero-padded
    * epoch seconds + event_id (unique), identical lexicographic
    * ordering in Spark and DuckDB. Shared with the streaming twin
    * (q_stream_ohlc). floor() on the DuckDB side is load-bearing:
    * epoch(ts) is a fractional DOUBLE there and a bare ::BIGINT
    * ROUNDS sub-second timestamps up, while Spark's unix_timestamp
    * FLOORS — same-second events then tie on the second and break on
    * event_id identically in both engines. */
  private val kDuck =
    "lpad((floor(epoch(ts))::BIGINT)::VARCHAR, 12, '0') || '#' || " +
      "lpad(event_id::VARCHAR, 20, '0')"

  // id pads to 20 (BIGINT max is 19 digits): a 12-char pad would
  // TRUNCATE snowflake-scale ids and silently break the total order.
  private[queries] def ohlcKey: org.apache.spark.sql.Column = concat(
    lpad(unix_timestamp(col("ts")).cast("string"), 12, "0"), lit("#"),
    lpad(col("event_id").cast("string"), 20, "0"))

  private[queries] val ohlcSql: String =
    s"""WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
       |    value, $kDuck AS k FROM events)
       |SELECT event_type, bucket,
       |  arg_min(value, k) AS open, max(value) AS high,
       |  min(value) AS low, arg_max(value, k) AS close,
       |  count(*) AS volume,
       |  ${dsumSql("value")} AS vsum
       |FROM b GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin

  val qs: Seq[Q] = Seq(

    // OHLC RESAMPLE — hourly open/high/low/close bars per event_type
    // (the time-series downsampling every metrics/feature pipeline
    // runs: first/last need an ORDER, not just an extreme). Open and
    // close are arg_min/arg_max over a zero-padded epoch#event_id
    // string key — a total order both engines sort identically, so
    // the picks are deterministic even with duplicate timestamps.
    // Scale: ONE partial-aggregated groupBy over the scan; min_by/
    // max_by/min/max/count/sum all combine map-side, so per-reducer
    // volume is bucket-count-sized, not event-sized. The value sum
    // rounds per-row into DECIMAL(38,6) (the dsum discipline).
    Q("q_ohlc_resample", ohlcSql) { (s, d) =>
      val k = ohlcKey
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(min_by(col("value"), k).as("open"),
          max("value").as("high"), min("value").as("low"),
          max_by(col("value"), k).as("close"),
          count(lit(1)).as("volume"),
          dsum(col("value")).as("vsum"))
        .orderBy("event_type", "bucket")
    },

    // GROUPED OLS REGRESSION — per event_type least-squares trend of
    // value over time (slope/intercept/R²): the drift/scaling-law
    // fit a pipeline runs per segment without collecting anything.
    // x is the INTEGER day offset from 2024-01-01 (exact in both
    // engines — a fractional-day x would round a non-terminating
    // double, where Spark's HALF_UP and DuckDB's float round can
    // disagree in the last digit); y is 6dp-rounded. Every per-row
    // term (x·y, x², y²) is then exactly representable in double at
    // these magnitudes, the moment sums (Σx, Σy, Σxy, Σx², Σy²)
    // accumulate in exact INT/DECIMAL, and the normal-equation
    // arithmetic runs on bit-identical double operands in both
    // engines. Scale: ONE fixed-width partial-aggregated groupBy —
    // the sketch pattern (same shape as q_agg_stats/q_ts_anomaly).
    Q("q_group_regression",
      """WITH t AS (SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |    round(value, 6) AS y FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(round(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(round(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
        |  FROM t GROUP BY event_type)
        |SELECT event_type, n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |    round((sy - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |           * sx) / n, 6) END AS intercept,
        |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
        |  ELSE round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |        ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2
        |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      val t = Tables.events(s, d).select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("x"),
        round(col("value"), 6).as("y"))
      val m = t.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("x").cast("double").as("sx"),
        sum(col("y").cast(DecimalType(38, 6))).cast("double").as("sy"),
        sum(round(col("x") * col("y"), 6).cast(DecimalType(38, 6)))
          .cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(round(col("y") * col("y"), 6).cast(DecimalType(38, 6)))
          .cast("double").as("syy"))
      // The normal-equation expressions are written ONCE as SQL text
      // shared verbatim with the oracle, so the double operand chain
      // is identical by construction. The zero-denominator guards
      // (constant-x or single-row groups) matter doubly under
      // Spark's default ANSI mode, where the unguarded division
      // would THROW rather than yield the oracle's NULL.
      m.selectExpr("event_type", "n",
        "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE " +
          "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope",
        "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE " +
          "round((sy - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)" +
          " * sx) / n, 6) END AS intercept",
        "CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL " +
          "ELSE round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /" +
          " ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2")
        .orderBy("event_type")
    },

    // K-ANONYMITY AUDIT — the privacy screen before a dataset
    // release: group documents by their quasi-identifier tuple
    // (lang, source, 100-char length bucket) and surface every
    // group smaller than k=5 with its re-identification risk 1/k.
    // A row here means "these attribute values narrow a subject to
    // fewer than 5 records — generalize or suppress before
    // publishing". Scale: ONE partial-aggregated groupBy over the
    // scan; the k<5 HAVING prunes the output to the risk groups.
    Q("q_kanon_audit",
      """SELECT lang, source,
        |  CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
        |  count(*) AS k, round(1.0 / count(*), 6) AS risk
        |FROM documents
        |GROUP BY lang, source, CAST(floor(n_chars / 100) AS BIGINT)
        |HAVING count(*) < 5
        |ORDER BY lang, source, len_bucket""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          floor(col("n_chars") / lit(100)).cast("long").as("len_bucket"))
        .agg(count(lit(1)).as("k"),
          round(lit(1.0) / count(lit(1)), 6).as("risk"))
        .filter(col("k") < 5)
        .orderBy("lang", "source", "len_bucket")
    },

    // DIFFERENTIALLY-PRIVATE RELEASE COUNTS — per-(lang, source)
    // document counts through the Laplace mechanism (ε = 1,
    // sensitivity 1 for a count ⇒ scale b = 1): the publishable twin
    // of q_kanon_audit's internal worklist. The Laplace draw is
    // inverse-CDF over a SALTED-HASH uniform of the group key —
    // deterministic across engines, runs, and task retries (the
    // q_sample_hash discipline: never rand(); a re-released dataset
    // must not leak by noise re-draw, which is also why the salt is
    // keyed to the release, not the row). THE SALT MUST BE SECRET in
    // a real release — a public salt lets any consumer recompute and
    // subtract the noise, voiding the ε guarantee — so it is
    // conf-injected (`spark.graft.dp.salt`, the embedder-conf
    // pattern); the oracle gate runs the documented default. Scale:
    // ONE partial-aggregated groupBy; the noise projection is
    // group-count-sized.
    Q("q_dp_counts",
      s"""WITH g AS (SELECT lang, source, count(*) AS k FROM documents
         |           GROUP BY lang, source),
         |u AS (SELECT lang, source, k,
         |    (${h28Duck("'dp1#' || lang || '/' || source")} + 0.5)
         |      / 268435456.0 AS u FROM g)
         |SELECT lang, source,
         |  round(k + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
         |    * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS k_noisy
         |FROM u ORDER BY lang, source""".stripMargin) { (s, d) =>
      val salt = s.conf.get("spark.graft.dp.salt", "dp1#")
      val u = (expr(h28(
        s"concat('$salt', lang, '/', source)")) + lit(0.5)) / lit(268435456.0)
      Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("k"))
        .withColumn("u", u)
        .select(col("lang"), col("source"),
          round(col("k") +
            when(col("u") < 0.5, lit(1.0)).otherwise(lit(-1.0)) *
              log(lit(1.0) - lit(2.0) * abs(col("u") - lit(0.5))), 6)
            .as("k_noisy"))
        .orderBy("lang", "source")
    },

    // RANK CALIBRATION — per-slice percent rank of a per-document
    // score (here n_chars as the stand-in metric): maps raw scores
    // onto [0, 1] WITHIN each language so thresholds and mixture
    // weights compare across slices whose raw score distributions
    // differ (the cross-lingual quality-score calibration step; the
    // rank-normalization that makes "keep the top 30%" mean the same
    // thing in every slice). Ties break on doc_id (total order), and
    // the 6dp rank ratio (rn−1)/(n−1) — a small-denominator rational
    // that CAN land exactly on a decimal half — is rounded in EXACT
    // INTEGER space (the package.scala mean-rounding caveat; ties
    // toward +inf by definition in both engines), never via
    // round(double). Scale: ONE slice-partitioned window — never
    // partition-less; each slice sorts independently.
    Q("q_rank_calibrate",
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE) ELSE
        |    floor((2 * (CAST(rn AS BIGINT) - 1) * 1000000 + (n - 1))
        |          / (2.0 * (n - 1)))
        |      / 1000000.0 END AS calibrated
        |FROM r ORDER BY lang, n_chars, doc_id""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
          .selectExpr("doc_id", "lang", "n_chars",
            "CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE) ELSE " +
              "floor((2 * (CAST(rn AS BIGINT) - 1) * 1000000 + (n - 1))" +
              " / (2.0 * (n - 1))) / 1000000.0 END AS calibrated")
          .orderBy("lang", "n_chars", "doc_id")
    },

    // A/B TEST READOUT — per event_type variant comparison under a
    // deterministic 50/50 user split (h28 of the salted user_id, the
    // q_split_assign discipline: membership is reproducible across
    // runs, engines, and task retries — never rand()). Reports both
    // arms' n/mean, the relative lift, and the Welch t statistic
    // (unequal-variance form: σ²A/nA + σ²B/nB — pooling would assume
    // the treatment didn't change the variance, which is exactly
    // what's under test). Per-row values round to 6dp, moment sums
    // accumulate in exact DECIMAL (dsum), and every post-aggregation
    // expression is SQL text shared verbatim with the oracle, so the
    // double operand chain is identical in both engines. Guards keep
    // degenerate arms (n<2, zero variance, zero control mean) NULL
    // instead of throwing under Spark's ANSI division.
    // Scale: ONE partial-aggregated groupBy over the event scan —
    // the conditional aggregates fold both arms in a single pass
    // (no per-variant subqueries, no join, no window).
    Q("q_abtest",
      s"""WITH e AS (SELECT event_type,
         |    CASE WHEN ${h28Duck("'ab1#' || user_id")} % 2 = 0
         |      THEN 'A' ELSE 'B' END AS variant,
         |    round(value, 6) AS y FROM events),
         |m AS (SELECT event_type,
         |    count(CASE WHEN variant = 'A' THEN 1 END) AS na,
         |    count(CASE WHEN variant = 'B' THEN 1 END) AS nb,
         |    ${dsumSql("CASE WHEN variant = 'A' THEN y END")} AS sa,
         |    ${dsumSql("CASE WHEN variant = 'B' THEN y END")} AS sb,
         |    ${dsumSql("CASE WHEN variant = 'A' THEN round(y * y, 6) END")} AS qa,
         |    ${dsumSql("CASE WHEN variant = 'B' THEN round(y * y, 6) END")} AS qb
         |  FROM e GROUP BY event_type)
         |SELECT event_type, na, nb,
         |  CASE WHEN na = 0 THEN NULL ELSE
         |    CAST(floor((2 * CAST(round(sa * 1000000) AS BIGINT) + na)
         |      / (2.0 * na)) / 1000000.0 AS DOUBLE) END AS mean_a,
         |  CASE WHEN nb = 0 THEN NULL ELSE
         |    CAST(floor((2 * CAST(round(sb * 1000000) AS BIGINT) + nb)
         |      / (2.0 * nb)) / 1000000.0 AS DOUBLE) END AS mean_b,
         |  CASE WHEN na = 0 OR nb = 0 OR sa / na = 0 THEN NULL ELSE
         |    round((sb / nb - sa / na) / (sa / na), 6) END AS lift,
         |  CASE WHEN na < 2 OR nb < 2
         |         OR (qa - sa * sa / na) / (na - 1) / na
         |            + (qb - sb * sb / nb) / (nb - 1) / nb <= 0 THEN NULL
         |  ELSE round((sb / nb - sa / na)
         |    / sqrt((qa - sa * sa / na) / (na - 1) / na
         |           + (qb - sb * sb / nb) / (nb - 1) / nb), 6) END AS t_welch
         |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        when(expr(h28("concat('ab1#', CAST(user_id AS STRING))")) % 2 === 0,
          "A").otherwise("B").as("variant"),
        round(col("value"), 6).as("y"))
      val m = e.groupBy("event_type").agg(
        count(when(col("variant") === "A", 1)).as("na"),
        count(when(col("variant") === "B", 1)).as("nb"),
        dsum(when(col("variant") === "A", col("y"))).as("sa"),
        dsum(when(col("variant") === "B", col("y"))).as("sb"),
        dsum(when(col("variant") === "A", round(col("y") * col("y"), 6)))
          .as("qa"),
        dsum(when(col("variant") === "B", round(col("y") * col("y"), 6)))
          .as("qb"))
      // The per-arm means are NEW small-denominator rationals → the
      // package.scala mean-rounding caveat applies: recover the
      // exact micro-unit sum from the 6dp dsum and round half-up in
      // INTEGER space (ties toward +inf by definition in both
      // engines), never via round(double). lift/t divide through
      // sqrt/ratio chains (irrational operands — tie-free).
      m.selectExpr("event_type", "na", "nb",
        "CASE WHEN na = 0 THEN NULL ELSE " +
          "CAST(floor((2 * CAST(round(sa * 1000000) AS BIGINT) + na)" +
          " / (2.0 * na)) / 1000000.0 AS DOUBLE) END AS mean_a",
        "CASE WHEN nb = 0 THEN NULL ELSE " +
          "CAST(floor((2 * CAST(round(sb * 1000000) AS BIGINT) + nb)" +
          " / (2.0 * nb)) / 1000000.0 AS DOUBLE) END AS mean_b",
        "CASE WHEN na = 0 OR nb = 0 OR sa / na = 0 THEN NULL ELSE " +
          "round((sb / nb - sa / na) / (sa / na), 6) END AS lift",
        "CASE WHEN na < 2 OR nb < 2 " +
          "OR (qa - sa * sa / na) / (na - 1) / na" +
          " + (qb - sb * sb / nb) / (nb - 1) / nb <= 0 THEN NULL " +
          "ELSE round((sb / nb - sa / na) " +
          "/ sqrt((qa - sa * sa / na) / (na - 1) / na" +
          " + (qb - sb * sb / nb) / (nb - 1) / nb), 6) END AS t_welch")
        .orderBy("event_type")
    },

    // CHI-SQUARE INDEPENDENCE — the lang × source contingency table
    // with each cell's expected count and χ² contribution: the
    // dataset-balance audit that answers "is source coverage
    // independent of language, and which cells drive the skew" (the
    // feature-selection / stratification-check primitive; a large
    // contribution pinpoints the over/under-represented slice to fix
    // before mixture weighting). Expected = rt·ct/N computed in
    // DOUBLE (a BIGINT product would overflow once rt·ct passes 2⁶³ —
    // reachable at 100 TB row counts; the double chain is the same
    // IEEE ops in both engines, so it stays bit-identical at any
    // magnitude); the contribution reuses the same unrounded
    // expression (rounding expected first would corrupt it).
    // Scale: ONE partial-aggregated groupBy folds the corpus to the
    // |lang|×|source| cell frame; the row/column/grand totals are
    // aggregates OF THAT FRAME (never a second corpus scan) and
    // BROADCAST back onto it — at 100 TB the only data-sized
    // exchange is the first groupBy's hash.
    Q("q_chi2_indep",
      """WITH c AS (SELECT lang, source, count(*) AS o FROM documents
        |           GROUP BY lang, source),
        |r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY lang),
        |s AS (SELECT source, sum(o) AS ct FROM c GROUP BY source),
        |n AS (SELECT sum(o) AS n FROM c)
        |SELECT c.lang, c.source, o,
        |  round(CAST(rt AS DOUBLE) * ct / n, 6) AS expected,
        |  round((o - CAST(rt AS DOUBLE) * ct / n)
        |      * (o - CAST(rt AS DOUBLE) * ct / n)
        |      / (CAST(rt AS DOUBLE) * ct / n), 6) AS contrib
        |FROM c JOIN r USING (lang) JOIN s USING (source) CROSS JOIN n
        |ORDER BY lang, source""".stripMargin) { (s, d) =>
      // Cell frame is |lang|×|source|-sized; localCheckpoint pins it
      // so the three total branches read it instead of re-scanning
      // the corpus.
      val c = Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        .localCheckpoint(eager = false)
      val r = c.groupBy("lang").agg(sum("o").as("rt"))
      val sc = c.groupBy("source").agg(sum("o").as("ct"))
      val n = c.agg(sum("o").as("n"))
      c.join(broadcast(r), "lang").join(broadcast(sc), "source")
        .crossJoin(broadcast(n))
        .selectExpr("lang", "source", "o",
          "round(CAST(rt AS DOUBLE) * ct / n, 6) AS expected",
          "round((o - CAST(rt AS DOUBLE) * ct / n)" +
            " * (o - CAST(rt AS DOUBLE) * ct / n)" +
            " / (CAST(rt AS DOUBLE) * ct / n), 6) AS contrib")
        .orderBy("lang", "source")
    },

    // SEASONALITY PROFILE — the day-of-week × hour-of-day traffic
    // fingerprint per event_type: per-cell event counts, mean value
    // (exact integer-space micro-mean — the mean-rounding caveat),
    // and the seasonal index mean_cell / mean_type that says "3 AM
    // Sunday purchases run at 0.7× the typical purchase" — the
    // capacity-planning / anomaly-baseline grid every event pipeline
    // publishes (q_changepoint dates LEVEL shifts; this is the
    // RECURRING shape). Day numbering is Monday=1 ISO on both sides
    // (Spark weekday()+1 ≡ DuckDB isodow — dayofweek() is
    // Sunday-first in Spark but Sunday=0 in DuckDB, a silent
    // off-by-one this pairing avoids). The index divides two
    // UNROUNDED micro-unit means written identically in both
    // engines (huge-denominator rational — tie-free), rounded 6dp.
    // Scale: ONE partial-aggregated groupBy folds events to the
    // ≤|types|·168 cell frame (localCheckpoint pins it); per-type
    // totals are aggregates OF THAT FRAME, broadcast back.
    Q("q_seasonality",
      """WITH v AS (SELECT event_type,
        |    isodow(CAST(ts AS TIMESTAMP)) AS dow,
        |    hour(CAST(ts AS TIMESTAMP)) AS hod,
        |    CAST(round(value * 1000000) AS BIGINT) AS y6 FROM events),
        |c AS (SELECT event_type, dow, hod, CAST(sum(y6) AS BIGINT) AS s,
        |      count(*) AS n FROM v GROUP BY 1, 2, 3),
        |g AS (SELECT event_type, CAST(sum(s) AS BIGINT) AS st,
        |      CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(dow AS INT) AS dow,
        |  CAST(hod AS INT) AS hod, n,
        |  CAST(floor((2 * s + n) / (2.0 * n)) / 1000000.0 AS DOUBLE)
        |    AS mean_value,
        |  round((CAST(s AS DOUBLE) / n) / (CAST(st AS DOUBLE) / nt), 6)
        |    AS seasonal_index
        |FROM c JOIN g USING (event_type)
        |ORDER BY event_type, dow, hod""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d).select(col("event_type"),
        (weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hod"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("y6"))
      val c = v.groupBy("event_type", "dow", "hod")
        .agg(sum("y6").as("s"), count(lit(1)).as("n"))
        .localCheckpoint(eager = false)
      val g = c.groupBy("event_type")
        .agg(sum("s").cast("long").as("st"), sum("n").cast("long").as("nt"))
      c.join(broadcast(g), "event_type")
        .selectExpr("event_type", "CAST(dow AS INT) AS dow",
          "CAST(hod AS INT) AS hod", "n",
          "CAST(floor((2 * s + n) / (2.0 * n)) / 1000000.0 AS DOUBLE)" +
            " AS mean_value",
          "round((CAST(s AS DOUBLE) / n) / (CAST(st AS DOUBLE) / nt), 6)" +
            " AS seasonal_index")
        .orderBy("event_type", "dow", "hod")
    },

    // MARKET-BASKET ASSOCIATION RULES — support/confidence/lift for
    // part pairs co-purchased within an order (the co-occurrence
    // mining pass behind "frequently bought together" and feature
    // cross discovery). Scale: the basket frame (distinct order,
    // part) is ONE partial-aggregated pass over lineitem,
    // localCheckpointed and reused by all three counts; the pair
    // self-join co-partitions both sides on the order key (pairs per
    // order is small — the join output is Σ per-order C(k,2), not
    // |baskets|²); item counts and the 1-row basket total are
    // part-sized / 1-row BROADCASTs onto the pair frame; the final
    // top-100 is a TakeOrderedAndProject. Determinism: every metric
    // is a single IEEE division/multiplication of exact BIGINT
    // counts written identically in both engines, round(6); ties in
    // lift break on (p1, p2).
    Q("q_assoc_rules",
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |           FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
        |item AS (SELECT pk, count(*) AS icnt FROM b GROUP BY pk),
        |pairs AS (SELECT a.pk AS p1, c.pk AS p2, count(*) AS pair_cnt
        |          FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
        |          GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p1, p2, pair_cnt, i1.icnt AS cnt1, i2.icnt AS cnt2,
        |  round(CAST(pair_cnt AS DOUBLE) / n_orders, 6) AS support,
        |  round(CAST(pair_cnt AS DOUBLE) / i1.icnt, 6) AS confidence,
        |  round(CAST(pair_cnt * n_orders AS DOUBLE)
        |        / (i1.icnt * i2.icnt), 6) AS lift
        |FROM pairs JOIN item i1 ON p1 = i1.pk
        |           JOIN item i2 ON p2 = i2.pk CROSS JOIN n
        |ORDER BY lift DESC, p1, p2 LIMIT 100""".stripMargin) { (s, d) =>
      // Size-gated basket build (Graphs.basketFrame): past the gate
      // the ONE exchange hashes the order key, which the pair
      // self-join below reuses co-partitioned — the old
      // `.distinct()` hashed on BOTH columns, so each join side
      // re-exchanged and re-sorted the basket frame (the 3 GB sort
      // spill the round-17 spill columns flagged at 100×).
      val b = Graphs.basketFrame(s, d)
        .select(col("o").as("ok"), col("p").as("pk"))
        .localCheckpoint(eager = false)
      val n = b.agg(countDistinct(col("ok")).as("n_orders"))
      val item = b.groupBy("pk").agg(count(lit(1)).as("icnt"))
      val pairs = b.as("a")
        .join(b.as("c"), col("a.ok") === col("c.ok") &&
          col("a.pk") < col("c.pk"))
        .groupBy(col("a.pk").as("p1"), col("c.pk").as("p2"))
        .agg(count(lit(1)).as("pair_cnt"))
        .filter(col("pair_cnt") >= 2)
      pairs
        .join(broadcast(item.select(col("pk").as("p1"),
          col("icnt").as("cnt1"))), "p1")
        .join(broadcast(item.select(col("pk").as("p2"),
          col("icnt").as("cnt2"))), "p2")
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("pair_cnt"), col("cnt1"),
          col("cnt2"),
          round(col("pair_cnt").cast("double") / col("n_orders"), 6)
            .as("support"),
          round(col("pair_cnt").cast("double") / col("cnt1"), 6)
            .as("confidence"),
          round((col("pair_cnt") * col("n_orders")).cast("double") /
            (col("cnt1") * col("cnt2")), 6).as("lift"))
        .orderBy(desc("lift"), col("p1"), col("p2")).limit(100)
    },

    // GINI CONCENTRATION — per order-priority Gini coefficient of
    // order value (the inequality/concentration readout a corpus
    // pipeline runs over source or domain contribution before
    // rebalancing a mixture). Rank formula over ascending spend:
    // G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx). Scale: the rank is a
    // per-group window (5 groups here — at higher group cardinality
    // the same sort distributes; for a SINGLE global group use the
    // q_skyline range-bucketed prefix-sum discipline instead); both
    // moment sums are partial-aggregated DECIMAL(38,6) with per-row
    // round(6) BEFORE the sum (i·xᵢ is one IEEE multiply of exact
    // operands — bit-identical in both engines). The final Gini
    // arithmetic runs on identical double operands.
    Q("q_gini",
      """WITH t AS (SELECT o_orderpriority AS prio,
        |    round(o_totalprice, 6) AS x, o_orderkey AS k FROM orders),
        |w AS (SELECT prio, x,
        |    row_number() OVER (PARTITION BY prio ORDER BY x, k) AS i
        |  FROM t),
        |g AS (SELECT prio, count(*) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(round(i * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
        |      AS ws
        |  FROM w GROUP BY prio)
        |SELECT prio, n, round(s, 6) AS total,
        |  CASE WHEN s = 0 THEN NULL
        |       ELSE round((2 * ws - (n + 1) * s) / (n * s), 6) END AS gini
        |FROM g ORDER BY prio""".stripMargin) { (s, d) =>
      val t = Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice"), 6).as("x"), col("o_orderkey").as("k"))
      // Distributed per-group rank (round 18 — the q_spearman
      // two-level prefix-sum discipline): prio has 5 values, so the
      // plain Window.partitionBy("prio") row_number sorted the WHOLE
      // corpus in 5 tasks (27 of 32 cores idle at 100×). Instead:
      // range-partition on the FULL sort key (prio, x, k), rank
      // within each (partition, prio) slice — a distributed,
      // partition-keyed window — and add back per-(partition, prio)
      // row-count prefix offsets from the metadata-sized (≤ parts×5
      // rows) broadcast frame. k (o_orderkey) is unique, so the order
      // is total and the two-level rank equals the declared
      // row_number at ANY sampled boundary placement; the pin below
      // materializes the sampled range split ONCE so both consumers
      // (offsets + ranks) see the same partition ids.
      val parts = t.repartitionByRange(
          s.sparkContext.defaultParallelism, col("prio"), col("x"), col("k"))
        .withColumn("pid", spark_partition_id())
        .transform(graft.Tables.loopPin)
      val offsets = parts.groupBy("pid", "prio")
        .agg(count(lit(1)).cast("long").as("pc"))
        .withColumn("off", coalesce(
          sum("pc").over(Window.partitionBy("prio").orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("long"))
        .select("pid", "prio", "off")
      val w = Window.partitionBy("pid", "prio").orderBy("x", "k")
      parts.withColumn("rn", row_number().over(w))
        .join(broadcast(offsets), Seq("pid", "prio"))
        .withColumn("i", col("off") + col("rn"))
        .groupBy("prio")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(38, 6))).cast("double").as("s"),
          sum(round(col("i") * col("x"), 6).cast(DecimalType(38, 6)))
            .cast("double").as("ws"))
        .selectExpr("prio", "n", "round(s, 6) AS total",
          "CASE WHEN s = 0 THEN NULL ELSE " +
            "round((2 * ws - (n + 1) * s) / (n * s), 6) END AS gini")
        .orderBy("prio")
    },

    // KAPLAN-MEIER SURVIVAL — time-to-conversion survival curve with
    // right-censoring (the churn/retention-duration estimator; the
    // windowed cousin of q_retention, which counts fixed offsets).
    // The "event" is a user's FIRST high-value action
    // (round(value,6) > 200 — rounded-vs-constant comparisons are
    // engine-identical); the clock starts at the user's first event;
    // users who never convert are CENSORED at their last observed
    // event (they exit the risk set alive — dropping them instead
    // would bias S(t) low, the textbook KM error).
    // S(t) = Π_{t'≤t} (1 − d_t'/n_t'). Scale: per-user extent is ONE
    // partial-aggregated groupBy over the fact scan (the conversion
    // timestamp is a conditional min — no second pass, no join);
    // everything after lives on the duration-distinct frame (≤ the
    // observation window in days at ANY corpus size — the
    // partition-less windows are constant-sized, not data-sized).
    // The product runs as exp(Σ ln) with per-term round(9) into a
    // DECIMAL(38,9) running sum (the q_lm_score ln discipline); a
    // zero factor (d = n at some t) is flagged via a running max
    // instead of ln(0) = −∞, which DECIMAL would NULL out
    // differently across engines.
    Q("q_survival",
      """WITH u AS (SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS t0,
        |    CAST(max(ts) AS TIMESTAMP) AS t1,
        |    min(CASE WHEN round(value, 6) > 200
        |        THEN CAST(ts AS TIMESTAMP) END) AS tp
        |  FROM events GROUP BY 1),
        |l AS (SELECT date_diff('day', CAST(t0 AS DATE),
        |        CAST(coalesce(tp, t1) AS DATE)) AS dur,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS observed
        |  FROM u),
        |d AS (SELECT dur, CAST(sum(observed) AS BIGINT) AS d_events,
        |    CAST(count(*) - sum(observed) AS BIGINT) AS censored,
        |    count(*) AS total FROM l GROUP BY dur),
        |r AS (SELECT dur, d_events, censored,
        |    CAST(sum(total) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk FROM d),
        |e AS (SELECT dur, d_events, censored, at_risk,
        |    CASE WHEN d_events > 0 AND d_events < at_risk
        |         THEN round(ln(1 - CAST(d_events AS DOUBLE) / at_risk), 9)
        |         END AS term,
        |    CASE WHEN d_events > 0 AND d_events >= at_risk
        |         THEN 1 ELSE 0 END AS zf FROM r)
        |SELECT dur, at_risk, d_events, censored,
        |  CASE WHEN max(zf) OVER (ORDER BY dur) = 1 THEN 0.0
        |  ELSE round(exp(CAST(coalesce(sum(CAST(term AS DECIMAL(38,9)))
        |    OVER (ORDER BY dur), 0) AS DOUBLE)), 6) END AS survival
        |FROM e ORDER BY dur""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(min("ts").as("t0"), max("ts").as("t1"),
          min(when(round(col("value"), 6) > 200, col("ts"))).as("tp"))
      val l = u.select(
        datediff(coalesce(col("tp"), col("t1")).cast("date"),
          col("t0").cast("date")).as("dur"),
        when(col("tp").isNotNull, 1).otherwise(0).as("observed"))
      val dd = l.groupBy("dur").agg(
        sum("observed").cast("long").as("d_events"),
        (count(lit(1)) - sum("observed")).cast("long").as("censored"),
        count(lit(1)).as("total"))
      val wSuf = Window.orderBy("dur")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wPre = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dd.withColumn("at_risk", sum("total").over(wSuf))
        .withColumn("term",
          when(col("d_events") > 0 && col("d_events") < col("at_risk"),
            round(log(lit(1) - col("d_events").cast("double") /
              col("at_risk")), 9)))
        .withColumn("zf",
          when(col("d_events") > 0 &&
            col("d_events") >= col("at_risk"), 1).otherwise(0))
        .select(col("dur"), col("at_risk"), col("d_events"),
          col("censored"),
          when(max("zf").over(wPre) === 1, lit(0.0))
            .otherwise(round(exp(coalesce(
              sum(col("term").cast(DecimalType(38, 9))).over(wPre),
              lit(0)).cast("double")), 6)).as("survival"))
        .orderBy("dur")
    },

    // RFM SEGMENTATION — recency/frequency/monetary quintile scores
    // per customer, rolled up to segment cells (the
    // user-value stratification every growth pipeline runs; here it
    // is also the "stratify a corpus by contributor behavior"
    // primitive). Scale: per-customer extent is ONE
    // partial-aggregated groupBy over orders (localCheckpointed —
    // reused by the boundary scan and the scoring scan); quintile
    // boundaries are a 1-row exact-percentile frame BROADCAST onto
    // the customer frame (the q_discretize equal-frequency
    // discipline — swap percentile → approx_percentile for the
    // 100 TB path); scoring is scan-local filter-count against the
    // rounded boundary arrays (rounded-vs-rounded comparisons are
    // engine-identical; a value ON a boundary goes to the lower
    // bucket via strict >); the rollup is a ≤125-cell aggregate.
    Q("q_rfm",
      """WITH gm AS (SELECT CAST(max(o_orderdate) AS DATE) AS gmax
        |            FROM orders),
        |cust AS (SELECT o_custkey AS ck,
        |    date_diff('day', CAST(max(o_orderdate) AS DATE), gmax) AS rec,
        |    count(*) AS freq,
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |          AS DOUBLE), 6) AS money
        |  FROM orders CROSS JOIN gm GROUP BY o_custkey, gmax),
        |qb AS (SELECT
        |    [round(x, 6) for x in
        |     quantile_cont(rec,   [0.2, 0.4, 0.6, 0.8])] AS rq,
        |    [round(x, 6) for x in
        |     quantile_cont(freq,  [0.2, 0.4, 0.6, 0.8])] AS fq,
        |    [round(x, 6) for x in
        |     quantile_cont(money, [0.2, 0.4, 0.6, 0.8])] AS mq
        |  FROM cust),
        |sc AS (SELECT ck, money,
        |    5 - len(list_filter(rq, q -> round(rec, 6)   > q)) AS r_score,
        |    1 + len(list_filter(fq, q -> round(freq, 6)  > q)) AS f_score,
        |    1 + len(list_filter(mq, q -> round(money, 6) > q)) AS m_score
        |  FROM cust CROSS JOIN qb)
        |SELECT CAST(r_score AS INT) AS r_score,
        |  CAST(f_score AS INT) AS f_score,
        |  CAST(m_score AS INT) AS m_score, count(*) AS n,
        |  round(CAST(sum(CAST(money AS DECIMAL(38,6))) AS DOUBLE), 6)
        |    AS money_sum,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |         THEN 'champion'
        |       WHEN f_score >= 4 THEN 'loyal'
        |       WHEN m_score >= 4 THEN 'big_spender'
        |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |       WHEN r_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM sc GROUP BY r_score, f_score, m_score
        |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val gm = Tables.orders(s, d)
        .agg(max(col("o_orderdate").cast("date")).as("gmax"))
      val cust = Tables.orders(s, d).crossJoin(broadcast(gm))
        .groupBy(col("o_custkey").as("ck"), col("gmax"))
        .agg(datediff(col("gmax"),
          max(col("o_orderdate").cast("date"))).as("rec"),
          count(lit(1)).as("freq"), dsum(col("o_totalprice")).as("money"))
        .drop("gmax").localCheckpoint(eager = false)
      val qb = cust.agg(
        expr("transform(percentile(rec, array(0.2D, 0.4D, 0.6D, 0.8D))," +
          " x -> round(x, 6))").as("rq"),
        expr("transform(percentile(freq, array(0.2D, 0.4D, 0.6D, 0.8D))," +
          " x -> round(x, 6))").as("fq"),
        expr("transform(percentile(money, array(0.2D, 0.4D, 0.6D, 0.8D))," +
          " x -> round(x, 6))").as("mq"))
      cust.crossJoin(broadcast(qb))
        .selectExpr("money",
          "5 - size(filter(rq, q -> round(rec, 6) > q)) AS r_score",
          "1 + size(filter(fq, q -> round(freq, 6) > q)) AS f_score",
          "1 + size(filter(mq, q -> round(money, 6) > q)) AS m_score")
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n"), dsum(col("money")).as("money_sum"))
        .selectExpr("CAST(r_score AS INT) AS r_score",
          "CAST(f_score AS INT) AS f_score",
          "CAST(m_score AS INT) AS m_score", "n", "money_sum",
          "CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4" +
            " THEN 'champion'" +
            " WHEN f_score >= 4 THEN 'loyal'" +
            " WHEN m_score >= 4 THEN 'big_spender'" +
            " WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'" +
            " WHEN r_score <= 2 THEN 'hibernating'" +
            " ELSE 'regular' END AS segment")
        .orderBy("r_score", "f_score", "m_score")
    },

    // COHORT LTV CURVES — cumulative revenue per customer by cohort
    // (month of first order) and age-in-months: the lifetime-value
    // triangle every subscription/growth readout is built on, and
    // the "does data from source S keep paying off over time" curve
    // when cohorts are ingestion batches. Scale: ONE shuffle on the
    // customer key computes each customer's first month as a window
    // min (no self-join); ONE partial-aggregated groupBy folds to
    // the cohort×age triangle (≤ months² rows at ANY corpus size,
    // localCheckpoint pinned). Cohort size needs NO extra pass:
    // every customer has an age-0 row by construction (their first
    // order), so size = n_active at age 0, re-aggregated from the
    // triangle and broadcast back. Determinism: revenue folds as
    // exact integer micros (floor(x·1e6 + 0.5) — never a round-tie);
    // the running sum is a BIGINT window over the bounded triangle;
    // LTV divides in EXACT INTEGER space — (2·cum + sz) DIV (2·sz),
    // ties toward +inf by definition in both engines (Spark DIV and
    // DuckDB // agree on positive operands) — per the mean-rounding
    // caveat (package.scala).
    Q("q_cohort_ltv",
      """WITH o AS (SELECT o_custkey AS ck,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |    CAST(floor(round(o_totalprice, 6) * 1e6 + 0.5) AS BIGINT)
        |      AS micro FROM orders),
        |w AS (SELECT ck, m, micro, min(m) OVER (PARTITION BY ck) AS m0
        |      FROM o),
        |cell AS (SELECT m0 AS cohort, date_diff('month', m0, m) AS age,
        |    count(*) AS n_orders, count(DISTINCT ck) AS n_active,
        |    CAST(sum(micro) AS BIGINT) AS rev_micro
        |  FROM w GROUP BY 1, 2),
        |sz AS (SELECT cohort, n_active AS cohort_size FROM cell
        |       WHERE age = 0),
        |c AS (SELECT cohort, age, n_orders, n_active, rev_micro,
        |    CAST(sum(rev_micro) OVER (PARTITION BY cohort ORDER BY age)
        |      AS BIGINT) AS cum_micro FROM cell)
        |SELECT c.cohort, c.age, n_orders, n_active, cohort_size,
        |  round(rev_micro / 1e6, 6) AS revenue,
        |  round(((2 * cum_micro + cohort_size)
        |         // (2 * cohort_size)) / 1e6, 6) AS ltv
        |FROM c JOIN sz ON c.cohort = sz.cohort
        |ORDER BY c.cohort, c.age""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("ck"),
        trunc(col("o_orderdate").cast("date"), "MM").as("m"),
        floor(round(col("o_totalprice"), 6) * lit(1e6) + 0.5).cast("long")
          .as("micro"))
      val cell = o
        .withColumn("m0", min("m").over(Window.partitionBy("ck")))
        .groupBy(col("m0").as("cohort"),
          months_between(col("m"), col("m0")).cast("int").as("age"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct("ck").as("n_active"),
          sum("micro").cast("long").as("rev_micro"))
        .localCheckpoint(eager = false)
      val sz = cell.filter(col("age") === 0)
        .select(col("cohort"), col("n_active").as("cohort_size"))
      val cum = Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cell.withColumn("cum_micro", sum("rev_micro").over(cum).cast("long"))
        .join(broadcast(sz), "cohort")
        .selectExpr("cohort", "age", "n_orders", "n_active", "cohort_size",
          "round(rev_micro / 1e6, 6) AS revenue",
          "round(((2 * cum_micro + cohort_size)" +
            " DIV (2 * cohort_size)) / 1e6, 6) AS ltv")
        .orderBy("cohort", "age")
    },

    // EVENT PRECEDENCE MINING — for every ordered pair of event
    // types, how often a user's FIRST occurrence of t1 precedes
    // their first occurrence of t2, with a binomial z-score against
    // the 50/50 null: the "what do users do first" / canonical-
    // ordering readout (onboarding-order analysis; q_funnel checks
    // ONE hypothesized order — this mines ALL pairwise orders, and
    // q_path_ngrams counts CONSECUTIVE steps while this tests
    // global precedence). Scale: per-user first-occurrence extent is
    // ONE partial-aggregated groupBy (users×|types| frame); the
    // pair join co-partitions on the user key (|types|²/2 rows per
    // user — constant-bounded); the rollup partial-aggregates to
    // ≤|types|² cells. Determinism: counts are exact integers;
    // equal first-timestamps count as NOT-before (strict <, same in
    // both engines); the z arithmetic runs on identical doubles.
    Q("q_precedence",
      """WITH x AS (SELECT user_id, event_type AS t, min(ts) AS ft
        |           FROM events GROUP BY 1, 2),
        |p AS (SELECT a.t AS t1, b.t AS t2, count(*) AS n_both,
        |    CAST(sum(CASE WHEN a.ft < b.ft THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_before
        |  FROM x a JOIN x b ON a.user_id = b.user_id AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT t1, t2, n_both, n_before,
        |  round(CAST(n_before AS DOUBLE) / n_both, 6) AS p_t1_first,
        |  round((n_before - CAST(n_both AS DOUBLE) / 2)
        |        / sqrt(CAST(n_both AS DOUBLE) / 4), 6) AS z
        |FROM p ORDER BY t1, t2""".stripMargin) { (s, d) =>
      val x = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type").as("t"))
        .agg(min("ts").as("ft"))
        .localCheckpoint(eager = false)
      x.as("a").join(x.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
        .agg(count(lit(1)).as("n_both"),
          sum(when(col("a.ft") < col("b.ft"), 1).otherwise(0))
            .cast("long").as("n_before"))
        .selectExpr("t1", "t2", "n_both", "n_before",
          "round(CAST(n_before AS DOUBLE) / n_both, 6) AS p_t1_first",
          "round((n_before - CAST(n_both AS DOUBLE) / 2)" +
            " / sqrt(CAST(n_both AS DOUBLE) / 4), 6) AS z")
        .orderBy("t1", "t2")
    },

    // POISSON BOOTSTRAP CI — per-priority bootstrap confidence
    // interval on mean order value via 32 Poisson(1)-weighted
    // replicas: THE scale-out bootstrap (classic resampling draws n
    // rows WITH replacement — a global shuffle per replica;
    // Poisson(1) weights approximate multinomial resampling with a
    // PER-ROW INDEPENDENT weight, so all B replicas fold in ONE
    // partial-aggregated pass — the technique production pipelines
    // use for CIs over billions of rows). Determinism: the weight is
    // an inverse-CDF lookup of the salted row hash against INTEGER
    // thresholds (floor(CDF·2^28) literals — exact integer compares,
    // no cross-engine exp()); replica and real means divide in
    // EXACT INTEGER space ((2S+n) DIV 2n — the mean-rounding
    // caveat); the CI bounds are exact percentiles over the 32
    // identical replica means (q_rfm's percentile ≡ quantile_cont
    // pairing).
    Q("q_bootstrap_ci",
      s"""WITH o AS (SELECT o_orderkey AS k, o_orderpriority AS prio,
         |    CAST(floor(round(o_totalprice, 6) * 1e6 + 0.5) AS BIGINT)
         |      AS micro FROM orders),
         |rep AS (SELECT prio, t.b, micro,
         |    CASE WHEN ${h28Duck("'boot#' || t.b || '#' || k")} < 98751885
         |           THEN 0
         |         WHEN ${h28Duck("'boot#' || t.b || '#' || k")} < 197503771
         |           THEN 1
         |         WHEN ${h28Duck("'boot#' || t.b || '#' || k")} < 246879713
         |           THEN 2
         |         WHEN ${h28Duck("'boot#' || t.b || '#' || k")} < 263338361
         |           THEN 3
         |         WHEN ${h28Duck("'boot#' || t.b || '#' || k")} < 267453023
         |           THEN 4
         |         WHEN ${h28Duck("'boot#' || t.b || '#' || k")} < 268275955
         |           THEN 5
         |         ELSE 6 END AS wgt
         |  FROM o, UNNEST(generate_series(1, 32)) AS t(b)),
         |rm AS (SELECT prio, b, CAST(sum(wgt * micro) AS BIGINT) AS s,
         |    CAST(sum(wgt) AS BIGINT) AS n FROM rep GROUP BY 1, 2),
         |means AS (SELECT prio, ((2 * s + n) // (2 * n)) / 1e6 AS m
         |          FROM rm WHERE n > 0),
         |re AS (SELECT prio, count(*) AS n,
         |    ((2 * CAST(sum(micro) AS BIGINT) + count(*))
         |     // (2 * count(*))) / 1e6 AS mean FROM o GROUP BY prio)
         |SELECT re.prio, n, mean,
         |  round(quantile_cont(m, 0.025), 6) AS ci_lo,
         |  round(quantile_cont(m, 0.975), 6) AS ci_hi
         |FROM re JOIN means ON re.prio = means.prio
         |GROUP BY re.prio, n, mean ORDER BY re.prio""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        floor(round(col("o_totalprice"), 6) * lit(1e6) + 0.5).cast("long")
          .as("micro"))
        .localCheckpoint(eager = false)
      val rep = fanout(o)
        .withColumn("b", explode(expr("sequence(1, 32)")))
        .withColumn("h", expr(h28(
          "concat('boot#', CAST(b AS STRING), '#', CAST(k AS STRING))")))
        .withColumn("wgt",
          when(col("h") < 98751885L, 0).when(col("h") < 197503771L, 1)
            .when(col("h") < 246879713L, 2).when(col("h") < 263338361L, 3)
            .when(col("h") < 267453023L, 4).when(col("h") < 268275955L, 5)
            .otherwise(6))
      val means = rep.groupBy("prio", "b")
        .agg(sum(col("wgt") * col("micro")).cast("long").as("s"),
          sum("wgt").cast("long").as("n"))
        .filter(col("n") > 0)
        .selectExpr("prio", "((2 * s + n) DIV (2 * n)) / 1e6 AS m")
      val re = o.groupBy("prio")
        .agg(count(lit(1)).as("n"), sum("micro").cast("long").as("sm"))
        .selectExpr("prio", "n",
          "((2 * sm + n) DIV (2 * n)) / 1e6 AS mean")
      re.join(means, "prio")
        .groupBy("prio", "n", "mean")
        .agg(round(expr("percentile(m, 0.025D)"), 6).as("ci_lo"),
          round(expr("percentile(m, 0.975D)"), 6).as("ci_hi"))
        .orderBy("prio")
    },

    // MULTIVARIATE OLS VIA NORMAL EQUATIONS — per-group 2-feature +
    // intercept least squares (y = extendedprice on quantity,
    // discount) solved in CLOSED FORM with Cramer's rule over the
    // 3×3 moment matrix, plus R²: distributed regression without a
    // single gradient step or driver-side solve (q_group_regression
    // is the 1-feature special case; this is the general mechanism —
    // the whole fit is TEN moment sums, so it runs in ONE
    // partial-aggregated pass at any row count, and the solve is
    // scan-local arithmetic on the group-sized frame). R² uses the
    // normal-equation identity SSE = Syy − b·[Sy, Sx1y, Sx2y] — no
    // residual pass. Determinism: per-row products are single IEEE
    // multiplies of rounded operands, rounded 6dp BEFORE the
    // DECIMAL(38,6) sums (dsum discipline); determinants and
    // divisions run on identical CAST-double sums in both engines;
    // R² reuses the ROUNDED coefficients so both engines compute it
    // from identical operands.
    Q("q_ols_multi",
      s"""WITH t AS (SELECT l_returnflag AS grp,
         |    round(l_extendedprice, 6) AS y, round(l_quantity, 6) AS x1,
         |    round(l_discount, 6) AS x2 FROM lineitem),
         |m AS (SELECT grp, CAST(count(*) AS DOUBLE) AS n,
         |    $olsMoments
         |  FROM t GROUP BY grp),
         |sel AS (SELECT grp, n, sy, sx1y, sx2y, syy, sx1, sx2,
         |    $olsDets FROM m),
         |b AS (SELECT grp, n, sy, sx1y, sx2y, syy,
         |    round(d0 / det, 6) AS b0, round(d1 / det, 6) AS b1,
         |    round(d2 / det, 6) AS b2 FROM sel)
         |SELECT grp, CAST(n AS BIGINT) AS n, b0, b1, b2,
         |  $olsR2 AS r2
         |FROM b ORDER BY grp""".stripMargin) { (s, d) =>
      val t = Tables.lineitem(s, d).select(
        col("l_returnflag").as("grp"),
        round(col("l_extendedprice"), 6).as("y"),
        round(col("l_quantity"), 6).as("x1"),
        round(col("l_discount"), 6).as("x2"))
      val m = t.groupBy("grp").agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("x1")).as("sx1"), dsum(col("x2")).as("sx2"),
        dsum(col("y")).as("sy"),
        dsum(round(col("x1") * col("x1"), 6)).as("sx11"),
        dsum(round(col("x1") * col("x2"), 6)).as("sx12"),
        dsum(round(col("x2") * col("x2"), 6)).as("sx22"),
        dsum(round(col("x1") * col("y"), 6)).as("sx1y"),
        dsum(round(col("x2") * col("y"), 6)).as("sx2y"),
        dsum(round(col("y") * col("y"), 6)).as("syy"))
      m.selectExpr(Seq("grp", "n", "sy", "sx1y", "sx2y", "syy",
          "sx1", "sx2") ++ olsDets.split(",\n").map(_.trim): _*)
        .selectExpr("grp", "n", "sy", "sx1y", "sx2y", "syy",
          "round(d0 / det, 6) AS b0", "round(d1 / det, 6) AS b1",
          "round(d2 / det, 6) AS b2")
        .selectExpr("grp", "CAST(n AS BIGINT) AS n", "b0", "b1", "b2",
          s"$olsR2 AS r2")
        .orderBy("grp")
    },

    // MUTUAL INFORMATION — MI between two categorical columns
    // (order priority × order status) with per-cell PMI and MI
    // contributions: the EFFECT-SIZE companion to q_chi2_indep
    // (chi² answers "is the dependence real"; MI answers "how many
    // nats does knowing one buy about the other" — the feature-
    // dependence screen a pipeline runs before dropping redundant
    // columns). Scale: ONE partial-aggregated groupBy folds the
    // corpus to the ≤|A|·|B| joint-count frame; marginals and the
    // total re-aggregate THAT frame (no second scan) and broadcast
    // back; the MI total is a window over the constant-sized cell
    // frame. Determinism: every ln runs on exact BIGINT-ratio
    // operands, rounded 9dp per-term; the total folds the rounded
    // contributions through DECIMAL(38,9) — identical accumulation
    // in both engines.
    Q("q_mutual_info",
      """WITH j AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
        |           count(*) AS n_ab FROM orders GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM j),
        |ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM j
        |       GROUP BY a),
        |mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM j
        |       GROUP BY b),
        |cell AS (SELECT a, b, n_ab, n_a, n_b, n,
        |    round(ln((CAST(n_ab AS DOUBLE) * n) /
        |             (CAST(n_a AS DOUBLE) * n_b)), 9) AS pmi
        |  FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot)
        |SELECT a, b, n_ab, pmi,
        |  round(CAST(n_ab AS DOUBLE) / n * pmi, 9) AS mi_contrib,
        |  round(CAST(sum(CAST(round(CAST(n_ab AS DOUBLE) / n * pmi, 9)
        |        AS DECIMAL(38,9))) OVER () AS DOUBLE), 9) AS mi_total
        |FROM cell ORDER BY a, b""".stripMargin) { (s, d) =>
      val j = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("a"),
          col("o_orderstatus").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .localCheckpoint(eager = false)
      val tot = j.agg(sum("n_ab").cast("long").as("n"))
      val ma = j.groupBy("a").agg(sum("n_ab").cast("long").as("n_a"))
      val mb = j.groupBy("b").agg(sum("n_ab").cast("long").as("n_b"))
      j.join(broadcast(ma), "a").join(broadcast(mb), "b")
        .crossJoin(broadcast(tot))
        .selectExpr("a", "b", "n_ab", "n_a", "n_b", "n",
          "round(ln((CAST(n_ab AS DOUBLE) * n) /" +
            " (CAST(n_a AS DOUBLE) * n_b)), 9) AS pmi")
        .selectExpr("a", "b", "n_ab", "pmi",
          "round(CAST(n_ab AS DOUBLE) / n * pmi, 9) AS mi_contrib",
          "round(CAST(sum(CAST(round(CAST(n_ab AS DOUBLE) / n * pmi, 9)" +
            " AS DECIMAL(38,9))) OVER () AS DOUBLE), 9) AS mi_total")
        .orderBy("a", "b")
    },

    // PERMUTATION TEST — approximate-randomization two-sample test
    // on mean event value (view vs click): 64 deterministic
    // label-shuffle replicas in ONE pass, p = (1 + #{|diff_b| ≥
    // |diff_obs|}) / 65. The DISTRIBUTION-FREE member of the
    // inference triple (q_abtest assumes the normal z; q_bootstrap_ci
    // brackets the estimate; this tests the null by actually
    // breaking the labels). Per-row independent hash flips are the
    // scale form (exact permutation fixes group sizes — a global
    // shuffle per replica; the flip variant folds all B replicas
    // map-side, the q_bootstrap_ci stance). Determinism: flips are
    // salted-hash parity; group means divide in EXACT INTEGER micro
    // space; the p-value rounds in integer space too ((1+cnt)/65 CAN
    // land on a decimal half — the mean-rounding caveat).
    Q("q_permutation_test",
      s"""WITH g AS (SELECT event_id AS id, event_type AS t,
         |    CAST(floor(round(value, 6) * 1e6 + 0.5) AS BIGINT) AS micro
         |  FROM events WHERE event_type IN ('view', 'click')),
         |obs AS (SELECT
         |    CAST(sum(CASE WHEN t = 'view' THEN micro END) AS BIGINT) AS sa,
         |    CAST(count(CASE WHEN t = 'view' THEN 1 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN t = 'click' THEN micro END) AS BIGINT) AS sb,
         |    CAST(count(CASE WHEN t = 'click' THEN 1 END) AS BIGINT) AS nb
         |  FROM g),
         |rep AS (SELECT p.b,
         |    CASE WHEN ${h28Duck("'perm#' || p.b || '#' || id")} % 2 = 0
         |         THEN 0 ELSE 1 END AS side, micro
         |  FROM g, UNNEST(generate_series(1, 64)) AS p(b)),
         |perm AS (SELECT b,
         |    CAST(sum(CASE WHEN side = 0 THEN micro END) AS BIGINT) AS sa,
         |    CAST(count(CASE WHEN side = 0 THEN 1 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN side = 1 THEN micro END) AS BIGINT) AS sb,
         |    CAST(count(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS nb
         |  FROM rep GROUP BY b),
         |dm AS (SELECT b, ((2 * sa + na) // (2 * na)) / 1e6
         |               - ((2 * sb + nb) // (2 * nb)) / 1e6 AS diff
         |       FROM perm),
         |od AS (SELECT na, nb, ((2 * sa + na) // (2 * na)) / 1e6
         |               - ((2 * sb + nb) // (2 * nb)) / 1e6 AS diff
         |       FROM obs)
         |SELECT od.na, od.nb, round(od.diff, 6) AS diff_obs,
         |  CAST(count(*) FILTER (abs(dm.diff) >= abs(od.diff)) AS BIGINT)
         |    AS n_extreme,
         |  round(floor((2 * (1 + count(*) FILTER (abs(dm.diff) >=
         |    abs(od.diff))) * 1000000 + 65) / 130.0) / 1e6, 6) AS p_value
         |FROM od CROSS JOIN dm
         |GROUP BY od.na, od.nb, od.diff""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("id"), col("event_type").as("t"),
          floor(round(col("value"), 6) * lit(1e6) + 0.5).cast("long")
            .as("micro"))
        .localCheckpoint(eager = false)
      val obs = g.agg(
        sum(when(col("t") === "view", col("micro"))).cast("long").as("sa"),
        count(when(col("t") === "view", 1)).cast("long").as("na"),
        sum(when(col("t") === "click", col("micro"))).cast("long").as("sb"),
        count(when(col("t") === "click", 1)).cast("long").as("nb"))
      val dm = fanout(g)
        .withColumn("b", explode(expr("sequence(1, 64)")))
        .withColumn("side", expr(h28(
          "concat('perm#', CAST(b AS STRING), '#', CAST(id AS STRING))"))
          % 2)
        .groupBy("b")
        .agg(
          sum(when(col("side") === 0, col("micro"))).cast("long").as("sa"),
          count(when(col("side") === 0, 1)).cast("long").as("na"),
          sum(when(col("side") === 1, col("micro"))).cast("long").as("sb"),
          count(when(col("side") === 1, 1)).cast("long").as("nb"))
        .selectExpr("b", "((2 * sa + na) DIV (2 * na)) / 1e6" +
          " - ((2 * sb + nb) DIV (2 * nb)) / 1e6 AS pdiff")
      val od = obs.selectExpr("na", "nb",
        "((2 * sa + na) DIV (2 * na)) / 1e6" +
          " - ((2 * sb + nb) DIV (2 * nb)) / 1e6 AS odiff")
      od.crossJoin(broadcast(dm))
        .groupBy(col("na"), col("nb"), col("odiff"))
        .agg(sum(when(abs(col("pdiff")) >= abs(col("odiff")), 1)
          .otherwise(0)).cast("long").as("n_extreme"))
        .selectExpr("na", "nb", "round(odiff, 6) AS diff_obs", "n_extreme",
          "round(floor((2 * (1 + n_extreme) * 1000000 + 65) / 130.0)" +
            " / 1e6, 6) AS p_value")
    },

    // ROC AUC — Mann-Whitney rank-sum AUC of a score column
    // (order total price) against a binary label (order status =
    // 'F'), ties handled exactly: the model-free "does this signal
    // rank the positives above the negatives" readout a pipeline
    // runs on every candidate quality score before thresholding it
    // (q_rank_calibrate buckets the score into bins; AUC is the
    // bin-free ranking summary). Scale: NO global rank window — the
    // corpus folds to the distinct-score frame in ONE partial-
    // aggregated groupBy, and the "negatives below me" prefix sum
    // runs the q_skyline range-shard discipline: 1-row min/max
    // broadcast → ≤1024 monotone shards → PARTITIONED per-shard
    // prefix window + a triangular join over the ≤1024-row
    // shard-total frame. Determinism: scores land in exact integer
    // cent space; U2 = Σ n_pos_s·(2·cumneg_below + n_neg_s) = 2U
    // accumulates in DECIMAL(38,0) (integer — no rounding anywhere);
    // AUC = U2/(2·n_pos·n_neg) is ONE double division of exact
    // operands, identical in both engines.
    Q("q_auc",
      """WITH g AS (SELECT
        |    CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT) AS s,
        |    CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS np,
        |    CAST(count(*) FILTER (o_orderstatus <> 'F') AS BIGINT) AS nn
        |  FROM orders GROUP BY 1),
        |c AS (SELECT np, nn,
        |    coalesce(sum(nn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM g),
        |t AS (SELECT CAST(sum(np) AS BIGINT) AS tp,
        |    CAST(sum(nn) AS BIGINT) AS tn,
        |    sum(CAST(np AS DECIMAL(38,0)) * (2 * cb + nn)) AS u2
        |  FROM c)
        |SELECT tp AS n_pos, tn AS n_neg,
        |  round(CAST(u2 AS DOUBLE) / (2.0 * tp * tn), 9) AS auc,
        |  round(CAST(u2 AS DOUBLE) / (1.0 * tp * tn) - 1, 9) AS gini_coef
        |FROM t""".stripMargin) { (s, d) =>
      val g = Tables.orders(s, d)
        .select(
          expr("CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT)")
            .as("s"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("isp"))
        .groupBy("s")
        .agg(sum("isp").cast("long").as("np"),
          (count(lit(1)) - sum("isp")).cast("long").as("nn"))
        .localCheckpoint(eager = false)
      val mm = g.agg(min("s").as("lo"), max("s").as("hi"))
      val sh = g.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("s") - col("lo")).cast("double") /
                ((col("hi") - col("lo")).cast("double") / 1024.0)),
              lit(1023.0)).cast("bigint")))
      val bt = sh.groupBy("bkt").agg(sum("nn").cast("long").as("btot"))
      val pre = bt
        .join(broadcast(bt.select(col("bkt").as("ob"),
          col("btot").as("obt"))), col("ob") < col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obt"), lit(0L)).cast("long").as("preneg"))
      val w = Window.partitionBy("bkt").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = sh.join(broadcast(pre), "bkt")
        .withColumn("cb",
          col("preneg") + coalesce(sum("nn").over(w), lit(0L)))
      c.agg(sum("np").cast("long").as("tp"),
          sum("nn").cast("long").as("tn"),
          sum(col("np").cast(DecimalType(38, 0)) *
            (lit(2) * col("cb") + col("nn"))).as("u2"))
        .selectExpr("tp AS n_pos", "tn AS n_neg",
          "round(CAST(u2 AS DOUBLE) / (2.0 * tp * tn), 9) AS auc",
          "round(CAST(u2 AS DOUBLE) / (1.0 * tp * tn) - 1, 9)" +
            " AS gini_coef")
    },

    // POPULATION STABILITY INDEX — distribution drift of event value
    // between the first and second half of the time range, over 10
    // fixed equal-width bins: PSI = Σ (p−q)·ln(p/q), the
    // industry-standard "did the score/feature distribution move"
    // monitor (q_kl_drift compares token distributions across
    // languages; PSI compares the SAME metric across TIME — the
    // retrain/recalibrate trigger; its (p−q) factor makes it
    // symmetric-positive per bin, unlike KL). Cells are
    // add-one-smoothed so empty bins stay finite and the ln runs on
    // exact BIGINT-ratio operands. Scale: the 1-row time-range and
    // value-range frames broadcast onto the scan; the corpus folds
    // to ≤10×2 cells in ONE partial-aggregated groupBy; everything
    // after is constant-sized (the q_mutual_info shape, PSI total =
    // window over the cell frame). Determinism: bin ids are integer
    // math on identical double operands; per-bin terms round 9dp
    // into a DECIMAL(38,9) windowed sum.
    Q("q_psi",
      """WITH rng AS (SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS t0,
        |    CAST(max(floor(epoch(ts))) AS BIGINT) AS t1,
        |    min(value) AS lo, max(value) AS hi FROM events),
        |b AS (SELECT CASE WHEN 2 * (CAST(floor(epoch(ts)) AS BIGINT) - t0)
        |                       < (t1 - t0) THEN 0 ELSE 1 END AS period,
        |    CASE WHEN hi = lo THEN 0 ELSE least(CAST(floor(
        |      (value - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9) END AS bin
        |  FROM events CROSS JOIN rng),
        |c AS (SELECT bin,
        |    CAST(count(*) FILTER (period = 0) AS BIGINT) + 1 AS cp,
        |    CAST(count(*) FILTER (period = 1) AS BIGINT) + 1 AS cq
        |  FROM b GROUP BY bin),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
        |             CAST(sum(cq) AS BIGINT) AS nq FROM c),
        |term AS (SELECT bin, cp - 1 AS n_ref, cq - 1 AS n_cur,
        |    round((CAST(cp AS DOUBLE) / np - CAST(cq AS DOUBLE) / nq)
        |      * ln((CAST(cp AS DOUBLE) * nq) / (CAST(cq AS DOUBLE) * np)),
        |      9) AS psi_term
        |  FROM c CROSS JOIN t)
        |SELECT bin, n_ref, n_cur, psi_term,
        |  round(CAST(sum(CAST(psi_term AS DECIMAL(38,9))) OVER ()
        |        AS DOUBLE), 9) AS psi_total
        |FROM term ORDER BY bin""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      // Spark's unix_timestamp FLOORS sub-second timestamps; the
      // oracle's floor(epoch(ts)) states the same integer (the
      // q_ohlc_resample key discipline).
      val rng = ev.agg(
        min(expr("unix_timestamp(ts)")).as("t0"),
        max(expr("unix_timestamp(ts)")).as("t1"),
        min("value").as("lo"), max("value").as("hi"))
      val c = ev.crossJoin(broadcast(rng))
        .selectExpr(
          "CASE WHEN 2 * (unix_timestamp(ts) - t0)" +
            " < (t1 - t0) THEN 0 ELSE 1 END AS period",
          "CASE WHEN hi = lo THEN 0 ELSE least(CAST(floor(" +
            "(value - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9) END AS bin")
        .groupBy("bin")
        .agg((sum(when(col("period") === 0, 1L).otherwise(0L)) + 1)
          .cast("long").as("cp"),
          (sum(when(col("period") === 1, 1L).otherwise(0L)) + 1)
            .cast("long").as("cq"))
        .localCheckpoint(eager = false)
      val t = c.agg(sum("cp").cast("long").as("np"),
        sum("cq").cast("long").as("nq"))
      c.crossJoin(broadcast(t))
        .selectExpr("bin", "cp - 1 AS n_ref", "cq - 1 AS n_cur",
          "round((CAST(cp AS DOUBLE) / np - CAST(cq AS DOUBLE) / nq)" +
            " * ln((CAST(cp AS DOUBLE) * nq) / (CAST(cq AS DOUBLE) * np))" +
            ", 9) AS psi_term")
        .selectExpr("bin", "n_ref", "n_cur", "psi_term",
          "round(CAST(sum(CAST(psi_term AS DECIMAL(38,9))) OVER ()" +
            " AS DOUBLE), 9) AS psi_total")
        .orderBy("bin")
    },

    // TWO-SAMPLE KOLMOGOROV-SMIRNOV — D = sup |F_view − F_click|
    // over the event-value empirical CDFs, with the value where the
    // supremum is attained and the asymptotic p ≈ 2·exp(−2·ne·D²):
    // the WHOLE-DISTRIBUTION member of the inference suite (q_abtest
    // compares MEANS, q_permutation_test breaks labels on the mean,
    // q_psi bins drift into 10 cells; KS is bin-free and sensitive
    // to ANY shape difference — the "same metric, different arms,
    // did the whole distribution move" readout). Scale: NO global
    // rank window — the corpus folds to the distinct-value frame in
    // ONE partial-aggregated groupBy holding BOTH arms' counts, and
    // the inclusive prefix sums run the q_skyline/q_auc range-shard
    // discipline (1-row min/max broadcast → ≤1024 monotone shards →
    // PARTITIONED per-shard window + triangular join over the
    // ≤1024-row shard-total frame); the argmax is a
    // TakeOrderedAndProject over (dnum DESC, s). Determinism: values
    // land in exact integer micro space; dnum = |ca·nb − cb·na|
    // accumulates in DECIMAL(38,0) (a BIGINT product overflows once
    // n² passes 2⁶³ — reachable at 100 TB); D is ONE double division
    // of exact operands rounded 9dp; the exp argument is rounded 9dp
    // BEFORE exp (the ln-operand discipline) so the only libm call
    // runs on an identical operand in both engines, and p rounds to
    // 6dp to absorb its ulp.
    Q("q_ks_test",
      """WITH e AS (SELECT
        |    CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS isa
        |  FROM events WHERE event_type IN ('view', 'click')),
        |g AS (SELECT s, CAST(sum(isa) AS BIGINT) AS na,
        |    CAST(count(*) - sum(isa) AS BIGINT) AS nb FROM e GROUP BY s),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |    CAST(sum(nb) AS BIGINT) AS tb FROM g),
        |c AS (SELECT s, ta, tb,
        |    sum(na) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    sum(nb) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
        |  FROM g CROSS JOIN t),
        |d AS (SELECT s, ta, tb,
        |    abs(CAST(ca AS DECIMAL(38,0)) * tb
        |        - CAST(cb AS DECIMAL(38,0)) * ta) AS dnum FROM c)
        |SELECT round(CAST(s AS DOUBLE) / 1000000, 6) AS ks_value,
        |  ta AS n_a, tb AS n_b,
        |  round(CAST(dnum AS DOUBLE) / (CAST(ta AS DOUBLE) * tb), 9)
        |    AS d_stat,
        |  round(least(CAST(1 AS DOUBLE), 2 * exp(round(
        |    -2 * (CAST(dnum AS DOUBLE) / (CAST(ta AS DOUBLE) * tb))
        |       * (CAST(dnum AS DOUBLE) / (CAST(ta AS DOUBLE) * tb))
        |       * (CAST(ta AS DOUBLE) * tb / (ta + tb)), 9))), 6)
        |    AS p_asymp
        |FROM d ORDER BY dnum DESC, s LIMIT 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .select(
          expr("CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT)")
            .as("s"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("isa"))
      val g = e.groupBy("s")
        .agg(sum("isa").cast("long").as("na"),
          (count(lit(1)) - sum("isa")).cast("long").as("nb"))
        .localCheckpoint(eager = false)
      val t = g.agg(sum("na").cast("long").as("ta"),
        sum("nb").cast("long").as("tb"))
      val mm = g.agg(min("s").as("lo"), max("s").as("hi"))
      val sh = g.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("s") - col("lo")).cast("double") /
                ((col("hi") - col("lo")).cast("double") / 1024.0)),
              lit(1023.0)).cast("bigint")))
      val bt = sh.groupBy("bkt")
        .agg(sum("na").cast("long").as("bta"),
          sum("nb").cast("long").as("btb"))
      val pre = bt
        .join(broadcast(bt.select(col("bkt").as("ob"),
          col("bta").as("obta"), col("btb").as("obtb"))),
          col("ob") < col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obta"), lit(0L)).cast("long").as("prea"),
          coalesce(sum("obtb"), lit(0L)).cast("long").as("preb"))
      val w = Window.partitionBy("bkt").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
      val c = sh.join(broadcast(pre), "bkt")
        .withColumn("ca", col("prea") + sum("na").over(w))
        .withColumn("cb", col("preb") + sum("nb").over(w))
      c.crossJoin(broadcast(t))
        .withColumn("dnum",
          abs(col("ca").cast(DecimalType(38, 0)) * col("tb") -
            col("cb").cast(DecimalType(38, 0)) * col("ta")))
        .orderBy(col("dnum").desc, col("s")).limit(1)
        .selectExpr(
          "round(CAST(s AS DOUBLE) / 1000000, 6) AS ks_value",
          "ta AS n_a", "tb AS n_b",
          "round(CAST(dnum AS DOUBLE) / (CAST(ta AS DOUBLE) * tb), 9)" +
            " AS d_stat",
          "round(least(CAST(1 AS DOUBLE), 2 * exp(round(" +
            "-2 * (CAST(dnum AS DOUBLE) / (CAST(ta AS DOUBLE) * tb))" +
            " * (CAST(dnum AS DOUBLE) / (CAST(ta AS DOUBLE) * tb))" +
            " * (CAST(ta AS DOUBLE) * tb / (ta + tb)), 9))), 6)" +
            " AS p_asymp")
    },

    // INFORMATION-GAIN STUMP — the best single split of order total
    // price against the binary label status='F': the threshold s*
    // maximizing IG = H(label) − (n_l/N)·H(left) − (n_r/N)·H(right)
    // over EVERY distinct value — the depth-1 decision tree, i.e.
    // the model-backed feature-importance probe (q_auc scores the
    // RANKING quality of a signal; this finds the operating POINT
    // and says how many bits the single best cut buys — the screen
    // run per candidate feature before any tree/threshold ships).
    // Scale: the q_auc fold + range-shard discipline verbatim —
    // distinct-value frame in ONE partial-aggregated groupBy,
    // INCLUSIVE prefix counts via ≤1024 monotone shards (partitioned
    // windows + the triangular shard-total broadcast join), argmax
    // by TakeOrderedAndProject on (ig DESC, s). Determinism: counts
    // are exact BIGINT; each x·ln(x) term runs on exact-ratio
    // operands and rounds 9dp (the ln-operand discipline); the IG
    // combination is the same ANSI text in both engines, rounded
    // 9dp, ties broken by the exact integer s.
    Q("q_info_gain", {
      def pl(c: String, n: String) =
        s"CASE WHEN $c = 0 THEN CAST(0 AS DOUBLE) ELSE " +
          s"round((CAST($c AS DOUBLE) / $n) * ln(CAST($c AS DOUBLE) / $n), 9) END"
      val h0 = s"-(${pl("tp", "(tp + tn)")} + ${pl("tn", "(tp + tn)")})"
      val hl = s"-(${pl("ca", "(ca + cb)")} + ${pl("cb", "(ca + cb)")})"
      val hr = s"-(${pl("(tp - ca)", "(tp + tn - ca - cb)")}" +
        s" + ${pl("(tn - cb)", "(tp + tn - ca - cb)")})"
      s"""WITH g AS (SELECT
         |    CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT) AS s,
         |    CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS np,
         |    CAST(count(*) FILTER (o_orderstatus <> 'F') AS BIGINT) AS nn
         |  FROM orders GROUP BY 1),
         |t AS (SELECT CAST(sum(np) AS BIGINT) AS tp,
         |    CAST(sum(nn) AS BIGINT) AS tn FROM g),
         |c AS (SELECT s, tp, tn,
         |    sum(np) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS ca,
         |    sum(nn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS cb
         |  FROM g CROSS JOIN t),
         |i AS (SELECT s, tp, tn, ca, cb,
         |    round($h0 - (CAST(ca + cb AS DOUBLE) / (tp + tn)) * ($hl)
         |      - (CAST(tp + tn - ca - cb AS DOUBLE) / (tp + tn)) * ($hr),
         |      9) AS ig
         |  FROM c WHERE ca + cb < tp + tn)
         |SELECT round(CAST(s AS DOUBLE) / 100, 6) AS split_value,
         |  CAST(ca + cb AS BIGINT) AS n_left,
         |  CAST(tp + tn - ca - cb AS BIGINT) AS n_right,
         |  CAST(ca AS BIGINT) AS pos_left,
         |  CAST(tp - ca AS BIGINT) AS pos_right,
         |  round($h0, 9) AS entropy_before, ig AS info_gain
         |FROM i ORDER BY ig DESC, s LIMIT 1""".stripMargin
    }) { (s, d) =>
      def pl(c: String, n: String) =
        s"CASE WHEN $c = 0 THEN CAST(0 AS DOUBLE) ELSE " +
          s"round((CAST($c AS DOUBLE) / $n) * ln(CAST($c AS DOUBLE) / $n), 9) END"
      val h0 = s"-(${pl("tp", "(tp + tn)")} + ${pl("tn", "(tp + tn)")})"
      val hl = s"-(${pl("ca", "(ca + cb)")} + ${pl("cb", "(ca + cb)")})"
      val hr = s"-(${pl("(tp - ca)", "(tp + tn - ca - cb)")}" +
        s" + ${pl("(tn - cb)", "(tp + tn - ca - cb)")})"
      val g = Tables.orders(s, d)
        .select(
          expr("CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT)")
            .as("s"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("isp"))
        .groupBy("s")
        .agg(sum("isp").cast("long").as("np"),
          (count(lit(1)) - sum("isp")).cast("long").as("nn"))
        .localCheckpoint(eager = false)
      val t = g.agg(sum("np").cast("long").as("tp"),
        sum("nn").cast("long").as("tn"))
      val mm = g.agg(min("s").as("lo"), max("s").as("hi"))
      val sh = g.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("s") - col("lo")).cast("double") /
                ((col("hi") - col("lo")).cast("double") / 1024.0)),
              lit(1023.0)).cast("bigint")))
      val bt = sh.groupBy("bkt")
        .agg(sum("np").cast("long").as("btp"),
          sum("nn").cast("long").as("btn"))
      val pre = bt
        .join(broadcast(bt.select(col("bkt").as("ob"),
          col("btp").as("obtp"), col("btn").as("obtn"))),
          col("ob") < col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obtp"), lit(0L)).cast("long").as("prep"),
          coalesce(sum("obtn"), lit(0L)).cast("long").as("pren"))
      val w = Window.partitionBy("bkt").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
      val c = sh.join(broadcast(pre), "bkt")
        .withColumn("ca", col("prep") + sum("np").over(w))
        .withColumn("cb", col("pren") + sum("nn").over(w))
        .crossJoin(broadcast(t))
        .filter(col("ca") + col("cb") < col("tp") + col("tn"))
      c.selectExpr("s", "tp", "tn", "ca", "cb",
          s"round($h0 - (CAST(ca + cb AS DOUBLE) / (tp + tn)) * ($hl)" +
            s" - (CAST(tp + tn - ca - cb AS DOUBLE) / (tp + tn)) * ($hr)" +
            ", 9) AS ig")
        .orderBy(col("ig").desc, col("s")).limit(1)
        .selectExpr("round(CAST(s AS DOUBLE) / 100, 6) AS split_value",
          "ca + cb AS n_left", "tp + tn - ca - cb AS n_right",
          "ca AS pos_left", "tp - ca AS pos_right",
          s"round($h0, 9) AS entropy_before", "ig AS info_gain")
    },

    // POWER ANALYSIS — per-event-type A/B sample size at 80% power /
    // 5% two-sided α for detecting a 5%-of-mean lift: n/arm =
    // 2σ²(z_{α/2}+z_β)²/δ² — the experiment-DESIGN companion to the
    // readout suite (q_abtest judges a finished experiment;
    // q_permutation_test re-judges it distribution-free; THIS says
    // how long to run the NEXT one, from the same moments). Scale:
    // ONE partial-aggregated groupBy folds the corpus to per-type
    // (n, Σy, Σy²) — the q_abtest moment fold verbatim, no second
    // pass. Determinism: moments via dsum (6dp per-row rounds into
    // DECIMAL); the mean re-rounds in exact integer micro space
    // (mean-rounding caveat); n_required = ceil(round(x, 6)) — the
    // 6dp round pins the only engine-divergent operand before the
    // integer boundary; z constants pinned via CAST(.. AS DOUBLE)
    // (the decimal-literal hazard).
    Q("q_power_analysis", {
      val z2 = "(CAST(2.801585 AS DOUBLE) * CAST(2.801585 AS DOUBLE))"
      s"""WITH e AS (SELECT event_type, round(value, 6) AS y FROM events),
         |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    ${dsumSql("y")} AS s,
         |    ${dsumSql("round(y * y, 6)")} AS q
         |  FROM e GROUP BY event_type)
         |SELECT event_type, n,
         |  CAST(floor((2 * CAST(round(s * 1000000) AS BIGINT) + n)
         |    / (2.0 * n)) / 1000000.0 AS DOUBLE) AS mean,
         |  round((q - s * s / n) / (n - 1), 6) AS variance,
         |  round((s / n) * CAST(0.05 AS DOUBLE), 6) AS mde,
         |  CAST(ceil(round(2 * ((q - s * s / n) / (n - 1)) * $z2
         |    / (((s / n) * CAST(0.05 AS DOUBLE))
         |       * ((s / n) * CAST(0.05 AS DOUBLE))), 6)) AS BIGINT)
         |    AS n_required
         |FROM m WHERE n >= 2
         |ORDER BY event_type""".stripMargin
    }) { (s, d) =>
      val z2 = "(CAST(2.801585 AS DOUBLE) * CAST(2.801585 AS DOUBLE))"
      val e = Tables.events(s, d)
        .select(col("event_type"), round(col("value"), 6).as("y"))
      val m = e.groupBy("event_type").agg(
        count(lit(1)).cast("long").as("n"),
        dsum(col("y")).as("s"),
        dsum(round(col("y") * col("y"), 6)).as("q"))
        .filter(col("n") >= 2)
      m.selectExpr("event_type", "n",
          "CAST(floor((2 * CAST(round(s * 1000000) AS BIGINT) + n)" +
            " / (2.0 * n)) / 1000000.0 AS DOUBLE) AS mean",
          "round((q - s * s / n) / (n - 1), 6) AS variance",
          "round((s / n) * CAST(0.05 AS DOUBLE), 6) AS mde",
          s"CAST(ceil(round(2 * ((q - s * s / n) / (n - 1)) * $z2" +
            " / (((s / n) * CAST(0.05 AS DOUBLE))" +
            " * ((s / n) * CAST(0.05 AS DOUBLE))), 6)) AS BIGINT)" +
            " AS n_required")
        .orderBy("event_type")
    },

    // SPLIT-CONFORMAL INTERVAL — distribution-free prediction
    // intervals for event value under the per-type-mean predictor:
    // hash-split train/calibration, q̂ = the ⌈0.9(n+1)⌉-th smallest
    // calibration residual per type — the FINITE-SAMPLE ≥90%
    // coverage guarantee with NO normality assumption (q_abtest's ±z
    // bands assume the CLT; conformal is the wrapper that makes ANY
    // point predictor an interval predictor — the modern ML-serving
    // calibration layer). Scale: the train-fold mean folds in ONE
    // partial-aggregated groupBy and BROADCASTS back (type-sized);
    // residuals are scan-local EXACT INTEGER micros; the k-th order
    // statistic runs on the distinct-(type, residual) frame via a
    // type-partitioned cumulative window (per-type range-sharding is
    // the 100 TB refinement — the frame is distinct-residual-sized,
    // not corpus-sized). Determinism: the fold membership is the
    // q_split_assign salted hash (never rand()); residuals and k are
    // exact integers; the only doubles are final display divisions.
    Q("q_conformal_interval",
      s"""WITH e AS (SELECT event_type,
         |    CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT) AS ym,
         |    ${h28Duck("'cf#' || event_id::VARCHAR")} % 2 = 0 AS tr
         |  FROM events),
         |yh AS (SELECT event_type,
         |    CAST(floor((2 * sum(ym) + count(*)) / (2.0 * count(*)))
         |      AS BIGINT) AS yhat_micro,
         |    CAST(count(*) AS BIGINT) AS n_train
         |  FROM e WHERE tr GROUP BY event_type),
         |cal AS (SELECT e.event_type, abs(ym - yhat_micro) AS r
         |  FROM e JOIN yh USING (event_type) WHERE NOT tr),
         |nc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
         |  FROM cal GROUP BY event_type),
         |g AS (SELECT event_type, r, CAST(count(*) AS BIGINT) AS c
         |  FROM cal GROUP BY event_type, r),
         |cum AS (SELECT event_type, r,
         |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY r
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cc
         |  FROM g),
         |k AS (SELECT event_type, n_cal,
         |    CAST(floor((9 * (n_cal + 1) + 9) / 10.0) AS BIGINT) AS kk
         |  FROM nc),
         |pick AS (SELECT event_type, CAST(min(r) AS BIGINT) AS q_micro
         |  FROM cum JOIN k USING (event_type) WHERE cc >= kk
         |  GROUP BY event_type),
         |cov AS (SELECT cal.event_type,
         |    CAST(count(*) FILTER (r <= q_micro) AS BIGINT) AS n_in
         |  FROM cal JOIN pick USING (event_type) GROUP BY cal.event_type)
         |SELECT event_type, n_train, n_cal, kk AS q_index,
         |  round(CAST(yhat_micro AS DOUBLE) / 1000000, 6) AS yhat,
         |  round(CAST(q_micro AS DOUBLE) / 1000000, 6) AS q_resid,
         |  round(CAST(n_in AS DOUBLE) / n_cal, 9) AS coverage
         |FROM yh JOIN k USING (event_type) JOIN pick USING (event_type)
         |  JOIN cov USING (event_type)
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT)")
            .as("ym"),
          (expr(h28("concat('cf#', CAST(event_id AS STRING))")) % 2 === 0)
            .as("tr"))
        .localCheckpoint(eager = false)
      val yh = e.filter(col("tr")).groupBy("event_type")
        .agg(floor((sum("ym") * 2 + count(lit(1))) /
            (count(lit(1)).cast("double") * 2)).cast("long")
            .as("yhat_micro"),
          count(lit(1)).cast("long").as("n_train"))
      val cal = e.filter(!col("tr"))
        .join(broadcast(yh), "event_type")
        .select(col("event_type"),
          abs(col("ym") - col("yhat_micro")).as("r"))
        .localCheckpoint(eager = false)
      val nc = cal.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_cal"))
      val g = cal.groupBy("event_type", "r")
        .agg(count(lit(1)).cast("long").as("c"))
      val w = Window.partitionBy("event_type").orderBy("r")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g.withColumn("cc", sum("c").over(w).cast("long"))
      val k = nc.withColumn("kk",
        floor((lit(9) * (col("n_cal") + 1) + 9) / lit(10.0)).cast("long"))
      val pick = cum.join(broadcast(k), "event_type")
        .filter(col("cc") >= col("kk"))
        .groupBy("event_type").agg(min("r").cast("long").as("q_micro"))
      val cov = cal.join(broadcast(pick), "event_type")
        .groupBy("event_type")
        .agg(sum(when(col("r") <= col("q_micro"), 1L).otherwise(0L))
          .cast("long").as("n_in"))
      yh.join(broadcast(k), "event_type")
        .join(broadcast(pick), "event_type")
        .join(broadcast(cov), "event_type")
        .selectExpr("event_type", "n_train", "n_cal", "kk AS q_index",
          "round(CAST(yhat_micro AS DOUBLE) / 1000000, 6) AS yhat",
          "round(CAST(q_micro AS DOUBLE) / 1000000, 6) AS q_resid",
          "round(CAST(n_in AS DOUBLE) / n_cal, 9) AS coverage")
        .orderBy("event_type")
    },

    // CUMULATIVE GAINS / LIFT TABLE — orders ranked by total price
    // (descending) cut into 10 equal-frequency deciles, with each
    // decile's positives (status='F'), cumulative gain = share of
    // all positives captured so far, and lift vs the base rate —
    // the "how deep must the campaign dig" operating table (q_auc
    // is the bin-free ranking summary; q_rank_calibrate checks
    // score-vs-rate monotonicity; the gains table is what the
    // CAMPAIGN OWNER reads: top-20% of scores captures X% of
    // positives). Scale: the q_auc fold + range-shard discipline —
    // distinct-score frame, EXCLUSIVE prefix counts via ≤1024
    // monotone shards, decile = integer math on the descending
    // prefix; the decile rollup and its cumulative window run on
    // the ≤10-row frame. Determinism: all counts exact BIGINT;
    // gain/lift are divisions of exact operands rounded 9/6dp;
    // ties share a score and therefore a decile by construction.
    Q("q_gains_curve",
      """WITH g AS (SELECT
        |    CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT) AS s,
        |    CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS np,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(np) AS BIGINT) AS tp FROM g),
        |p AS (SELECT s, np, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pd
        |  FROM g),
        |dd AS (SELECT least(CAST(9 AS BIGINT),
        |      CAST(floor(CAST(10 AS DOUBLE) * pd / n) AS BIGINT)) AS decile,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(sum(np) AS BIGINT) AS n_pos
        |  FROM p CROSS JOIN t GROUP BY 1),
        |cum AS (SELECT decile, n_rows, n_pos,
        |    CAST(sum(n_rows) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_rows,
        |    CAST(sum(n_pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_pos
        |  FROM dd)
        |SELECT decile, n_rows, n_pos, cum_rows, cum_pos,
        |  round(CAST(cum_pos AS DOUBLE) / tp, 9) AS gain,
        |  round((CAST(cum_pos AS DOUBLE) / cum_rows)
        |    / (CAST(tp AS DOUBLE) / n), 6) AS lift
        |FROM cum CROSS JOIN t ORDER BY decile""".stripMargin) { (s, d) =>
      val g = Tables.orders(s, d)
        .select(
          expr("CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT)")
            .as("s"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("isp"))
        .groupBy("s")
        .agg(sum("isp").cast("long").as("np"),
          count(lit(1)).cast("long").as("c"))
        .localCheckpoint(eager = false)
      val t = g.agg(sum("c").cast("long").as("n"),
        sum("np").cast("long").as("tp"))
      val mm = g.agg(min("s").as("lo"), max("s").as("hi"))
      val sh = g.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("s") - col("lo")).cast("double") /
                ((col("hi") - col("lo")).cast("double") / 1024.0)),
              lit(1023.0)).cast("bigint")))
      val bt = sh.groupBy("bkt").agg(sum("c").cast("long").as("btc"))
      // descending prefix: rows in HIGHER buckets, plus higher
      // scores within the bucket
      val pre = bt
        .join(broadcast(bt.select(col("bkt").as("ob"),
          col("btc").as("obc"))), col("ob") > col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obc"), lit(0L)).cast("long").as("prec"))
      val w = Window.partitionBy("bkt").orderBy(col("s").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val p = sh.join(broadcast(pre), "bkt")
        .withColumn("pd",
          col("prec") + coalesce(sum("c").over(w), lit(0L)))
      val dd = p.crossJoin(broadcast(t))
        .withColumn("decile", least(lit(9L),
          floor(lit(10.0) * col("pd") / col("n")).cast("long")))
        .groupBy("decile")
        .agg(sum("c").cast("long").as("n_rows"),
          sum("np").cast("long").as("n_pos"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      dd.withColumn("cum_rows", sum("n_rows").over(wc).cast("long"))
        .withColumn("cum_pos", sum("n_pos").over(wc).cast("long"))
        .crossJoin(broadcast(t))
        .selectExpr("decile", "n_rows", "n_pos", "cum_rows", "cum_pos",
          "round(CAST(cum_pos AS DOUBLE) / tp, 9) AS gain",
          "round((CAST(cum_pos AS DOUBLE) / cum_rows)" +
            " / (CAST(tp AS DOUBLE) / n), 6) AS lift")
        .orderBy("decile")
    },

    // EMPIRICAL-BAYES SHRINKAGE — Beta-Binomial shrinkage of
    // per-part return rates (lineitem returnflag='R'): method-of-
    // moments prior (α, β) from the rate distribution itself, then
    // every part's rate shrinks toward the prior mean by its OWN
    // sample size: shrunk = (x + α)/(n + α + β) — THE fix for
    // "ranking by raw rate puts n=1 parts first" (q_target_encoding
    // shrinks nothing and leaks small cells to their own mean;
    // q_winsorize clips values; EB is the principled small-sample
    // partial-pooling every rate leaderboard needs). Top-20 by
    // shrunken rate. Scale: the corpus folds to the part-sized
    // (n, x) frame in ONE partial-aggregated groupBy; the prior
    // moments RE-AGGREGATE that frame (no second scan) and
    // BROADCAST back; top-20 = TakeOrderedAndProject. Determinism:
    // counts exact; per-part rate terms round 9dp into DECIMAL
    // sums; the (m, v, K) prior chain and the shrunk rate are
    // shared ANSI text on identical operands, rounded 6dp for
    // display with (rate, partkey) total order.
    Q("q_eb_shrinkage", {
      val m = "(CAST(sr AS DOUBLE) / np)"
      val v = "(CAST(sq AS DOUBLE) / np - " + m + " * " + m + ")"
      val kk = s"($m * (1 - $m) / $v - 1)"
      s"""WITH g AS (SELECT l_partkey AS part,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (l_returnflag = 'R') AS BIGINT) AS x
         |  FROM lineitem GROUP BY 1),
         |r AS (SELECT part, n, x,
         |    round(CAST(x AS DOUBLE) / n, 9) AS rate FROM g),
         |pri AS (SELECT CAST(count(*) AS BIGINT) AS np,
         |    CAST(sum(CAST(rate AS DECIMAL(38,9))) AS DOUBLE) AS sr,
         |    CAST(sum(CAST(round(rate * rate, 9) AS DECIMAL(38,9)))
         |      AS DOUBLE) AS sq
         |  FROM r)
         |SELECT part, n, x, rate,
         |  round($m, 6) AS prior_mean,
         |  round($kk, 6) AS prior_strength,
         |  round((x + $kk * $m) / (n + $kk), 6) AS shrunk_rate
         |FROM r CROSS JOIN pri
         |ORDER BY round((x + $kk * $m) / (n + $kk), 6) DESC, part
         |LIMIT 20""".stripMargin
    }) { (s, d) =>
      val m = "(CAST(sr AS DOUBLE) / np)"
      val v = "(CAST(sq AS DOUBLE) / np - " + m + " * " + m + ")"
      val kk = s"($m * (1 - $m) / $v - 1)"
      val g = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("part"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .cast("long").as("x"))
      val r = g.withColumn("rate",
          round(col("x").cast("double") / col("n"), 9))
        .localCheckpoint(eager = false)
      val pri = r.agg(count(lit(1)).cast("long").as("np"),
        sum(col("rate").cast(DecimalType(38, 9))).cast("double").as("sr"),
        sum(round(col("rate") * col("rate"), 9).cast(DecimalType(38, 9)))
          .cast("double").as("sq"))
      r.crossJoin(broadcast(pri))
        .selectExpr("part", "n", "x", "rate",
          s"round($m, 6) AS prior_mean",
          s"round($kk, 6) AS prior_strength",
          s"round((x + $kk * $m) / (n + $kk), 6) AS shrunk_rate")
        .orderBy(col("shrunk_rate").desc, col("part"))
        .limit(20)
    },

    // STRATIFIED TREATMENT EFFECT — Neyman stratified estimation of
    // the click-vs-view value difference, stratified by USER
    // ACTIVITY (4 equal-width buckets of per-user event counts):
    // per-stratum difference-in-means, then the pooled ATE =
    // Σ wₛ·diffₛ with its stratified standard error — the
    // OBSERVATIONAL-data companion to q_abtest (randomized arms can
    // compare raw means; logged data can't — heavy users both click
    // more AND spend differently, and stratification removes
    // exactly that confounder before averaging; this is the
    // workhorse adjustment under every "causal" product dashboard).
    // Scale: the user-activity frame folds in ONE partial-aggregated
    // groupBy (user-sized) and joins back — BROADCAST at fixture
    // scale, a user-key co-partitioned shuffle join at 100 TB; the
    // per-stratum moment fold is the q_abtest discipline (one
    // conditional-aggregate pass); pooled terms are windows over
    // the ≤4-row cell frame. Determinism: dsum moments, micro-int
    // means, per-term 9dp rounds into DECIMAL window sums, shared
    // ANSI text everywhere.
    Q("q_ate_strata", {
      val meanT = "CAST(floor((2 * CAST(round(st * 1000000) AS BIGINT)" +
        " + nt) / (2.0 * nt)) / 1000000.0 AS DOUBLE)"
      val meanC = "CAST(floor((2 * CAST(round(sc * 1000000) AS BIGINT)" +
        " + nc) / (2.0 * nc)) / 1000000.0 AS DOUBLE)"
      val vT = "((qt - st * st / nt) / (nt - 1))"
      val vC = "((qc - sc * sc / nc) / (nc - 1))"
      s"""WITH act AS (SELECT user_id, CAST(count(*) AS BIGINT) AS a
         |  FROM events GROUP BY user_id),
         |mm AS (SELECT CAST(min(a) AS BIGINT) AS lo,
         |    CAST(max(a) AS BIGINT) AS hi FROM act),
         |st AS (SELECT user_id, least(CAST(3 AS BIGINT),
         |    CAST(floor(CAST(4 AS DOUBLE) * (a - lo) / (hi - lo + 1))
         |      AS BIGINT)) AS stratum
         |  FROM act CROSS JOIN mm),
         |e AS (SELECT stratum,
         |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS tr,
         |    round(value, 6) AS y
         |  FROM events JOIN st USING (user_id)
         |  WHERE event_type IN ('view', 'click')),
         |cell AS (SELECT stratum,
         |    CAST(count(*) FILTER (tr = 1) AS BIGINT) AS nt,
         |    CAST(count(*) FILTER (tr = 0) AS BIGINT) AS nc,
         |    ${dsumSql("CASE WHEN tr = 1 THEN y END")} AS st,
         |    ${dsumSql("CASE WHEN tr = 0 THEN y END")} AS sc,
         |    ${dsumSql("CASE WHEN tr = 1 THEN round(y * y, 6) END")} AS qt,
         |    ${dsumSql("CASE WHEN tr = 0 THEN round(y * y, 6) END")} AS qc
         |  FROM e GROUP BY stratum),
         |k AS (SELECT stratum, nt, nc,
         |    $meanT AS mean_t, $meanC AS mean_c,
         |    round($meanT - $meanC, 6) AS diff,
         |    round(CAST(nt + nc AS DOUBLE)
         |      * ($meanT - $meanC), 9) AS wdiff,
         |    round(CAST(nt + nc AS DOUBLE) * (nt + nc)
         |      * ($vT / nt + $vC / nc), 9) AS wvar
         |  FROM cell WHERE nt >= 2 AND nc >= 2),
         |tot AS (SELECT CAST(sum(nt + nc) AS BIGINT) AS n FROM k)
         |SELECT stratum, nt, nc, mean_t, mean_c, diff,
         |  round(CAST(sum(CAST(wdiff AS DECIMAL(38,9))) OVER ()
         |    AS DOUBLE) / n, 6) AS ate,
         |  round(sqrt(CAST(sum(CAST(wvar AS DECIMAL(38,9))) OVER ()
         |    AS DOUBLE)) / n, 6) AS se
         |FROM k CROSS JOIN tot ORDER BY stratum""".stripMargin
    }) { (s, d) =>
      val meanT = "CAST(floor((2 * CAST(round(st * 1000000) AS BIGINT)" +
        " + nt) / (2.0 * nt)) / 1000000.0 AS DOUBLE)"
      val meanC = "CAST(floor((2 * CAST(round(sc * 1000000) AS BIGINT)" +
        " + nc) / (2.0 * nc)) / 1000000.0 AS DOUBLE)"
      val vT = "((qt - st * st / nt) / (nt - 1))"
      val vC = "((qc - sc * sc / nc) / (nc - 1))"
      val act = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("a"))
      val mm = act.agg(min("a").cast("long").as("lo"),
        max("a").cast("long").as("hi"))
      val strata = act.crossJoin(broadcast(mm))
        .selectExpr("user_id", "least(CAST(3 AS BIGINT)," +
          " CAST(floor(CAST(4 AS DOUBLE) * (a - lo) / (hi - lo + 1))" +
          " AS BIGINT)) AS stratum")
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .join(broadcast(strata), "user_id")
        .select(col("stratum"),
          when(col("event_type") === "click", 1).otherwise(0).as("tr"),
          round(col("value"), 6).as("y"))
      val cell = e.groupBy("stratum").agg(
        sum(when(col("tr") === 1, 1L).otherwise(0L)).cast("long").as("nt"),
        sum(when(col("tr") === 0, 1L).otherwise(0L)).cast("long").as("nc"),
        dsum(when(col("tr") === 1, col("y"))).as("st"),
        dsum(when(col("tr") === 0, col("y"))).as("sc"),
        dsum(when(col("tr") === 1, round(col("y") * col("y"), 6)))
          .as("qt"),
        dsum(when(col("tr") === 0, round(col("y") * col("y"), 6)))
          .as("qc"))
      val k = cell.filter(col("nt") >= 2 && col("nc") >= 2)
        .selectExpr("stratum", "nt", "nc",
          s"$meanT AS mean_t", s"$meanC AS mean_c",
          s"round($meanT - $meanC, 6) AS diff",
          s"round(CAST(nt + nc AS DOUBLE) * ($meanT - $meanC), 9)" +
            " AS wdiff",
          s"round(CAST(nt + nc AS DOUBLE) * (nt + nc)" +
            s" * ($vT / nt + $vC / nc), 9) AS wvar")
        .localCheckpoint(eager = false)
      val tot = k.agg(sum(col("nt") + col("nc")).cast("long").as("n"))
      k.crossJoin(broadcast(tot))
        .selectExpr("stratum", "nt", "nc", "mean_t", "mean_c", "diff",
          "round(CAST(sum(CAST(wdiff AS DECIMAL(38,9))) OVER ()" +
            " AS DOUBLE) / n, 6) AS ate",
          "round(sqrt(CAST(sum(CAST(wvar AS DECIMAL(38,9))) OVER ()" +
            " AS DOUBLE)) / n, 6) AS se")
        .orderBy("stratum")
    },

    // ONE-WAY ANOVA — F-test of event value across the 5 event
    // types: F = (SSB/(k−1)) / (SSW/(N−k)) from per-group moments —
    // the NUMERIC-outcome × CATEGORICAL-factor member of the
    // inference suite (q_chi2_indep tests two categoricals;
    // q_abtest compares exactly TWO arms; ANOVA asks "do ANY of the
    // k groups differ" before any pairwise drill-down — the
    // screening test that controls the k² multiple-comparison
    // explosion). Scale: ONE partial-aggregated conditional-moment
    // groupBy folds the corpus to the ≤k-row group frame (the
    // q_abtest discipline); grand totals re-aggregate THAT frame
    // and broadcast back; SSB/SSW are windowed DECIMAL(38,9) sums
    // of per-group terms rounded 9dp. Determinism: dsum moments;
    // every mean is a division of exact operands; shared ANSI text.
    Q("q_anova",
      s"""WITH m AS (SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n,
         |    ${dsumSql("round(value, 6)")} AS s,
         |    ${dsumSql("round(round(value, 6) * round(value, 6), 6)")} AS q
         |  FROM events GROUP BY event_type),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS stot
         |  FROM m),
         |g AS (SELECT event_type, n, nn, k,
         |    CAST(floor((2 * CAST(round(s * 1000000) AS BIGINT) + n)
         |      / (2.0 * n)) / 1000000.0 AS DOUBLE) AS group_mean,
         |    round(n * ((s / n) - (stot / nn)) * ((s / n) - (stot / nn)),
         |      9) AS ssb_term,
         |    round(q - s * s / n, 9) AS ssw_term
         |  FROM m CROSS JOIN t),
         |w AS (SELECT event_type, n, group_mean, nn, k,
         |    CAST(sum(CAST(ssb_term AS DECIMAL(38,9))) OVER ()
         |      AS DOUBLE) AS ssb,
         |    CAST(sum(CAST(ssw_term AS DECIMAL(38,9))) OVER ()
         |      AS DOUBLE) AS ssw
         |  FROM g)
         |SELECT event_type, n, group_mean,
         |  round(ssb, 6) AS ss_between, round(ssw, 6) AS ss_within,
         |  k - 1 AS df1, nn - k AS df2,
         |  round((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat
         |FROM w ORDER BY event_type""".stripMargin) { (s, d) =>
      val m = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          dsum(round(col("value"), 6)).as("s"),
          dsum(round(round(col("value"), 6) * round(col("value"), 6), 6))
            .as("q"))
        .localCheckpoint(eager = false)
      val t = m.agg(sum("n").cast("long").as("nn"),
        count(lit(1)).cast("long").as("k"),
        sum(col("s").cast(DecimalType(38, 6))).cast("double").as("stot"))
      m.crossJoin(broadcast(t))
        .selectExpr("event_type", "n", "nn", "k",
          "CAST(floor((2 * CAST(round(s * 1000000) AS BIGINT) + n)" +
            " / (2.0 * n)) / 1000000.0 AS DOUBLE) AS group_mean",
          "round(n * ((s / n) - (stot / nn)) * ((s / n) - (stot / nn))" +
            ", 9) AS ssb_term",
          "round(q - s * s / n, 9) AS ssw_term")
        .selectExpr("event_type", "n", "group_mean", "nn", "k",
          "CAST(sum(CAST(ssb_term AS DECIMAL(38,9))) OVER ()" +
            " AS DOUBLE) AS ssb",
          "CAST(sum(CAST(ssw_term AS DECIMAL(38,9))) OVER ()" +
            " AS DOUBLE) AS ssw")
        .selectExpr("event_type", "n", "group_mean",
          "round(ssb, 6) AS ss_between", "round(ssw, 6) AS ss_within",
          "k - 1 AS df1", "nn - k AS df2",
          "round((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat")
        .orderBy("event_type")
    },

    // TUKEY HSD — the post-hoc pairwise drill-down q_anova's omnibus
    // F-test gates: all C(k,2) type-pair mean differences tested
    // against the honestly-significant-difference threshold
    // q·SE(pair), with the studentized-range critical value
    // q(α=.05, k=5, df=∞) = 3.858 — the multiple-comparison-safe
    // answer to "WHICH groups differ" (running C(k,2) Welch t-tests
    // at α=.05 each inflates family error to ~40% at k=5; HSD holds
    // it at 5%). Scale: reuses q_anova's ONE conditional-moment fold
    // (corpus → k-row frame); the pair join, SE, and verdicts run on
    // the C(k,2)-row frame. Determinism: means are exact integer
    // micros (q_anova's half-up form), SSW re-derives from the same
    // rounded 9dp terms into a DECIMAL sum, and each q statistic is
    // a division+sqrt over identical doubles; the significance
    // comparison is double-vs-double on identical operand chains.
    Q("q_tukey_hsd",
      s"""WITH m AS (SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n,
         |    ${dsumSql("round(value, 6)")} AS s,
         |    ${dsumSql("round(round(value, 6) * round(value, 6), 6)")} AS q
         |  FROM events GROUP BY event_type),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(count(*) AS BIGINT) AS k FROM m),
         |g AS (SELECT event_type, n,
         |    CAST(floor((2 * CAST(round(s * 1000000) AS BIGINT) + n)
         |      / (2.0 * n)) AS BIGINT) AS m6,
         |    round(q - s * s / n, 9) AS ssw_term FROM m),
         |w AS (SELECT CAST(sum(CAST(ssw_term AS DECIMAL(38,9)))
         |      AS DOUBLE) AS ssw FROM g),
         |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.n AS n_a, b.n AS n_b, a.m6 AS ma6, b.m6 AS mb6
         |  FROM g a JOIN g b ON a.event_type < b.event_type)
         |SELECT type_a, type_b, n_a, n_b,
         |  round(abs(ma6 - mb6) / CAST(1000000 AS DOUBLE), 6)
         |    AS mean_diff,
         |  round(sqrt((ssw / (nn - k)) / 2
         |    * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 9)
         |    AS se,
         |  round((abs(ma6 - mb6) / CAST(1000000 AS DOUBLE))
         |    / sqrt((ssw / (nn - k)) / 2
         |      * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6)
         |    AS q_stat,
         |  (abs(ma6 - mb6) / CAST(1000000 AS DOUBLE))
         |    / sqrt((ssw / (nn - k)) / 2
         |      * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
         |    > CAST(3.858 AS DOUBLE) AS significant
         |FROM p CROSS JOIN w CROSS JOIN t
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val m = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          dsum(round(col("value"), 6)).as("s"),
          dsum(round(round(col("value"), 6) * round(col("value"), 6), 6))
            .as("q"))
        .localCheckpoint(eager = false)
      val t = m.agg(sum("n").cast("long").as("nn"),
        count(lit(1)).cast("long").as("k"))
      val g = m.selectExpr("event_type", "n",
          "CAST(floor((2 * CAST(round(s * 1000000) AS BIGINT) + n)" +
            " / (2.0 * n)) AS BIGINT) AS m6",
          "round(q - s * s / n, 9) AS ssw_term")
        .localCheckpoint(eager = false)
      val w = g.agg(sum(col("ssw_term").cast(DecimalType(38, 9)))
        .cast("double").as("ssw"))
      val p = g.select(col("event_type").as("type_a"),
          col("n").as("n_a"), col("m6").as("ma6"))
        .join(g.select(col("event_type").as("type_b"),
          col("n").as("n_b"), col("m6").as("mb6")),
          col("type_a") < col("type_b"))
      p.crossJoin(broadcast(w)).crossJoin(broadcast(t))
        .selectExpr("type_a", "type_b", "n_a", "n_b",
          "round(abs(ma6 - mb6) / CAST(1000000 AS DOUBLE), 6)" +
            " AS mean_diff",
          "round(sqrt((ssw / (nn - k)) / 2" +
            " * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 9)" +
            " AS se",
          "round((abs(ma6 - mb6) / CAST(1000000 AS DOUBLE))" +
            " / sqrt((ssw / (nn - k)) / 2" +
            " * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6)" +
            " AS q_stat",
          "(abs(ma6 - mb6) / CAST(1000000 AS DOUBLE))" +
            " / sqrt((ssw / (nn - k)) / 2" +
            " * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))" +
            " > CAST(3.858 AS DOUBLE) AS significant")
        .orderBy("type_a", "type_b")
    },

    // GAUSSIAN MIXTURE (EM, k=2) — three fixed EM sweeps fitting a
    // two-component 1-D normal mixture to the event-value
    // distribution from deterministic quantile inits (μ = p25/p75,
    // σ = overall, π = ½): the SOFT-assignment member of the
    // in-engine training family (q_kmeans: hard Voronoi; NB:
    // supervised counts; ALS: factorization) and the bimodality
    // auditor behind "is this metric one population or two" —
    // mixture weights + separation feed threshold placement where a
    // single mean/σ (q_agg_stats) averages the modes away. Scale:
    // each sweep is ONE scan of the checkpointed value frame with a
    // broadcast 1-row parameter frame — E-step scan-local, M-step a
    // partial-aggregated moment fold (the q_anova discipline);
    // iteration count is fixed, so cost = 3 scans at any corpus
    // size. Determinism: per-row ln/exp run on identical rounded
    // operands and the responsibility rounds 9dp BEFORE the
    // DECIMAL(38,9) moment sums (the q_lm_score libm posture);
    // parameter updates are single divisions/sqrts of those sums
    // rounded 9dp; greatest(σ², 10⁻⁶) floors a collapsing
    // component identically in both engines.
    Q("q_gmm_1d", AnalyticsOracles.gmmSql(3)) { (s, d) =>
      val x = Tables.events(s, d)
        .select(round(col("value"), 6).as("x"))
        .localCheckpoint(eager = false)
      val c0 = x.agg(
          expr("round(percentile(x, CAST(0.25 AS DOUBLE)), 6)").as("mu1"),
          expr("round(percentile(x, CAST(0.75 AS DOUBLE)), 6)").as("mu2"),
          expr(s"CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE)").as("sx"),
          expr("CAST(sum(CAST(round(x * x, 6) AS DECIMAL(38,6)))" +
            " AS DOUBLE)").as("qx"),
          count(lit(1)).cast("long").as("n"))
        .selectExpr("CAST(0.5 AS DOUBLE) AS pi1", "mu1",
          "round(sqrt(qx / n - (sx / n) * (sx / n)), 6) AS sg1", "mu2",
          "round(sqrt(qx / n - (sx / n) * (sx / n)), 6) AS sg2", "n")
      var c = c0.localCheckpoint(eager = false)
      for (_ <- 1 to 3) {
        val r = x.crossJoin(broadcast(c))
          .selectExpr("x",
            "round((ln(1 - pi1) - ln(sg2)" +
              " - (x - mu2) * (x - mu2) / (2 * sg2 * sg2))" +
              " - (ln(pi1) - ln(sg1)" +
              " - (x - mu1) * (x - mu1) / (2 * sg1 * sg1)), 9) AS dl")
          .selectExpr("x",
            "round(CAST(1 AS DOUBLE) / (1 + exp(dl)), 9) AS r")
        val m = r.agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("r").cast(DecimalType(38, 9))).cast("double").as("n1"),
          sum(round(col("r") * col("x"), 9).cast(DecimalType(38, 9)))
            .cast("double").as("s1"),
          sum(round(col("r") * col("x") * col("x"), 9)
            .cast(DecimalType(38, 9))).cast("double").as("q1"),
          sum(round((lit(1) - col("r")) * col("x"), 9)
            .cast(DecimalType(38, 9))).cast("double").as("s2"),
          sum(round((lit(1) - col("r")) * col("x") * col("x"), 9)
            .cast(DecimalType(38, 9))).cast("double").as("q2"))
        c = m.selectExpr(
            "round(n1 / n, 9) AS pi1",
            "round(s1 / n1, 9) AS mu1",
            "round(sqrt(greatest(q1 / n1 - (s1 / n1) * (s1 / n1)," +
              " CAST(0.000001 AS DOUBLE))), 9) AS sg1",
            "round(s2 / (n - n1), 9) AS mu2",
            "round(sqrt(greatest(q2 / (n - n1)" +
              " - (s2 / (n - n1)) * (s2 / (n - n1))," +
              " CAST(0.000001 AS DOUBLE))), 9) AS sg2",
            "n")
          .localCheckpoint(eager = false)
      }
      c.selectExpr(
          """stack(2,
            |  1, round(pi1, 6), round(mu1, 6), round(sg1, 6),
            |  2, round(1 - pi1, 6), round(mu2, 6), round(sg2, 6)
            |) AS (comp, pi, mu, sigma)""".stripMargin, "n")
        .select("comp", "n", "pi", "mu", "sigma")
        .orderBy("comp")
    },

    // NEAREST-NEIGHBOR MATCHING ATT — coarsened 1:1 matching with
    // replacement: every BUILDING-segment customer (treated) matches
    // the control customer with the NEAREST account balance within
    // the SAME nation (exact-match on the coarse confounder, nearest
    // on the continuous one — the standard CEM+NN hybrid), and the
    // per-nation ATT is the mean matched spend difference. The third
    // member of the causal toolkit: q_abtest assumes randomization,
    // q_ate_strata reweights strata, matching compares each treated
    // unit to its own counterfactual twin — the estimator that also
    // EXPOSES overlap failure (n_matched < n_treated ⇒ nations with
    // no controls in support). Scale: the spend outcome folds in one
    // customer-keyed partial aggregate; the nearest control is NOT a
    // pair join but two ignore-nulls running-edge windows (last
    // control before / first control after) over the
    // nation-partitioned balance order — one shuffle on the nation
    // key, volume n end-to-end, matching cost independent of the
    // control-pool size. Determinism: spend in exact integer micros,
    // the prev/next choice compares identical doubles (ties → the
    // earlier control by the (bal, custkey) order), ATT uses the
    // exact-integer half-up mean (nullif guards a control-free
    // nation; |2Σ| < 2⁵³ through ~10⁸ matched pairs/nation at these
    // spend magnitudes).
    Q("q_match_att",
      """WITH cust AS (SELECT c_custkey AS ck, c_nationkey AS nation,
        |    c_mktsegment AS seg, c_acctbal AS bal FROM customer),
        |spend AS (SELECT o_custkey AS ck,
        |    CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT))
        |      AS BIGINT) AS out6
        |  FROM orders GROUP BY 1),
        |u AS (SELECT cust.ck, nation, bal,
        |    CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END AS treat,
        |    coalesce(out6, 0) AS out6
        |  FROM cust LEFT JOIN spend USING (ck)),
        |w AS (SELECT ck, nation, bal, treat, out6,
        |    last_value(CASE WHEN treat = 0 THEN bal END IGNORE NULLS)
        |      OVER (PARTITION BY nation ORDER BY bal, ck
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pbal,
        |    last_value(CASE WHEN treat = 0 THEN out6 END IGNORE NULLS)
        |      OVER (PARTITION BY nation ORDER BY bal, ck
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pout,
        |    last_value(CASE WHEN treat = 0 THEN bal END IGNORE NULLS)
        |      OVER (PARTITION BY nation ORDER BY bal DESC, ck DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS nbal,
        |    last_value(CASE WHEN treat = 0 THEN out6 END IGNORE NULLS)
        |      OVER (PARTITION BY nation ORDER BY bal DESC, ck DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS nout
        |  FROM u),
        |m AS (SELECT nation, ck, out6,
        |    CASE WHEN pbal IS NULL AND nbal IS NULL THEN NULL
        |         WHEN nbal IS NULL THEN pout
        |         WHEN pbal IS NULL THEN nout
        |         WHEN (bal - pbal) <= (nbal - bal) THEN pout
        |         ELSE nout END AS mout
        |  FROM w WHERE treat = 1),
        |p AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_treated,
        |    CAST(count(mout) AS BIGINT) AS n_matched,
        |    CAST(sum(CASE WHEN mout IS NOT NULL THEN out6 - mout END)
        |      AS BIGINT) AS s6
        |  FROM m GROUP BY 1)
        |SELECT nation, n_treated, n_matched,
        |  CAST(floor((2 * s6 + n_matched)
        |    / nullif(2.0 * n_matched, 0)) AS BIGINT)
        |    / CAST(1000000 AS DOUBLE) AS att
        |FROM p ORDER BY nation""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).select(
        col("c_custkey").as("ck"), col("c_nationkey").as("nation"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(expr("CAST(round(o_totalprice * 1000000) AS BIGINT)"))
          .cast("long").as("out6"))
      val u = cust.join(spend, Seq("ck"), "left")
        .select(col("ck"), col("nation"), col("bal"),
          when(col("seg") === "BUILDING", 1).otherwise(0).as("treat"),
          coalesce(col("out6"), lit(0L)).as("out6"))
      // Both edge lookups are RUNNING frames (unbounded preceding →
      // 1 preceding): Spark streams those in O(n) per partition,
      // where an UNBOUNDED FOLLOWING frame recomputes its aggregate
      // per row — O(n²) per nation, measured 18× superlinear at the
      // 10× fixture. "First control after" in ascending order IS
      // "last control before" in descending order, so the second
      // pass just reverses the sort.
      val ord = Window.partitionBy("nation").orderBy("bal", "ck")
      val before = ord.rowsBetween(Window.unboundedPreceding, -1)
      val revBefore = Window.partitionBy("nation")
        .orderBy(col("bal").desc, col("ck").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val w = u
        .withColumn("pbal", last(when(col("treat") === 0, col("bal")),
          ignoreNulls = true).over(before))
        .withColumn("pout", last(when(col("treat") === 0, col("out6")),
          ignoreNulls = true).over(before))
        .withColumn("nbal", last(when(col("treat") === 0, col("bal")),
          ignoreNulls = true).over(revBefore))
        .withColumn("nout", last(when(col("treat") === 0, col("out6")),
          ignoreNulls = true).over(revBefore))
      val m = w.filter(col("treat") === 1)
        .selectExpr("nation", "out6",
          """CASE WHEN pbal IS NULL AND nbal IS NULL THEN NULL
            |     WHEN nbal IS NULL THEN pout
            |     WHEN pbal IS NULL THEN nout
            |     WHEN (bal - pbal) <= (nbal - bal) THEN pout
            |     ELSE nout END AS mout""".stripMargin)
      m.groupBy("nation")
        .agg(count(lit(1)).cast("long").as("n_treated"),
          count(col("mout")).cast("long").as("n_matched"),
          sum(when(col("mout").isNotNull, col("out6") - col("mout")))
            .cast("long").as("s6"))
        .selectExpr("nation", "n_treated", "n_matched",
          "CAST(floor((2 * s6 + n_matched)" +
            " / nullif(2.0 * n_matched, 0)) AS BIGINT)" +
            " / CAST(1000000 AS DOUBLE) AS att")
        .orderBy("nation")
    },

    // CUPED VARIANCE REDUCTION (Deng et al. 2013) — the adjusted
    // A/B readout every large experimentation platform runs: each
    // user's PRE-period spend (first half of the time range) is the
    // control covariate, θ = cov(pre, post)/var(pre), and the
    // CUPED-adjusted arm difference removes the pre-period component
    // of the variance — same expected effect as q_abtest's raw
    // difference, tighter by exactly var_ratio (the reported
    // 1 − R² of pre on post). The key identity: the adjusted means,
    // variances, and the final difference are ALL closed forms of
    // user-level moments — y′ never materializes, so the op is ONE
    // user-level fold (pre/post micro sums per user) + ONE moment
    // fold + scalar algebra on a 1-row frame. Scale: both folds are
    // partial-aggregated; nothing beyond the user frame ever
    // shuffles. Determinism: pre/post are exact integer micros, the
    // six moments accumulate in DECIMAL(38,0) (squares exceed
    // BIGINT), every later step is identical double arithmetic;
    // the split midpoint is exact integer microseconds; arms are
    // the salted user hash (no rand()).
    Q("q_cuped",
      s"""WITH b AS (SELECT user_id,
         |    CAST(round(value * 1000000) AS BIGINT) AS v6,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |tr AS (SELECT CAST(floor((CAST(min(us) AS BIGINT)
         |    + CAST(max(us) AS BIGINT)) / 2.0) AS BIGINT) AS mid
         |  FROM b),
         |u AS (SELECT user_id,
         |    ${TextKit.h28Duck("'cuped#' || user_id")} % 2 AS arm,
         |    CAST(coalesce(sum(CASE WHEN us < mid THEN v6 END), 0)
         |      AS BIGINT) AS pre6,
         |    CAST(coalesce(sum(CASE WHEN us >= mid THEN v6 END), 0)
         |      AS BIGINT) AS post6
         |  FROM b CROSS JOIN tr GROUP BY 1, 2),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(pre6 AS DECIMAL(38,0))) AS DOUBLE) AS sp,
         |    CAST(sum(CAST(post6 AS DECIMAL(38,0))) AS DOUBLE) AS sq,
         |    CAST(sum(CAST(pre6 AS DECIMAL(38,0)) * pre6) AS DOUBLE)
         |      AS spp,
         |    CAST(sum(CAST(post6 AS DECIMAL(38,0)) * post6) AS DOUBLE)
         |      AS sqq,
         |    CAST(sum(CAST(pre6 AS DECIMAL(38,0)) * post6) AS DOUBLE)
         |      AS spq
         |  FROM u),
         |a AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(sum(CASE WHEN arm = 0
         |      THEN CAST(pre6 AS DECIMAL(38,0)) END) AS DOUBLE) AS spa,
         |    CAST(sum(CASE WHEN arm = 1
         |      THEN CAST(pre6 AS DECIMAL(38,0)) END) AS DOUBLE) AS spb,
         |    CAST(sum(CASE WHEN arm = 0
         |      THEN CAST(post6 AS DECIMAL(38,0)) END) AS DOUBLE) AS sqa,
         |    CAST(sum(CASE WHEN arm = 1
         |      THEN CAST(post6 AS DECIMAL(38,0)) END) AS DOUBLE) AS sqb
         |  FROM u),
         |f AS (SELECT n, n_a, n_b,
         |    (n * spq - sp * sq) / (n * spp - sp * sp) AS theta,
         |    (sqa / n_a - sqb / n_b) / 1000000.0 AS draw,
         |    (spa / n_a - spb / n_b) / 1000000.0 AS dpre,
         |    (n * sqq - sq * sq) AS vpost,
         |    (n * spp - sp * sp) AS vpre,
         |    (n * spq - sp * sq) AS cov
         |  FROM m CROSS JOIN a)
         |SELECT n AS n_users, n_a, n_b, round(theta, 6) AS theta,
         |  round(draw, 6) AS diff_raw,
         |  round(draw - theta * dpre, 6) AS diff_cuped,
         |  round((vpost + theta * theta * vpre - 2 * theta * cov)
         |    / vpost, 6) AS var_ratio
         |FROM f""".stripMargin) { (s, d) =>
      val b = Tables.events(s, d).select(col("user_id"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v6"),
        expr("unix_micros(ts)").as("us"))
      val tr = b.agg(expr("CAST(floor((CAST(min(us) AS BIGINT)" +
        " + CAST(max(us) AS BIGINT)) / 2.0) AS BIGINT)").as("mid"))
      val u = b.crossJoin(broadcast(tr))
        .groupBy(col("user_id"),
          (expr(TextKit.h28("concat('cuped#', CAST(user_id AS STRING))"))
            % 2).as("arm"))
        .agg(coalesce(sum(when(col("us") < col("mid"), col("v6"))),
            lit(0L)).cast("long").as("pre6"),
          coalesce(sum(when(col("us") >= col("mid"), col("v6"))),
            lit(0L)).cast("long").as("post6"))
        .localCheckpoint(eager = false)
      def d0(c: String) = col(c).cast(DecimalType(38, 0))
      val m = u.agg(count(lit(1)).cast("long").as("n"),
        sum(d0("pre6")).cast("double").as("sp"),
        sum(d0("post6")).cast("double").as("sq"),
        sum(d0("pre6") * col("pre6")).cast("double").as("spp"),
        sum(d0("post6") * col("post6")).cast("double").as("sqq"),
        sum(d0("pre6") * col("post6")).cast("double").as("spq"))
      val a = u.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_b"),
        sum(when(col("arm") === 0, d0("pre6"))).cast("double").as("spa"),
        sum(when(col("arm") === 1, d0("pre6"))).cast("double").as("spb"),
        sum(when(col("arm") === 0, d0("post6"))).cast("double")
          .as("sqa"),
        sum(when(col("arm") === 1, d0("post6"))).cast("double")
          .as("sqb"))
      m.crossJoin(broadcast(a))
        .selectExpr("n", "n_a", "n_b",
          "(n * spq - sp * sq) / (n * spp - sp * sp) AS theta",
          "(sqa / n_a - sqb / n_b) / CAST(1000000 AS DOUBLE) AS draw",
          "(spa / n_a - spb / n_b) / CAST(1000000 AS DOUBLE) AS dpre",
          "(n * sqq - sq * sq) AS vpost",
          "(n * spp - sp * sp) AS vpre",
          "(n * spq - sp * sq) AS cov")
        .selectExpr("n AS n_users", "n_a", "n_b",
          "round(theta, 6) AS theta",
          "round(draw, 6) AS diff_raw",
          "round(draw - theta * dpre, 6) AS diff_cuped",
          "round((vpost + theta * theta * vpre - 2 * theta * cov)" +
            " / vpost, 6) AS var_ratio")
    },

    // SEQUENTIAL A/B MONITORING — the peeking-safe daily readout:
    // per calendar day (= look k of K), the cumulative Welch z of
    // the hash-arm value difference against an O'Brien–Fleming-type
    // spending boundary 2.797/√(k/K) — the alpha-spending guard
    // that lets an experiment be READ every day without inflating
    // false positives (a fixed-horizon q_abtest read daily at
    // α=.05 fires ~20%+ of null runs; the OBF boundary holds the
    // family rate, spending almost nothing early and converging to
    // ≈2.04 at the horizon). Completes the experimentation suite:
    // q_ab_srm gates validity, q_abtest reads the endpoint, q_cuped
    // tightens it, this one schedules WHEN reading is safe. Scale:
    // the corpus folds to the day×arm frame in ONE conditional
    // partial aggregate; cumulative looks are windows over that
    // CALENDAR-BOUNDED frame (GlobalWindowAuditSpec-documented);
    // everything else is day-count-sized. Determinism: daily sums
    // exact integer micros, cumulative squares in DECIMAL(38,0)
    // window sums (v6² exceeds BIGINT range), one identical
    // double chain per look, boundary from the fixed 2.797
    // constant; the crossing comparison is double-vs-double on
    // identical operands.
    Q("q_seq_ab",
      s"""WITH b AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    ${TextKit.h28Duck("'seq#' || user_id")} % 2 AS arm,
         |    CAST(round(value * 1000000) AS BIGINT) AS v6
         |  FROM events),
         |d AS (SELECT day,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS na,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nb,
         |    CAST(coalesce(sum(CASE WHEN arm = 0 THEN v6 END), 0)
         |      AS BIGINT) AS sa,
         |    CAST(coalesce(sum(CASE WHEN arm = 1 THEN v6 END), 0)
         |      AS BIGINT) AS sb,
         |    coalesce(sum(CASE WHEN arm = 0
         |      THEN CAST(v6 AS DECIMAL(38,0)) * v6 END), 0) AS qa,
         |    coalesce(sum(CASE WHEN arm = 1
         |      THEN CAST(v6 AS DECIMAL(38,0)) * v6 END), 0) AS qb
         |  FROM b GROUP BY 1),
         |c AS (SELECT day,
         |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS look,
         |    CAST(count(*) OVER () AS BIGINT) AS looks,
         |    CAST(sum(na) OVER w AS BIGINT) AS cna,
         |    CAST(sum(nb) OVER w AS BIGINT) AS cnb,
         |    CAST(sum(sa) OVER w AS BIGINT) AS csa,
         |    CAST(sum(sb) OVER w AS BIGINT) AS csb,
         |    CAST(sum(qa) OVER w AS DOUBLE) AS cqa,
         |    CAST(sum(qb) OVER w AS DOUBLE) AS cqb
         |  FROM d WINDOW w AS (ORDER BY day)),
         |f AS (SELECT day, look, looks, cna, cnb,
         |    ((CAST(csa AS DOUBLE) / cna - CAST(csb AS DOUBLE) / cnb)
         |      / 1000000.0)
         |    / sqrt(
         |      ((cqa - CAST(csa AS DOUBLE) * csa / cna)
         |        / (cna - 1.0) / cna
         |      + (cqb - CAST(csb AS DOUBLE) * csb / cnb)
         |        / (cnb - 1.0) / cnb) / 1e12) AS z,
         |    2.797 / sqrt(CAST(look AS DOUBLE) / looks) AS bound
         |  FROM c)
         |SELECT day, look, cna AS n_a, cnb AS n_b,
         |  round(z, 6) AS z, round(bound, 6) AS boundary,
         |  abs(z) > bound AS crossed
         |FROM f ORDER BY day""".stripMargin) { (s, d) =>
      val b = Tables.events(s, d).select(
        col("ts").cast("date").as("day"),
        (expr(TextKit.h28("concat('seq#', CAST(user_id AS STRING))"))
          % 2).as("arm"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v6"))
      val dd = b.groupBy("day").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long")
          .as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long")
          .as("nb"),
        coalesce(sum(when(col("arm") === 0, col("v6"))), lit(0L))
          .cast("long").as("sa"),
        coalesce(sum(when(col("arm") === 1, col("v6"))), lit(0L))
          .cast("long").as("sb"),
        coalesce(sum(when(col("arm") === 0,
          col("v6").cast(DecimalType(38, 0)) * col("v6"))), lit(0))
          .as("qa"),
        coalesce(sum(when(col("arm") === 1,
          col("v6").cast(DecimalType(38, 0)) * col("v6"))), lit(0))
          .as("qb"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val c = dd
        .withColumn("look", row_number().over(Window.orderBy("day"))
          .cast("long"))
        .withColumn("looks", count(lit(1)).over(all).cast("long"))
        .withColumn("cna", sum("na").over(w).cast("long"))
        .withColumn("cnb", sum("nb").over(w).cast("long"))
        .withColumn("csa", sum("sa").over(w).cast("long"))
        .withColumn("csb", sum("sb").over(w).cast("long"))
        .withColumn("cqa", sum("qa").over(w).cast("double"))
        .withColumn("cqb", sum("qb").over(w).cast("double"))
      c.selectExpr("day", "look", "looks", "cna", "cnb",
          "((CAST(csa AS DOUBLE) / cna - CAST(csb AS DOUBLE) / cnb)" +
            " / CAST(1000000 AS DOUBLE))" +
          " / sqrt(((cqa - CAST(csa AS DOUBLE) * csa / cna)" +
            " / (cna - CAST(1 AS DOUBLE)) / cna" +
            " + (cqb - CAST(csb AS DOUBLE) * csb / cnb)" +
            " / (cnb - CAST(1 AS DOUBLE)) / cnb)" +
            " / CAST(1000000000000 AS DOUBLE)) AS z",
          "CAST(2.797 AS DOUBLE)" +
            " / sqrt(CAST(look AS DOUBLE) / looks) AS bound")
        .selectExpr("day", "look", "cna AS n_a", "cnb AS n_b",
          "round(z, 6) AS z", "round(bound, 6) AS boundary",
          "abs(z) > bound AS crossed")
        .orderBy("day")
    },

    // DIFFERENCE-IN-DIFFERENCES — the 2×2 (treated/control ×
    // pre/post) panel estimator with its PARALLEL-TRENDS diagnostic:
    // DiD = (post_t − pre_t) − (post_c − pre_c) removes both the
    // group baseline and the common time shock, and the pre-period
    // daily-gap OLS slope is the testable assumption behind it (a
    // nonzero pre-trend means the groups were already diverging and
    // the DiD reads trend, not treatment). Completes the causal
    // four-pack: q_abtest (randomized), q_ate_strata (reweighting),
    // q_match_att (matching), DiD (panel timing). Scale: ONE
    // conditional fold to the 4-cell frame + ONE conditional fold to
    // the pre-period day×group frame (calendar-bounded); the slope
    // is exact-integer OLS sums over that bounded frame. All means
    // exact integer micros (half-up), DiD a BIGINT subtraction
    // chain, slope one double division of exact integers.
    Q("q_did",
      s"""WITH b AS (SELECT user_id,
         |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    ${TextKit.h28Duck("'did#' || user_id")} % 2 AS treat,
         |    CAST(round(value * 1000000) AS BIGINT) AS v6,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |tr AS (SELECT CAST(floor((CAST(min(us) AS BIGINT)
         |    + CAST(max(us) AS BIGINT)) / 2.0) AS BIGINT) AS mid
         |  FROM b),
         |cells AS (SELECT treat,
         |    CASE WHEN us < mid THEN 0 ELSE 1 END AS period,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v6) AS BIGINT) AS s
         |  FROM b CROSS JOIN tr GROUP BY 1, 2),
         |cm AS (SELECT treat, period,
         |    n, CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) AS m6
         |  FROM cells),
         |pv AS (SELECT
         |    CAST(sum(CASE WHEN treat = 1 AND period = 0 THEN m6 END)
         |      AS BIGINT) AS pre_t6,
         |    CAST(sum(CASE WHEN treat = 0 AND period = 0 THEN m6 END)
         |      AS BIGINT) AS pre_c6,
         |    CAST(sum(CASE WHEN treat = 1 AND period = 1 THEN m6 END)
         |      AS BIGINT) AS post_t6,
         |    CAST(sum(CASE WHEN treat = 0 AND period = 1 THEN m6 END)
         |      AS BIGINT) AS post_c6,
         |    CAST(sum(CASE WHEN treat = 1 THEN n END) AS BIGINT)
         |      AS n_treat,
         |    CAST(sum(CASE WHEN treat = 0 THEN n END) AS BIGINT)
         |      AS n_ctrl
         |  FROM cm),
         |pre AS (SELECT day, treat, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v6) AS BIGINT) AS s
         |  FROM b CROSS JOIN tr WHERE us < mid GROUP BY 1, 2),
         |gap AS (SELECT day,
         |    CAST(sum(CASE WHEN treat = 1 THEN
         |      CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) END)
         |      AS BIGINT)
         |    - CAST(sum(CASE WHEN treat = 0 THEN
         |      CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) END)
         |      AS BIGINT) AS g6
         |  FROM pre GROUP BY 1 HAVING count(*) = 2),
         |gx AS (SELECT g6, CAST(day - (SELECT min(day) FROM gap)
         |    AS BIGINT) AS x FROM gap),
         |sl AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(g6) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * g6) AS BIGINT) AS sxy FROM gx)
         |SELECT n_treat, n_ctrl,
         |  pre_t6 / CAST(1000000 AS DOUBLE) AS pre_treat,
         |  post_t6 / CAST(1000000 AS DOUBLE) AS post_treat,
         |  pre_c6 / CAST(1000000 AS DOUBLE) AS pre_ctrl,
         |  post_c6 / CAST(1000000 AS DOUBLE) AS post_ctrl,
         |  ((post_t6 - pre_t6) - (post_c6 - pre_c6))
         |    / CAST(1000000 AS DOUBLE) AS did,
         |  round((nd * sxy - sx * sy)
         |    / (CAST(nd AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |    / 1000000.0, 9) AS pre_gap_slope
         |FROM pv CROSS JOIN sl""".stripMargin) { (s, d) =>
      val b = Tables.events(s, d).select(col("user_id"),
        col("ts").cast("date").as("day"),
        (expr(TextKit.h28("concat('did#', CAST(user_id AS STRING))"))
          % 2).as("treat"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v6"),
        expr("unix_micros(ts)").as("us"))
        .localCheckpoint(eager = false)
      val tr = b.agg(expr("CAST(floor((CAST(min(us) AS BIGINT)" +
        " + CAST(max(us) AS BIGINT)) / 2.0) AS BIGINT)").as("mid"))
      val cm = b.crossJoin(broadcast(tr))
        .groupBy(col("treat"),
          when(col("us") < col("mid"), 0).otherwise(1).as("period"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum("v6").cast("long").as("s"))
        .selectExpr("treat", "period", "n",
          "CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) AS m6")
      val pv = cm.agg(
        sum(when(col("treat") === 1 && col("period") === 0, col("m6")))
          .cast("long").as("pre_t6"),
        sum(when(col("treat") === 0 && col("period") === 0, col("m6")))
          .cast("long").as("pre_c6"),
        sum(when(col("treat") === 1 && col("period") === 1, col("m6")))
          .cast("long").as("post_t6"),
        sum(when(col("treat") === 0 && col("period") === 1, col("m6")))
          .cast("long").as("post_c6"),
        sum(when(col("treat") === 1, col("n"))).cast("long")
          .as("n_treat"),
        sum(when(col("treat") === 0, col("n"))).cast("long")
          .as("n_ctrl"))
      val pre = b.crossJoin(broadcast(tr))
        .filter(col("us") < col("mid"))
        .groupBy("day", "treat")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("v6").cast("long").as("s"))
      val gap = pre
        .selectExpr("day", "treat",
          "CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) AS m6")
        .groupBy("day")
        .agg(count(lit(1)).as("cnt"),
          (sum(when(col("treat") === 1, col("m6"))).cast("long")
            - sum(when(col("treat") === 0, col("m6"))).cast("long"))
            .as("g6"))
        .filter(col("cnt") === 2)
        .localCheckpoint(eager = false)
      val minDay = gap.agg(min("day").as("d0"))
      val gx = gap.crossJoin(broadcast(minDay))
        .selectExpr("g6", "CAST(datediff(day, d0) AS BIGINT) AS x")
      val sl = gx.agg(count(lit(1)).cast("long").as("nd"),
        sum("x").cast("long").as("sx"),
        sum("g6").cast("long").as("sy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("x") * col("g6")).cast("long").as("sxy"))
      pv.crossJoin(broadcast(sl))
        .selectExpr("n_treat", "n_ctrl",
          "pre_t6 / CAST(1000000 AS DOUBLE) AS pre_treat",
          "post_t6 / CAST(1000000 AS DOUBLE) AS post_treat",
          "pre_c6 / CAST(1000000 AS DOUBLE) AS pre_ctrl",
          "post_c6 / CAST(1000000 AS DOUBLE) AS post_ctrl",
          "((post_t6 - pre_t6) - (post_c6 - pre_c6))" +
            " / CAST(1000000 AS DOUBLE) AS did",
          "round((nd * sxy - sx * sy)" +
            " / (CAST(nd AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)" +
            " / CAST(1000000 AS DOUBLE), 9) AS pre_gap_slope")
    },

    // Cohen's kappa (Cohen 1960): chance-corrected agreement between
    // two annotators — the label-quality gate a supervised-data
    // pipeline runs before trusting a labeling pass. The two "raters"
    // are deterministic document heuristics (a length rule and a
    // stopword rule), so the 2×2 confusion table is reproducible:
    // κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement and
    // p_e the marginal-product chance agreement. Scale: ONE
    // partial-aggregated pass folds the corpus to four counters
    // (conditional sums — the q_abtest discipline); everything after
    // is arithmetic on a 1-row frame. Determinism: integer counts,
    // identical double expressions both sides.
    Q("q_cohens_kappa",
      """WITH l AS (SELECT
        |    CAST(n_chars >= 300 AS INT) AS a,
        |    CAST(len(list_filter(list_filter(string_split(lower(text), ' '),
        |      t -> t <> ''), x -> x IN ('the', 'a'))) >= 3 AS INT) AS b
        |  FROM documents),
        |c AS (SELECT count(*) AS n,
        |    CAST(sum(a * b) AS BIGINT) AS n11,
        |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
        |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        |  FROM l)
        |SELECT n, n11, n10, n01, n00,
        |  round((n11 + n00) / CAST(n AS DOUBLE), 6) AS po,
        |  round(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |    / (CAST(n AS DOUBLE) * n), 6) AS pe,
        |  round(((n11 + n00) / CAST(n AS DOUBLE)
        |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |        / (CAST(n AS DOUBLE) * n))
        |    / (1 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |        / (CAST(n AS DOUBLE) * n)), 6) AS kappa
        |FROM c""".stripMargin) { (s, d) =>
      import TextKit.toks
      Tables.documents(s, d)
        .select(
          expr("CAST(n_chars >= 300 AS INT)").as("a"),
          expr(s"CAST(size(filter($toks, x -> x IN ('the', 'a'))) >= 3" +
            " AS INT)").as("b"))
        .agg(count(lit(1)).as("n"),
          sum(expr("a * b")).as("n11"),
          sum(expr("a * (1 - b)")).as("n10"),
          sum(expr("(1 - a) * b")).as("n01"),
          sum(expr("(1 - a) * (1 - b)")).as("n00"))
        .selectExpr("n", "n11", "n10", "n01", "n00",
          "round((n11 + n00) / CAST(n AS DOUBLE), 6) AS po",
          "round(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))" +
            " / (CAST(n AS DOUBLE) * n), 6) AS pe",
          "round(((n11 + n00) / CAST(n AS DOUBLE)" +
            " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))" +
            " / (CAST(n AS DOUBLE) * n))" +
            " / (1 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))" +
            " / (CAST(n AS DOUBLE) * n)), 6) AS kappa")
    },

    // SAMPLE-RATIO MISMATCH (SRM) — the first gate of every A/B
    // readout: does the REALIZED split-arm allocation match the
    // declared 80/10/10 design? A drifted ratio invalidates every
    // downstream metric before any outcome is read (bot filtering,
    // crash loss, assignment bugs all surface here first). Uses
    // q_split_assign's own hash split as the assignment under test;
    // chi-square GOF with df = 2 against the design ratios, flagged
    // at the conventional SRM alpha 0.001 (chi2 > 13.816). One
    // full-scan conditional aggregate → a 1-row frame; every
    // arithmetic step is integer counts × design constants, so the
    // statistic is the same double in both engines at any scale.
    Q("q_ab_srm", {
      val h = h28Duck("'split#' || doc_id")
      """WITH s AS (SELECT CASE WHEN HH < 214748365 THEN 'train'
        |       WHEN HH < 241591910 THEN 'val' ELSE 'test' END AS split
        |  FROM documents),
        |c AS (SELECT count(*) AS n,
        |    CAST(count(*) FILTER (split = 'train') AS BIGINT) AS nt,
        |    CAST(count(*) FILTER (split = 'val') AS BIGINT) AS nv,
        |    CAST(count(*) FILTER (split = 'test') AS BIGINT) AS ns
        |  FROM s)
        |SELECT n, nt, nv, ns,
        |  round(CHI, 6) AS chi2,
        |  CHI > CAST(13.816 AS DOUBLE) AS srm
        |FROM c""".stripMargin.replace("HH", h).replace("CHI", "(nt - n * CAST(0.8 AS DOUBLE)) * (nt - n * CAST(0.8 AS DOUBLE)) / (n * CAST(0.8 AS DOUBLE)) + (nv - n * CAST(0.1 AS DOUBLE)) * (nv - n * CAST(0.1 AS DOUBLE)) / (n * CAST(0.1 AS DOUBLE)) + (ns - n * CAST(0.1 AS DOUBLE)) * (ns - n * CAST(0.1 AS DOUBLE)) / (n * CAST(0.1 AS DOUBLE))")
    }) { (s, d) =>
      val h = expr(h28("concat('split#', CAST(doc_id AS STRING))"))
      val split = Tables.documents(s, d)
        .select(when(h < 214748365L, "train")
          .when(h < 241591910L, "val").otherwise("test").as("split"))
      // constants pinned CAST(.. AS DOUBLE) on BOTH sides: a bare
      // 0.8 literal parses as DECIMAL in each engine and drags the
      // whole statistic into engine-specific decimal arithmetic (the
      // q_power_analysis decimal-literal hazard).
      val chi2 = "(nt - n * CAST(0.8 AS DOUBLE)) * (nt - n * CAST(0.8 AS DOUBLE)) / (n * CAST(0.8 AS DOUBLE)) + (nv - n * CAST(0.1 AS DOUBLE)) * (nv - n * CAST(0.1 AS DOUBLE)) / (n * CAST(0.1 AS DOUBLE)) + (ns - n * CAST(0.1 AS DOUBLE)) * (ns - n * CAST(0.1 AS DOUBLE)) / (n * CAST(0.1 AS DOUBLE))"
      split.agg(
        count(lit(1)).as("n"),
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .cast("long").as("nt"),
        sum(when(col("split") === "val", 1L).otherwise(0L))
          .cast("long").as("nv"),
        sum(when(col("split") === "test", 1L).otherwise(0L))
          .cast("long").as("ns"))
        .selectExpr("n", "nt", "nv", "ns",
          s"round($chi2, 6) AS chi2",
          s"$chi2 > CAST(13.816 AS DOUBLE) AS srm")
    },

    // 1-D EARTH MOVER'S DISTANCE (Wasserstein-1) between the view
    // and click value distributions — the third member of the drift
    // triple: q_psi bins into 10 cells (loses within-bin shift),
    // q_ks_test takes the sup of |ΔCDF| (ignores how WIDE the gap
    // is), EMD integrates |F₁−F₂| dx — the metric that prices drift
    // in the units of the variable itself. Exact on the empirical
    // CDFs: over the sorted distinct values of the union,
    // EMD = Σ |F₁(vᵢ)−F₂(vᵢ)|·(vᵢ₊₁−vᵢ). Scale: the corpus folds to
    // the DISTINCT-VALUE frame in one conditional-aggregate groupBy
    // (bounded by the 2 dp value domain — ≤ ~33 k rows at ANY corpus
    // size), and the cumulative/lead windows run over that bounded
    // frame only — no corpus-sized sort, unlike a naive rank
    // formulation. Determinism: CDFs are exact-integer ratios in one
    // double division; each term rounds 9 dp into a DECIMAL sum.
    Q("q_emd_drift",
      """WITH v AS (SELECT value AS x,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS ca,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS cb
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY value),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM v),
        |c AS (SELECT x,
        |    CAST(sum(ca) OVER (ORDER BY x) AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER (ORDER BY x) AS BIGINT) AS ccb,
        |    lead(x) OVER (ORDER BY x) AS nx
        |  FROM v),
        |term AS (SELECT
        |    round(abs(CAST(cca AS DOUBLE) / na - CAST(ccb AS DOUBLE) / nb)
        |      * (nx - x), 9) AS w
        |  FROM c CROSS JOIN t WHERE nx IS NOT NULL)
        |SELECT (SELECT na FROM t) AS n_view, (SELECT nb FROM t) AS n_click,
        |  (SELECT count(*) FROM v) AS n_values,
        |  round(CAST(sum(CAST(w AS DECIMAL(38,9))) AS DOUBLE), 6) AS emd
        |FROM term""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .groupBy(col("value").as("x"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("ca"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("cb"))
        .localCheckpoint(eager = false) // bounded distinct-value frame
      val t = broadcast(v.agg(sum("ca").cast("long").as("na"),
        sum("cb").cast("long").as("nb"),
        count(lit(1)).as("n_values")))
      val w = Window.orderBy("x")
      val c = v
        .withColumn("cca", sum("ca").over(w).cast("long"))
        .withColumn("ccb", sum("cb").over(w).cast("long"))
        .withColumn("nx", lead("x", 1).over(w))
        .filter(col("nx").isNotNull)
      // GLOBAL agg + crossJoin the 1-row totals frame (round-12
      // advice): grouping by (na, nb, n_values) yields ZERO rows when
      // the term frame is empty (≤ 1 distinct value / degenerate
      // corpus), while the oracle's global aggregate returns 1 row
      // with NULL emd. The global agg is 1 row on EVERY input, so
      // engine and oracle agree on degenerate corpora too.
      val emd = c.crossJoin(t)
        .select(round(abs(col("cca").cast("double") / col("na") -
            col("ccb").cast("double") / col("nb")) *
            (col("nx") - col("x")), 9).as("term"))
        .agg(round(sum(col("term").cast(DecimalType(38, 9)))
          .cast("double"), 6).as("emd"))
      t.crossJoin(emd)
        .select(col("na").as("n_view"), col("nb").as("n_click"),
          col("n_values"), col("emd"))
    },

    // CALIBRATION / RELIABILITY BINS + ECE — is a model score an
    // actual probability? Scores (here the deterministic value/400
    // pseudo-score) bucket into 10 equal-width bins; per bin the
    // mean score (confidence) meets the realized click rate
    // (accuracy), and the Expected Calibration Error is the
    // bin-count-weighted mean |acc − conf| — the standard reliability
    // audit run before trusting any score-gated filter at corpus
    // scale. Determinism: score micros = value × 2500 is an exact
    // integer (2 dp values); both means use the exact integer tie
    // rule floor((2S + n) / 2n) (package.scala mean-rounding caveat);
    // the ECE terms are products of integers with 6 dp-rounded
    // doubles, decimal-summed. Plan: one scan → 10-row frame; the
    // ECE scalar broadcasts back onto the bins.
    Q("q_calibration_bins",
      """WITH b AS (SELECT
        |    least(CAST(floor(round(value / 400, 6) * 10) AS INT), 9) AS bin,
        |    CAST(round(value * 2500, 0) AS BIGINT) AS sm,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT bin, count(*) AS nb,
        |    CAST(sum(sm) AS BIGINT) AS ssum, CAST(sum(y) AS BIGINT) AS ysum
        |  FROM b GROUP BY bin),
        |g2 AS (SELECT bin, nb,
        |    floor((2 * ssum + nb) / (2.0 * nb)) / 1e6 AS conf,
        |    floor((2 * ysum * 1000000 + nb) / (2.0 * nb)) / 1e6 AS acc
        |  FROM g),
        |e AS (SELECT round(CAST(sum(CAST(round(nb * abs(acc - conf), 6)
        |      AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(sum(nb) AS DOUBLE), 6) AS ece FROM g2)
        |SELECT bin, nb, round(conf, 6) AS conf, round(acc, 6) AS acc,
        |  round(abs(acc - conf), 6) AS gap, ece
        |FROM g2 CROSS JOIN e ORDER BY bin""".stripMargin) { (s, d) =>
      val b = Tables.events(s, d).select(
        least(floor(round(col("value") / 400, 6) * 10).cast("int"), lit(9))
          .as("bin"),
        round(col("value") * 2500, 0).cast("long").as("sm"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("y"))
      val g2 = b.groupBy("bin").agg(
          count(lit(1)).as("nb"),
          sum("sm").cast("long").as("ssum"),
          sum("y").cast("long").as("ysum"))
        .selectExpr("bin", "nb",
          "floor((2 * ssum + nb) / (2.0 * nb)) / 1e6 AS conf",
          "floor((2 * ysum * 1000000 + nb) / (2.0 * nb)) / 1e6 AS acc")
      val e = g2.agg((sum(round(col("nb") * abs(col("acc") - col("conf")),
          6).cast(DecimalType(38, 6))).cast("double") /
          sum("nb").cast("double")).as("raw"))
        .select(round(col("raw"), 6).as("ece"))
      g2.crossJoin(broadcast(e))
        .select(col("bin"), col("nb"),
          round(col("conf"), 6).as("conf"), round(col("acc"), 6).as("acc"),
          round(abs(col("acc") - col("conf")), 6).as("gap"), col("ece"))
        .orderBy("bin")
    },
  )

  /** The nine OLS moment sums for the oracle — identical per-row
    * round(·,6) → DECIMAL(38,6) accumulation as the Spark side's
    * dsum calls (package.scala). */
  private lazy val olsMoments: String = {
    def s(e: String, as: String) =
      s"${dsumSql(s"round($e, 6)")} AS $as"
    Seq(s("x1", "sx1"), s("x2", "sx2"), s("y", "sy"),
      s("x1 * x1", "sx11"), s("x1 * x2", "sx12"), s("x2 * x2", "sx22"),
      s("x1 * y", "sx1y"), s("x2 * y", "sx2y"), s("y * y", "syy"))
      .mkString(",\n    ")
  }

  /** Cramer determinants for the 3×3 normal equations, one shared
    * ANSI string evaluated by BOTH engines (Spark selectExpr and the
    * DuckDB oracle parse the same text, so the IEEE op tree is
    * identical by construction). */
  private lazy val olsDets: String =
    """(n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2)
      | + sx2 * (sx1 * sx12 - sx11 * sx2)) AS det,
      |(sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y)
      | + sx2 * (sx1y * sx12 - sx11 * sx2y)) AS d0,
      |(n * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2)
      | + sx2 * (sx1 * sx2y - sx1y * sx2)) AS d1,
      |(n * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2)
      | + sy * (sx1 * sx12 - sx11 * sx2)) AS d2"""
      .stripMargin.replace("\n ", " ")

  /** R² from the rounded coefficients and the moment sums — the
    * normal-equation identity, shared ANSI text (see olsDets). */
  private lazy val olsR2: String =
    "round(1 - (syy - b0 * sy - b1 * sx1y - b2 * sx2y)" +
      " / (syy - sy * sy / n), 6)"
}

/** Chained-CTE oracle for the fixed EM sweeps (q_gmm_1d): quantile
  * inits, then per sweep the row-level responsibility CTE and the
  * 1-row moment/parameter CTEs — parameter CTEs MATERIALIZED because
  * every sweep references the previous one (the q_hits re-inlining
  * lesson; the row-level CTEs are referenced once and may stream). */
object AnalyticsOracles {
  def gmmSql(sweeps: Int): String = {
    val steps = (1 to sweeps).map { i =>
      s"""e$i AS (SELECT x.x, round(
         |    (ln(1 - c.pi1) - ln(c.sg2)
         |      - (x.x - c.mu2) * (x.x - c.mu2) / (2 * c.sg2 * c.sg2))
         |  - (ln(c.pi1) - ln(c.sg1)
         |      - (x.x - c.mu1) * (x.x - c.mu1) / (2 * c.sg1 * c.sg1)), 9)
         |    AS dl
         |  FROM x CROSS JOIN c${i - 1} c),
         |r$i AS (SELECT x,
         |    round(CAST(1 AS DOUBLE) / (1 + exp(dl)), 9) AS r FROM e$i),
         |m$i AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(r AS DECIMAL(38,9))) AS DOUBLE) AS n1,
         |    CAST(sum(CAST(round(r * x, 9) AS DECIMAL(38,9)))
         |      AS DOUBLE) AS s1,
         |    CAST(sum(CAST(round(r * x * x, 9) AS DECIMAL(38,9)))
         |      AS DOUBLE) AS q1,
         |    CAST(sum(CAST(round((1 - r) * x, 9) AS DECIMAL(38,9)))
         |      AS DOUBLE) AS s2,
         |    CAST(sum(CAST(round((1 - r) * x * x, 9) AS DECIMAL(38,9)))
         |      AS DOUBLE) AS q2
         |  FROM r$i),
         |c$i AS MATERIALIZED (SELECT
         |    round(n1 / n, 9) AS pi1,
         |    round(s1 / n1, 9) AS mu1,
         |    round(sqrt(greatest(q1 / n1 - (s1 / n1) * (s1 / n1),
         |      CAST(0.000001 AS DOUBLE))), 9) AS sg1,
         |    round(s2 / (n - n1), 9) AS mu2,
         |    round(sqrt(greatest(q2 / (n - n1)
         |      - (s2 / (n - n1)) * (s2 / (n - n1)),
         |      CAST(0.000001 AS DOUBLE))), 9) AS sg2,
         |    n FROM m$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS MATERIALIZED (SELECT round(value, 6) AS x FROM events),
       |i0 AS (SELECT
       |    round(quantile_cont(x, 0.25), 6) AS mu1,
       |    round(quantile_cont(x, 0.75), 6) AS mu2,
       |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
       |      AS qx,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM x),
       |c0 AS MATERIALIZED (SELECT CAST(0.5 AS DOUBLE) AS pi1, mu1,
       |    round(sqrt(qx / n - (sx / n) * (sx / n)), 6) AS sg1, mu2,
       |    round(sqrt(qx / n - (sx / n) * (sx / n)), 6) AS sg2, n
       |  FROM i0),
       |$steps
       |SELECT comp, n, pi, mu, sigma FROM (
       |  SELECT 1 AS comp, n, round(pi1, 6) AS pi, round(mu1, 6) AS mu,
       |    round(sg1, 6) AS sigma FROM c$sweeps
       |  UNION ALL
       |  SELECT 2, n, round(1 - pi1, 6), round(mu2, 6), round(sg2, 6)
       |  FROM c$sweeps) u
       |ORDER BY comp""".stripMargin
  }
}
