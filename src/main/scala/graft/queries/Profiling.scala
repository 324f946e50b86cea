package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextKit.{h60, h60Duck}

/** Data-profiling operators — the pre-flight pass a 100 TB pipeline
  * runs before committing to a layout/model (value distributions,
  * column correlations). Both are single-pass partial-aggregate
  * plans: the histogram is one groupBy over a computed bin id, the
  * correlation matrix is ONE aggregation row of exact decimal power
  * sums fanned out to per-pair rows — no per-pair passes over the
  * data, no driver-side math over rows.
  */
object Profiling {

  val qs: Seq[Q] = Seq(

    // Fixed-bin histogram of order totals: 20 equal-width bins over
    // the observed [min, max]. The bin edges come from one tiny
    // pre-aggregation (broadcast); binning itself is scan-local
    // integer math. Both engines evaluate the identical double
    // expression, so bin boundaries agree bit-for-bit.
    Q("q_agg_histogram",
      """WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |            FROM orders),
        |b AS (SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20)),
        |                        19) AS BIGINT) AS bin
        |      FROM orders, mm)
        |SELECT bin, count(*) AS n FROM b GROUP BY bin ORDER BY bin""".stripMargin) {
      (s, d) =>
        val mm = Tables.orders(s, d)
          .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        Tables.orders(s, d).crossJoin(broadcast(mm))
          .select(least(floor((col("o_totalprice") - col("lo")) /
              ((col("hi") - col("lo")) / 20)), lit(19)).cast("bigint").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n"))
          .orderBy("bin")
    },

    // Pairwise Pearson correlations of the lineitem measures from
    // EXACT decimal power sums (Σx, Σx², Σxy — associative, partition-
    // order-independent; same discipline as q_agg_stats, which the
    // built-in corr() can't offer). One aggregation computes every
    // sum; the three pair rows are a constant-size reshape of that
    // single row.
    Q("q_corr_matrix",
      """WITH s AS (SELECT count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(38,6))) AS sq,
        |    sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS sp,
        |    sum(CAST(l_discount AS DECIMAL(38,6))) AS sd,
        |    sum(CAST(l_quantity AS DECIMAL(38,6)) * CAST(l_quantity AS DECIMAL(38,6))) AS sqq,
        |    sum(CAST(l_extendedprice AS DECIMAL(38,6)) * CAST(l_extendedprice AS DECIMAL(38,6))) AS spp,
        |    sum(CAST(l_discount AS DECIMAL(38,6)) * CAST(l_discount AS DECIMAL(38,6))) AS sdd,
        |    sum(CAST(l_quantity AS DECIMAL(38,6)) * CAST(l_extendedprice AS DECIMAL(38,6))) AS sqp,
        |    sum(CAST(l_quantity AS DECIMAL(38,6)) * CAST(l_discount AS DECIMAL(38,6))) AS sqd,
        |    sum(CAST(l_extendedprice AS DECIMAL(38,6)) * CAST(l_discount AS DECIMAL(38,6))) AS spd
        |  FROM lineitem),
        |p AS (
        |  SELECT 'quantity_extendedprice' AS pair,
        |    CAST(sq AS DOUBLE) AS sx, CAST(sp AS DOUBLE) AS sy,
        |    CAST(sqq AS DOUBLE) AS sxx, CAST(spp AS DOUBLE) AS syy,
        |    CAST(sqp AS DOUBLE) AS sxy, n FROM s
        |  UNION ALL SELECT 'quantity_discount',
        |    CAST(sq AS DOUBLE), CAST(sd AS DOUBLE), CAST(sqq AS DOUBLE),
        |    CAST(sdd AS DOUBLE), CAST(sqd AS DOUBLE), n FROM s
        |  UNION ALL SELECT 'extendedprice_discount',
        |    CAST(sp AS DOUBLE), CAST(sd AS DOUBLE), CAST(spp AS DOUBLE),
        |    CAST(sdd AS DOUBLE), CAST(spd AS DOUBLE), n FROM s)
        |SELECT pair,
        |  round((n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
        |  n
        |FROM p ORDER BY pair""".stripMargin) { (s, d) =>
      def dec(c: String) = col(c).cast("decimal(38,6)")
      val sums = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(dec("l_quantity")).as("sq"),
        sum(dec("l_extendedprice")).as("sp"),
        sum(dec("l_discount")).as("sd"),
        sum(dec("l_quantity") * dec("l_quantity")).as("sqq"),
        sum(dec("l_extendedprice") * dec("l_extendedprice")).as("spp"),
        sum(dec("l_discount") * dec("l_discount")).as("sdd"),
        sum(dec("l_quantity") * dec("l_extendedprice")).as("sqp"),
        sum(dec("l_quantity") * dec("l_discount")).as("sqd"),
        sum(dec("l_extendedprice") * dec("l_discount")).as("spd"))
      val pairs = sums.selectExpr(
        """stack(3,
          |  'quantity_extendedprice', CAST(sq AS DOUBLE), CAST(sp AS DOUBLE),
          |    CAST(sqq AS DOUBLE), CAST(spp AS DOUBLE), CAST(sqp AS DOUBLE),
          |  'quantity_discount', CAST(sq AS DOUBLE), CAST(sd AS DOUBLE),
          |    CAST(sqq AS DOUBLE), CAST(sdd AS DOUBLE), CAST(sqd AS DOUBLE),
          |  'extendedprice_discount', CAST(sp AS DOUBLE), CAST(sd AS DOUBLE),
          |    CAST(spp AS DOUBLE), CAST(sdd AS DOUBLE), CAST(spd AS DOUBLE)
          |) AS (pair, sx, sy, sxx, syy, sxy)""".stripMargin, "n")
      pairs.select(col("pair"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                 (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr"),
          col("n"))
        .orderBy("pair")
    },

    // COUNT-MIN SKETCH: depth-4 × width-256 counter grid over
    // event user_ids, probed for users 0-9 with the exact count
    // riding along. The sketch is pure integer work on md5-derived
    // hashes (deterministic — both engines build the identical
    // grid), the counter update is a partial-aggregated groupBy on
    // (depth, bucket) — 1024 counters on the shuffle no matter how
    // many rows flow in — and estimates never undercount (CMS
    // guarantee, asserted in ProfilingSpec-style test via the
    // overcount column). This is the mergeable-sketch shape for
    // frequency estimation at 100 TB, complementing KMV
    // (q_agg_approx_distinct) and the histogram quantile sketch
    // (q_agg_approx_quantile).
    Q("q_agg_cms",
      s"""WITH g AS (SELECT d, ${TextKit.h28Duck(
           "('cms#' || CAST(d AS VARCHAR) || '#' || CAST(user_id AS VARCHAR))")} % 256 AS b,
         |    count(*) AS cnt
         |  FROM events, unnest(range(0, 4)) AS t(d) GROUP BY 1, 2),
         |probe AS (SELECT user_id, count(*) AS exact_n FROM events
         |          WHERE user_id < 10 GROUP BY 1),
         |pd AS (SELECT p.user_id, p.exact_n, t.d, ${TextKit.h28Duck(
           "('cms#' || CAST(t.d AS VARCHAR) || '#' || CAST(p.user_id AS VARCHAR))")} % 256 AS b
         |  FROM probe p, unnest(range(0, 4)) AS t(d))
         |SELECT pd.user_id, min(g.cnt) AS est_n, pd.exact_n,
         |  CAST(min(g.cnt) - pd.exact_n AS BIGINT) AS overcount
         |FROM pd JOIN g USING (d, b)
         |GROUP BY pd.user_id, pd.exact_n ORDER BY pd.user_id""".stripMargin) {
      (s, d) =>
        val hashOf = (dd: String, u: String) => TextKit.h28(
          s"concat('cms#', CAST($dd AS STRING), '#', CAST($u AS STRING))")
        val ev = Tables.events(s, d)
        val grid = fanout(ev)
          .select(col("user_id"), explode(expr("sequence(0, 3)")).as("d"))
          .select(col("d"), expr(s"${hashOf("d", "user_id")} % 256").as("b"))
          .groupBy("d", "b").agg(count(lit(1)).as("cnt"))
        val probe = ev.filter(col("user_id") < 10)
          .groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        probe
          .select(col("user_id"), col("exact_n"),
            explode(expr("sequence(0, 3)")).as("d"))
          .withColumn("b", expr(s"${hashOf("d", "user_id")} % 256"))
          .join(broadcast(grid), Seq("d", "b"))
          .groupBy("user_id", "exact_n").agg(min("cnt").as("est_n"))
          .select(col("user_id"), col("est_n"), col("exact_n"),
            (col("est_n") - col("exact_n")).cast("long").as("overcount"))
          .orderBy("user_id")
    },

    // ANALYZE-style per-column statistics over lineitem's measures —
    // the stats a cost-based optimizer eats (row count, NDV, null
    // count, min/max). ONE scan: Spark expands the multi-distinct
    // aggregation (Expand ×5 under partial+final agg) and the
    // per-column rows come from a constant-size stack of the single
    // result row — no per-column passes. At 100 TB the exact NDVs
    // swap for the engine's own KMV sketch (q_agg_approx_distinct);
    // the plan shape is unchanged.
    Q("q_analyze_stats",
      """WITH s AS (SELECT count(*) AS n,
        |    count(l_quantity) AS c1, count(DISTINCT l_quantity) AS d1,
        |      round(min(l_quantity), 6) AS mn1, round(max(l_quantity), 6) AS mx1,
        |    count(l_extendedprice) AS c2, count(DISTINCT l_extendedprice) AS d2,
        |      round(min(l_extendedprice), 6) AS mn2, round(max(l_extendedprice), 6) AS mx2,
        |    count(l_discount) AS c3, count(DISTINCT l_discount) AS d3,
        |      round(min(l_discount), 6) AS mn3, round(max(l_discount), 6) AS mx3,
        |    count(l_tax) AS c4, count(DISTINCT l_tax) AS d4,
        |      round(min(l_tax), 6) AS mn4, round(max(l_tax), 6) AS mx4,
        |    count(l_partkey) AS c5, count(DISTINCT l_partkey) AS d5,
        |      round(CAST(min(l_partkey) AS DOUBLE), 6) AS mn5,
        |      round(CAST(max(l_partkey) AS DOUBLE), 6) AS mx5
        |  FROM lineitem)
        |SELECT u.* FROM s, LATERAL (
        |  SELECT 'l_quantity' AS column_name, n, d1 AS ndv, n - c1 AS n_null,
        |         mn1 AS vmin, mx1 AS vmax
        |  UNION ALL SELECT 'l_extendedprice', n, d2, n - c2, mn2, mx2
        |  UNION ALL SELECT 'l_discount', n, d3, n - c3, mn3, mx3
        |  UNION ALL SELECT 'l_tax', n, d4, n - c4, mn4, mx4
        |  UNION ALL SELECT 'l_partkey', n, d5, n - c5, mn5, mx5) u
        |ORDER BY column_name""".stripMargin) { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_partkey")
      val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"c_$c"), countDistinct(col(c)).as(s"d_$c"),
          round(min(col(c)).cast("double"), 6).as(s"mn_$c"),
          round(max(col(c)).cast("double"), 6).as(s"mx_$c"))
      }
      val one = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val stack = cols.map { c =>
        s"'$c', n, d_$c, n - c_$c, mn_$c, mx_$c"
      }.mkString(", ")
      one.selectExpr(s"stack(${cols.size}, $stack) AS " +
          "(column_name, n, ndv, n_null, vmin, vmax)")
        .orderBy("column_name")
    },

    // EXPECTATION SUITE — declarative data-quality gates (the
    // Deequ/Great-Expectations verb): a constraint set evaluated in
    // ONE pass, emitting (check, observed violation count, passed)
    // rows a pipeline can alert on before publishing a snapshot.
    // Checks: primary-key uniqueness, domain membership, numeric
    // range bounds, completeness, and referential integrity into
    // orders. Scale: every per-row predicate folds into a single
    // partial-aggregated scan of lineitem (one job, no matter how
    // many checks — adding a constraint adds a column, not a pass);
    // the referential check is a broadcast-able anti-join against
    // the keys side, counted in the same shape TPC-H's FK audit
    // would be. Both one-row frames broadcast into the stack.
    Q("q_expectations",
      """WITH m AS (SELECT count(*) AS n,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS pk_dup,
        |    count(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |               THEN 1 END) AS qty_oob,
        |    count(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |               THEN 1 END) AS disc_oob,
        |    count(CASE WHEN l_returnflag NOT IN ('A','N','R')
        |               THEN 1 END) AS flag_dom,
        |    count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS ship_null
        |  FROM lineitem),
        |fk AS (SELECT count(*) AS orphans FROM lineitem l
        |       WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_orderkey = l.l_orderkey))
        |SELECT t.check_name, t.violations, t.violations = 0 AS passed
        |FROM m, fk, LATERAL (VALUES
        |    ('completeness_shipdate', ship_null),
        |    ('domain_returnflag', flag_dom),
        |    ('fk_orderkey_orders', orphans),
        |    ('pk_unique_orderkey_linenumber', pk_dup),
        |    ('range_discount_0_0.1', disc_oob),
        |    ('range_quantity_1_50', qty_oob)) AS t(check_name, violations)
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val m = l.agg(
        (count(lit(1)) -
          countDistinct(col("l_orderkey"), col("l_linenumber"))).as("pk_dup"),
        count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
          .as("qty_oob"),
        count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1))
          .as("disc_oob"),
        count(when(!col("l_returnflag").isin("A", "N", "R"), 1))
          .as("flag_dom"),
        count(when(col("l_shipdate").isNull, 1)).as("ship_null"))
      val fk = l.join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      m.crossJoin(broadcast(fk))
        .selectExpr("stack(6, " +
          "'completeness_shipdate', ship_null, " +
          "'domain_returnflag', flag_dom, " +
          "'fk_orderkey_orders', orphans, " +
          "'pk_unique_orderkey_linenumber', pk_dup, " +
          "'range_discount_0_0.1', disc_oob, " +
          "'range_quantity_1_50', qty_oob) AS (check_name, violations)")
        .withColumn("passed", col("violations") === 0)
        .orderBy("check_name")
    },

    // SKYLINE (Pareto frontier) — the parts no other part strictly
    // dominates on (price ↓ better, size ↑ better): the multi-
    // objective shortlist operator (cheapest-per-capability sweep).
    // The oracle states dominance as NOT EXISTS; the Spark plan is
    // the DISTRIBUTED PREFIX-MAX, not an O(n²) self-join: a part is
    // dominated iff max{size : price' < price} ≥ size OR
    // max{size : price' = price} > size, and the strictly-smaller
    // prefix max computes exactly like q_pack_sequences' prefix sum
    // — distinct prices range-bucket into ≤1024 monotone shards,
    // each shard runs a PARTITIONED running max, and earlier-shard
    // maxima come from a triangular join over the ≤1024-row
    // per-shard frame. No partition-less window, no pair join; one
    // task never absorbs the table.
    Q("q_skyline",
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |         OR q.p_size > p.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin) { (s, d) =>
      val part = Tables.part(s, d)
      // Distinct-price frame: equal prices collapse so "rows before
      // me in price order" = "strictly smaller prices".
      val pr = part.groupBy("p_retailprice")
        .agg(max("p_size").as("eqmax"))
      val mm = pr.agg(min("p_retailprice").as("lo"),
        max("p_retailprice").as("hi"))
      val sh = pr.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(floor((col("p_retailprice") - col("lo")) /
              ((col("hi") - col("lo")) / 1024.0)), lit(1023.0))
              .cast("bigint")))
      // Per-shard maxima (≤1024 rows) → strictly-earlier-shard max
      // via the triangular join on the metadata-sized frame.
      val bm = sh.groupBy("bkt").agg(max("eqmax").as("bmax"))
      val pre = bm
        .join(broadcast(bm.select(col("bkt").as("obkt"),
          col("bmax").as("obmax"))), col("obkt") < col("bkt"), "left")
        .groupBy("bkt").agg(max("obmax").as("premax"))
      // Shard-local strictly-before running max (PARTITIONED window
      // over distinct prices) + the broadcast earlier-shard max.
      val w = Window.partitionBy("bkt").orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
      val strictMax = sh.join(broadcast(pre), "bkt")
        .withColumn("inshard", max("eqmax").over(w))
        .select(col("p_retailprice"), col("eqmax"),
          greatest(coalesce(col("inshard"), lit(Int.MinValue)),
            coalesce(col("premax"), lit(Int.MinValue))).as("strictmax"))
      part.join(broadcast(strictMax), "p_retailprice")
        .filter(!(col("strictmax") >= col("p_size") ||
          col("eqmax") > col("p_size")))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    },

    // ROBUST ANOMALY DETECTION — median-absolute-deviation outliers
    // per event_type: |x − median| > 3·1.4826·MAD (the robust-z
    // rule; 1.4826 scales MAD to σ under normality). Mean/stddev
    // would let the outliers mask themselves; the double median is
    // breakdown-point-0.5. Scale: two grouped exact medians (the
    // q_agg_median portability contract) with the tiny per-type
    // stats frames BROADCAST back onto the fact scan — at 100 TB
    // set `spark.graft.mad.approx=true` and the SAME plan runs
    // approx_percentile (bounded-memory GK sketch; exact percentile
    // is a TypedImperativeAggregate buffering every value per
    // group), keeping both joins broadcast. All boundary math runs
    // on identical double operands in both engines (constants
    // pinned through a decimal→double cast), so even the flag
    // boundary agrees — the oracle gate runs the exact default.
    Q("q_anomaly_mad",
      """WITH st AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |            FROM events GROUP BY event_type),
        |d AS (SELECT e.event_id, e.event_type, e.value,
        |        abs(e.value - st.med) AS dev
        |      FROM events e JOIN st USING (event_type)),
        |m AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |      FROM d GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value,
        |  CASE WHEN m.mad > 0
        |       THEN round(d.dev / (CAST(1.4826 AS DOUBLE) * m.mad), 6)
        |  END AS robust_z
        |FROM d JOIN m USING (event_type)
        |WHERE d.dev > CAST(4.4478 AS DOUBLE) * m.mad
        |ORDER BY event_type, event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val med = if (s.conf.get("spark.graft.mad.approx", "false").toBoolean)
        (c: String) => expr(s"approx_percentile($c, 0.5, 10000)")
      else (c: String) => expr(s"percentile($c, 0.5)")
      val st = ev.groupBy("event_type").agg(med("value").as("med"))
      val dv = ev.join(broadcast(st), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val md = dv.groupBy("event_type").agg(med("dev").as("mad"))
      dv.join(broadcast(md), "event_type")
        .filter(col("dev") > lit(4.4478) * col("mad"))
        .select(col("event_id"), col("event_type"), col("value"),
          when(col("mad") > 0,
            round(col("dev") / (lit(1.4826) * col("mad")), 6))
            .as("robust_z"))
        .orderBy("event_type", "event_id")
    },

    // EQUAL-FREQUENCY DISCRETIZATION — per-type decile binning of
    // the value column via BROADCAST boundary assignment: the
    // feature-engineering primitive that turns a continuous column
    // into a 10-level categorical (quantile binning). q_win_ntile
    // ranks every row through a window — a full per-type sort of
    // the fact table; THIS is the scale path: boundaries are a
    // group-count-sized exact-percentile aggregate computed once,
    // broadcast, and assignment is a scan-local 9-element fold —
    // the fact table is never sorted or windowed. Boundaries round
    // to 6dp BEFORE comparison (rounded-vs-rounded comparisons are
    // engine-identical; percentile ↔ quantile_cont parity per the
    // q_agg_median portability contract); a value exactly on a
    // boundary goes to the lower bucket by the strict > fold in
    // both engines.
    Q("q_discretize",
      s"""WITH b AS (SELECT event_type,
         |    [round(x, 6) for x in
         |     quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
         |                           0.6, 0.7, 0.8, 0.9])] AS qs
         |  FROM events GROUP BY 1),
         |a AS (SELECT e.event_type,
         |    len(list_filter(b.qs, q -> round(e.value, 6) > q)) AS bucket,
         |    e.value
         |  FROM events e JOIN b USING (event_type)),
         |g AS (SELECT event_type, bucket, count(*) AS n,
         |    ${dsumSql("value")} AS vsum FROM a GROUP BY 1, 2)
         |SELECT g.event_type, CAST(bucket AS INT) AS bucket, n, vsum,
         |  CASE WHEN bucket = 0 THEN NULL
         |       ELSE b.qs[CAST(bucket AS INT)] END AS lo,
         |  CASE WHEN bucket = 9 THEN NULL
         |       ELSE b.qs[CAST(bucket AS INT) + 1] END AS hi
         |FROM g JOIN b USING (event_type)
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("event_type", "value")
      val b = ev.groupBy("event_type").agg(expr(
        """transform(percentile(value, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D,
          |                                  0.6D, 0.7D, 0.8D, 0.9D)),
          |  x -> round(x, 6))""".stripMargin).as("qs"))
        .localCheckpoint(eager = false)
      ev.join(broadcast(b), "event_type")
        .select(col("event_type"),
          expr("size(filter(qs, q -> round(value, 6) > q))").as("bucket"),
          col("value"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
        .join(broadcast(b), "event_type")
        .selectExpr("event_type", "bucket", "n", "vsum",
          "CASE WHEN bucket = 0 THEN NULL" +
            " ELSE element_at(qs, bucket) END AS lo",
          "CASE WHEN bucket = 9 THEN NULL" +
            " ELSE element_at(qs, bucket + 1) END AS hi")
        .orderBy("event_type", "bucket")
    },

    // BENFORD FIRST-DIGIT AUDIT — leading-digit distribution of
    // order totals against Benford's law, with per-digit chi-square
    // contributions: the fraud/synthetic-data screen auditors run
    // over any organically-grown monetary or count column (a
    // fabricated column shows uniform-ish leading digits; an organic
    // multiplicative one follows log10(1+1/d)). Determinism: the
    // digit comes from INTEGER cents (floor(x·100 + 0.5) — floor is
    // IEEE-identical in both engines, never a round-tie) rendered
    // via integer-to-string (identical formatting both sides), and
    // the Benford probabilities are 12dp LITERALS shared by both
    // engines — no cross-engine log10 in the plan. Scale: ONE
    // partial-aggregated groupBy folds the scan to 9 digit rows;
    // the total re-aggregates THOSE 9 rows (no second scan) and
    // broadcasts back; the chi-square terms are scan-local
    // arithmetic on identical double operands.
    Q("q_benford",
      """WITH m AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |           AS cents FROM orders),
        |c AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT)
        |        AS digit, count(*) AS observed FROM m GROUP BY 1),
        |p AS (SELECT digit, observed,
        |    CAST(CASE digit
        |      WHEN 1 THEN 0.301029995664 WHEN 2 THEN 0.176091259056
        |      WHEN 3 THEN 0.124938736608 WHEN 4 THEN 0.096910013008
        |      WHEN 5 THEN 0.079181246048 WHEN 6 THEN 0.066946789631
        |      WHEN 7 THEN 0.057991946978 WHEN 8 THEN 0.051152522447
        |      ELSE 0.045757490561 END AS DOUBLE) AS benford_p,
        |    (SELECT sum(observed) FROM c) AS total FROM c)
        |SELECT digit, observed,
        |  round(CAST(observed AS DOUBLE) / total, 6) AS share,
        |  round(total * benford_p, 6) AS expected,
        |  round((observed - total * benford_p)
        |        * (observed - total * benford_p)
        |        / (total * benford_p), 6) AS chi2_term
        |FROM p ORDER BY digit""".stripMargin) { (s, d) =>
      val c = Tables.orders(s, d)
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("cents"))
        .select(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("observed"))
        .localCheckpoint(eager = false)
      val n = c.agg(sum("observed").as("total"))
      c.crossJoin(broadcast(n))
        .withColumn("benford_p", expr(
          """CAST(CASE digit WHEN 1 THEN 0.301029995664
            |  WHEN 2 THEN 0.176091259056 WHEN 3 THEN 0.124938736608
            |  WHEN 4 THEN 0.096910013008 WHEN 5 THEN 0.079181246048
            |  WHEN 6 THEN 0.066946789631 WHEN 7 THEN 0.057991946978
            |  WHEN 8 THEN 0.051152522447 ELSE 0.045757490561
            |END AS DOUBLE)""".stripMargin))
        .select(col("digit"), col("observed"),
          round(col("observed").cast("double") / col("total"), 6)
            .as("share"),
          round(col("total") * col("benford_p"), 6).as("expected"),
          round((col("observed") - col("total") * col("benford_p")) *
            (col("observed") - col("total") * col("benford_p")) /
            (col("total") * col("benford_p")), 6).as("chi2_term"))
        .orderBy("digit")
    },

    // HYPERLOGLOG REGISTERS — an EXPLICIT 64-register HLL sketch
    // (p=6) of distinct order custkeys, with the Flajolet raw
    // estimate and the linear-counting small-range correction.
    // q_agg_approx_distinct uses Spark's native HLL++ but its
    // binary sketch is opaque; exposing the registers is what makes
    // the sketch PORTABLE — register frames from different systems
    // / partitions / days merge by element-wise max, the
    // cross-system cardinality contract. Scale: the whole corpus
    // folds to 64 rows in ONE partial-aggregated groupBy(max) —
    // the mergeable-sketch shape; everything after is
    // constant-sized. The exact-distinct column is the local AUDIT
    // column (it is the full shuffle the sketch exists to avoid —
    // at 100 TB you drop it and keep the 64-row fold).
    // Determinism: rho comes from string length of bin() (exact
    // integer), Σ2^(−M_j) is computed as the exact BIGINT
    // Σ2^(55−M_j) via shiftleft, and the estimate is arithmetic on
    // exact operands written identically in both engines.
    Q("q_hll_registers",
      s"""WITH h AS (SELECT
         |    ${h60Duck("'hll#' || o_custkey")} AS h FROM orders),
         |r AS (SELECT h % 64 AS idx,
         |    CASE WHEN h // 64 = 0 THEN 55
         |         ELSE 55 - length(bin(h // 64)) END AS rho FROM h),
         |reg AS (SELECT g.idx, coalesce(max(r.rho), 0) AS m_j
         |  FROM (SELECT unnest(generate_series(0, 63)) AS idx) g
         |  LEFT JOIN r ON r.idx = g.idx GROUP BY g.idx),
         |a AS (SELECT
         |    CAST(sum(1::BIGINT << (55 - m_j)) AS BIGINT) AS s2,
         |    CAST(count(*) FILTER (m_j = 0) AS BIGINT) AS v_zero
         |  FROM reg),
         |ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
         |       AS n_exact FROM orders),
         |est AS (SELECT v_zero, n_exact,
         |    round(CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE)
         |          / 64) * 64 * 64 * power(2.0, 55) / s2, 6) AS est_raw
         |  FROM a CROSS JOIN ex)
         |SELECT 64 AS m, v_zero, est_raw,
         |  CASE WHEN est_raw <= 160.0 AND v_zero > 0
         |       THEN round(64 * ln(64.0 / v_zero), 6)
         |       ELSE est_raw END AS est,
         |  n_exact,
         |  round((CASE WHEN est_raw <= 160.0 AND v_zero > 0
         |         THEN round(64 * ln(64.0 / v_zero), 6)
         |         ELSE est_raw END - n_exact) / n_exact, 6) AS rel_err
         |FROM est""".stripMargin) { (s, d) =>
      val reg = Tables.orders(s, d)
        .select(expr(h60("concat('hll#', CAST(o_custkey AS STRING))"))
          .as("h"))
        .selectExpr("h % 64 AS idx",
          "CASE WHEN h DIV 64 = 0 THEN 55" +
            " ELSE 55 - length(bin(h DIV 64)) END AS rho")
        .groupBy("idx").agg(max("rho").as("m_j"))
      val full = s.range(64).select(col("id").as("idx"))
        .join(broadcast(reg), Seq("idx"), "left")
        .na.fill(Map("m_j" -> 0))
      val a = full.agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m_j AS INT))"))
          .cast("long").as("s2"),
        sum(when(col("m_j") === 0, 1L).otherwise(0L)).cast("long")
          .as("v_zero"))
      val ex = Tables.orders(s, d)
        .agg(countDistinct("o_custkey").cast("long").as("n_exact"))
      a.crossJoin(broadcast(ex))
        .selectExpr("v_zero", "n_exact",
          "round(CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE)" +
            " / 64) * 64 * 64 * power(2.0, 55) / s2, 6) AS est_raw")
        .selectExpr("CAST(64 AS INT) AS m", "v_zero", "est_raw",
          "CASE WHEN est_raw <= 160.0 AND v_zero > 0" +
            " THEN round(64 * ln(64.0 / v_zero), 6)" +
            " ELSE est_raw END AS est",
          "n_exact",
          "round((CASE WHEN est_raw <= 160.0 AND v_zero > 0" +
            " THEN round(64 * ln(64.0 / v_zero), 6)" +
            " ELSE est_raw END - n_exact) / n_exact, 6) AS rel_err")
    },
  )
}
