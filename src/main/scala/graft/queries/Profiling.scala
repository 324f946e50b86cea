package graft.queries

import org.apache.spark.sql.DataFrame
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

    // SPEARMAN RANK CORRELATION — the monotone-association twin of
    // q_corr_matrix's Pearson cells over the same three lineitem
    // column pairs: rank-based, so one wild value moves one rank
    // where it drags Pearson's moment sums arbitrarily (the
    // robust-stats member of the correlation family, next to
    // q_robust_scale/q_theil_sen in the outlier-immune column).
    // Ranks are AVERAGE ranks doubled into exact integers (a tie
    // group at min-rank r of size c has average rank r+(c−1)/2 —
    // the ×2 "double rank" 2·cum−c+1 stays a BIGINT; scaling both
    // variables by 2 cancels in the correlation). THE CORPUS IS
    // NEVER SERIALIZED THROUGH ONE TASK: each variable folds to its
    // distinct-VALUE frame, and because extendedprice is near-unique
    // (the value frame GROWS with rows — a naive global cumulative
    // window would be the single-task hazard GlobalWindowAuditSpec
    // polices), the rank map is the standard TWO-LEVEL distributed
    // prefix sum: range-partition the value frame, cumulative-count
    // WITHIN each partition (partition-keyed window), prefix-sum the
    // per-partition totals on the #partitions-row frame (the only
    // partition-less window — constant-bounded by the partition
    // count), and add the offset scan-locally. Ranks are
    // boundary-invariant (distinct values never straddle a range
    // boundary), so the sampled range split cannot move the result.
    // Rows get their ranks back via three value-keyed equi-joins;
    // moments fold in ONE partial aggregate with DECIMAL(38,0)
    // exact-integer sums (the q_corr_matrix stack idiom); ρ is the
    // identical final double expression in both engines.
    Q("q_spearman",
      """WITH qf AS (SELECT l_quantity AS v, CAST(count(*) AS BIGINT)
        |           AS c FROM lineitem GROUP BY 1),
        |qr AS (SELECT v, 2 * CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
        |       - c + 1 AS r2 FROM qf),
        |pf AS (SELECT l_extendedprice AS v, CAST(count(*) AS BIGINT)
        |       AS c FROM lineitem GROUP BY 1),
        |prm AS (SELECT v, 2 * CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
        |        - c + 1 AS r2 FROM pf),
        |df AS (SELECT l_discount AS v, CAST(count(*) AS BIGINT) AS c
        |       FROM lineitem GROUP BY 1),
        |dr AS (SELECT v, 2 * CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
        |       - c + 1 AS r2 FROM df),
        |r AS (SELECT qr.r2 AS rq, prm.r2 AS rp, dr.r2 AS rd
        |  FROM lineitem l
        |  JOIN qr ON qr.v = l.l_quantity
        |  JOIN prm ON prm.v = l.l_extendedprice
        |  JOIN dr ON dr.v = l.l_discount),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(rq AS DECIMAL(38,0))) AS sq,
        |    sum(CAST(rp AS DECIMAL(38,0))) AS sp,
        |    sum(CAST(rd AS DECIMAL(38,0))) AS sd,
        |    sum(CAST(rq AS DECIMAL(38,0)) * rq) AS sqq,
        |    sum(CAST(rp AS DECIMAL(38,0)) * rp) AS spp,
        |    sum(CAST(rd AS DECIMAL(38,0)) * rd) AS sdd,
        |    sum(CAST(rq AS DECIMAL(38,0)) * rp) AS sqp,
        |    sum(CAST(rq AS DECIMAL(38,0)) * rd) AS sqd,
        |    sum(CAST(rp AS DECIMAL(38,0)) * rd) AS spd
        |  FROM r),
        |p AS (SELECT pair, n, sx, sy, sxx, syy, sxy FROM (
        |  SELECT n,
        |    'quantity_extendedprice' AS pair, CAST(sq AS DOUBLE) AS sx,
        |    CAST(sp AS DOUBLE) AS sy, CAST(sqq AS DOUBLE) AS sxx,
        |    CAST(spp AS DOUBLE) AS syy, CAST(sqp AS DOUBLE) AS sxy
        |  FROM s
        |  UNION ALL SELECT n, 'quantity_discount', CAST(sq AS DOUBLE),
        |    CAST(sd AS DOUBLE), CAST(sqq AS DOUBLE), CAST(sdd AS DOUBLE),
        |    CAST(sqd AS DOUBLE) FROM s
        |  UNION ALL SELECT n, 'extendedprice_discount',
        |    CAST(sp AS DOUBLE), CAST(sd AS DOUBLE), CAST(spp AS DOUBLE),
        |    CAST(sdd AS DOUBLE), CAST(spd AS DOUBLE) FROM s) u)
        |SELECT pair, n,
        |  round((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS rho
        |FROM p ORDER BY pair""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select("l_quantity", "l_extendedprice", "l_discount")
        .localCheckpoint(eager = false)
      def rankMap(c: String): DataFrame = {
        val f = li.groupBy(col(c).as("v"))
          .agg(count(lit(1)).cast("long").as("cc"))
        val parts = f
          .repartitionByRange(li.sparkSession.sparkContext
            .defaultParallelism, col("v"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint(eager = false)
        val within = parts.withColumn("cum_in",
          sum("cc").over(Window.partitionBy("pid").orderBy("v"))
            .cast("long"))
        val offsets = parts.groupBy("pid")
          .agg(sum("cc").cast("long").as("pc"))
          .withColumn("off", coalesce(
            sum("pc").over(Window.orderBy("pid")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .cast("long"))
          .select("pid", "off")
        within.join(broadcast(offsets), "pid")
          .select(col("v"),
            (lit(2) * (col("cum_in") + col("off")) - col("cc") + 1)
              .as("r2"))
      }
      val r = li
        .join(broadcast(rankMap("l_quantity"))
          .withColumnRenamed("r2", "rq"), col("l_quantity") === col("v"))
        .drop("v")
        .join(rankMap("l_extendedprice").withColumnRenamed("r2", "rp"),
          col("l_extendedprice") === col("v"))
        .drop("v")
        .join(broadcast(rankMap("l_discount"))
          .withColumnRenamed("r2", "rd"), col("l_discount") === col("v"))
        .drop("v")
      def d0(c: String) = col(c).cast("decimal(38,0)")
      val sums = r.agg(count(lit(1)).cast("long").as("n"),
        sum(d0("rq")).as("sq"), sum(d0("rp")).as("sp"),
        sum(d0("rd")).as("sd"),
        sum(d0("rq") * col("rq")).as("sqq"),
        sum(d0("rp") * col("rp")).as("spp"),
        sum(d0("rd") * col("rd")).as("sdd"),
        sum(d0("rq") * col("rp")).as("sqp"),
        sum(d0("rq") * col("rd")).as("sqd"),
        sum(d0("rp") * col("rd")).as("spd"))
      val pairs = sums.selectExpr(
        """stack(3,
          |  'quantity_extendedprice', CAST(sq AS DOUBLE), CAST(sp AS DOUBLE),
          |    CAST(sqq AS DOUBLE), CAST(spp AS DOUBLE), CAST(sqp AS DOUBLE),
          |  'quantity_discount', CAST(sq AS DOUBLE), CAST(sd AS DOUBLE),
          |    CAST(sqq AS DOUBLE), CAST(sdd AS DOUBLE), CAST(sqd AS DOUBLE),
          |  'extendedprice_discount', CAST(sp AS DOUBLE), CAST(sd AS DOUBLE),
          |    CAST(spp AS DOUBLE), CAST(sdd AS DOUBLE), CAST(spd AS DOUBLE)
          |) AS (pair, sx, sy, sxx, syy, sxy)""".stripMargin, "n")
      pairs.select(col("pair"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                 (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("rho"))
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
      val ex =
        if (auditOn(s)) Tables.orders(s, d)
          .agg(countDistinct("o_custkey").cast("long").as("n_exact"))
        else s.sql("SELECT CAST(NULL AS BIGINT) AS n_exact")
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

    // KMV SKETCH — k-minimum-values (k=256) distinct sketches of the
    // 'F'-order and 'O'-order customer sets, with the SET-ALGEBRA
    // estimates HLL cannot give: union, Jaccard, and INTERSECTION
    // cardinality from the combined sketch (Beyer et al. 2007), each
    // audited against the exact count. q_hll_registers answers "how
    // many distinct" mergeably; KMV additionally answers "how much
    // do two sets OVERLAP" from sketch state alone — the cross-
    // dataset contamination / audience-overlap readout (merge = keep
    // the k smallest of the union; the same portable-state contract
    // as q_hll_registers / q_bloom_probe). Scale: each sketch is a
    // distinct fold + TakeOrderedAndProject(k) — per-partition heaps,
    // k rows to the driver side of the exchange, NEVER a global
    // sort; sketch-vs-sketch ops are ≤k-row broadcast joins. The
    // exact arms are the full shuffles the sketch avoids (AUDIT
    // columns, dropped at 100 TB). Determinism: md5-h60 hashes
    // (engine-portable, collision-free at these scales); estimates
    // are one double division of exact integer operands; 255·2⁶⁰ is
    // exactly representable (8 significant bits).
    Q("q_kmv_sketch", {
      val est = (mx: String, c: String, n: String) =>
        s"CASE WHEN $n <= 256 THEN CAST($n AS DOUBLE) ELSE " +
          s"round(CAST(255 AS DOUBLE) * 1152921504606846976 / $mx, 6) END"
      val estU = (mx: String, c: String) =>
        s"CASE WHEN $c < 256 THEN CAST($c AS DOUBLE) ELSE " +
          s"round(CAST(255 AS DOUBLE) * 1152921504606846976 / $mx, 6) END"
      s"""WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
         |       WHERE o_orderstatus = 'F'),
         |b AS (SELECT DISTINCT o_custkey AS k FROM orders
         |       WHERE o_orderstatus = 'O'),
         |ha AS (SELECT ${h60Duck("'kmv#' || k::VARCHAR")} AS h FROM a
         |       ORDER BY h LIMIT 256),
         |hb AS (SELECT ${h60Duck("'kmv#' || k::VARCHAR")} AS h FROM b
         |       ORDER BY h LIMIT 256),
         |hu AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
         |       ORDER BY h LIMIT 256),
         |sa AS (SELECT CAST(max(h) AS BIGINT) AS mxa,
         |       CAST(count(*) AS BIGINT) AS ca FROM ha),
         |sb AS (SELECT CAST(max(h) AS BIGINT) AS mxb,
         |       CAST(count(*) AS BIGINT) AS cb FROM hb),
         |su AS (SELECT CAST(max(h) AS BIGINT) AS mxu,
         |       CAST(count(*) AS BIGINT) AS cu FROM hu),
         |bo AS (SELECT CAST(count(*) AS BIGINT) AS n_both FROM hu
         |       JOIN ha USING (h) JOIN hb USING (h)),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b),
         |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM
         |       (SELECT k FROM a UNION SELECT k FROM b)),
         |ni AS (SELECT CAST(count(*) AS BIGINT) AS n_inter
         |       FROM a JOIN b USING (k)),
         |s1 AS (SELECT 256 AS k, n_a, n_b, n_union, n_inter, n_both,
         |    cu,
         |    ${est("mxa", "ca", "n_a")} AS est_a,
         |    ${est("mxb", "cb", "n_b")} AS est_b,
         |    ${estU("mxu", "cu")} AS est_union,
         |    round(CAST(n_both AS DOUBLE) / cu, 9) AS jaccard_est,
         |    round(CAST(n_inter AS DOUBLE) / n_union, 9) AS jaccard_exact
         |  FROM sa CROSS JOIN sb CROSS JOIN su CROSS JOIN bo
         |    CROSS JOIN na CROSS JOIN nb CROSS JOIN nu CROSS JOIN ni)
         |SELECT k, n_a, est_a, n_b, est_b, n_union, est_union,
         |  n_inter, round(jaccard_est * est_union, 6) AS est_inter,
         |  jaccard_est, jaccard_exact
         |FROM s1""".stripMargin
    }) { (s, d) =>
      val est = (mx: String, c: String, n: String) =>
        s"CASE WHEN $n <= 256 THEN CAST($n AS DOUBLE) ELSE " +
          s"round(CAST(255 AS DOUBLE) * 1152921504606846976 / $mx, 6) END"
      val estU = (mx: String, c: String) =>
        s"CASE WHEN $c < 256 THEN CAST($c AS DOUBLE) ELSE " +
          s"round(CAST(255 AS DOUBLE) * 1152921504606846976 / $mx, 6) END"
      def keys(status: String) = Tables.orders(s, d)
        .filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("k")).distinct()
        .localCheckpoint(eager = false)
      def sketch(df: org.apache.spark.sql.DataFrame) = df
        .select(expr(h60("concat('kmv#', CAST(k AS STRING))")).as("h"))
        .orderBy("h").limit(256).localCheckpoint(eager = false)
      val a = keys("F"); val b = keys("O")
      val ha = sketch(a); val hb = sketch(b)
      val hu = ha.union(hb).distinct().orderBy("h").limit(256)
        .localCheckpoint(eager = false)
      val sa = ha.agg(max("h").cast("long").as("mxa"),
        count(lit(1)).cast("long").as("ca"))
      val sb = hb.agg(max("h").cast("long").as("mxb"),
        count(lit(1)).cast("long").as("cb"))
      val su = hu.agg(max("h").cast("long").as("mxu"),
        count(lit(1)).cast("long").as("cu"))
      val bo = hu.join(ha, "h").join(hb, "h")
        .agg(count(lit(1)).cast("long").as("n_both"))
      // Exact arms (set sizes + exact Jaccard): NULL literals under
      // spark.graft.audit=false — the est_* CASEs then fall through
      // their NULL size predicate to the sketch estimate, which is
      // exactly the production readout.
      val (na, nb, nu, ni) =
        if (auditOn(s)) (
          a.agg(count(lit(1)).cast("long").as("n_a")),
          b.agg(count(lit(1)).cast("long").as("n_b")),
          a.union(b).distinct()
            .agg(count(lit(1)).cast("long").as("n_union")),
          a.join(b, "k")
            .agg(count(lit(1)).cast("long").as("n_inter")))
        else (
          s.sql("SELECT CAST(NULL AS BIGINT) AS n_a"),
          s.sql("SELECT CAST(NULL AS BIGINT) AS n_b"),
          s.sql("SELECT CAST(NULL AS BIGINT) AS n_union"),
          s.sql("SELECT CAST(NULL AS BIGINT) AS n_inter"))
      sa.crossJoin(broadcast(sb)).crossJoin(broadcast(su))
        .crossJoin(broadcast(bo)).crossJoin(broadcast(na))
        .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
        .crossJoin(broadcast(ni))
        .selectExpr("256 AS k", "n_a", "n_b", "n_union", "n_inter",
          "n_both", "cu",
          s"${est("mxa", "ca", "n_a")} AS est_a",
          s"${est("mxb", "cb", "n_b")} AS est_b",
          s"${estU("mxu", "cu")} AS est_union",
          "round(CAST(n_both AS DOUBLE) / cu, 9) AS jaccard_est",
          "round(CAST(n_inter AS DOUBLE) / n_union, 9) AS jaccard_exact")
        .selectExpr("k", "n_a", "est_a", "n_b", "est_b",
          "n_union", "est_union", "n_inter",
          "round(jaccard_est * est_union, 6) AS est_inter",
          "jaccard_est", "jaccard_exact")
    },

    // QUANTILE SKETCH — a 32-bin equal-width MERGEABLE histogram of
    // event value with interpolated p50/p90/p99 estimates, each
    // audited against the exact order statistic: the portable
    // quantile contract (q_agg_approx_quantile uses Spark's opaque
    // KLL-ish sketch; q_agg_histogram exposes the bins but not the
    // quantile READOUT; this closes the loop — bin counts merge by
    // element-wise ADD across days/systems, then any percentile
    // reads off the merged state — and REPORTS its own error).
    // Scale: the 1-row min/max frame broadcasts onto the scan; the
    // corpus folds to ≤32 cells in ONE partial-aggregated groupBy;
    // all quantile picks run on that constant frame. The exact arm
    // is the q_auc range-shard order-statistic (the full shuffle the
    // sketch avoids — AUDIT columns, dropped at 100 TB).
    // Determinism: values in exact integer micro space; k-th
    // positions via integer ceil (num·n+den−1)/den in exact double
    // floor; interpolation is a shared-text double chain on exact
    // integer operands rounded 6dp.
    Q("q_quantile_sketch", {
      val w = "(CAST(hi - lo AS DOUBLE) / 32)"
      val estE = s"CASE WHEN hi = lo THEN CAST(lo AS DOUBLE) ELSE " +
        s"CAST(lo AS DOUBLE) + $w * bin + $w * (kk - prevc) / cnt END"
      s"""WITH e AS (SELECT
         |    CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT) AS ym
         |  FROM events),
         |mm AS (SELECT CAST(min(ym) AS BIGINT) AS lo,
         |    CAST(max(ym) AS BIGINT) AS hi FROM e),
         |bb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
         |      least(31, CAST(floor(CAST(ym - lo AS DOUBLE)
         |        / (CAST(hi - lo AS DOUBLE) / 32)) AS BIGINT)) END AS bin
         |  FROM e CROSS JOIN mm),
         |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt
         |  FROM bb GROUP BY bin),
         |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM bins),
         |cum AS (SELECT bin, cnt,
         |    CAST(sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
         |  FROM bins),
         |q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
         |    ('p99', 99, 100)) AS t(label, num, den)),
         |kq AS (SELECT label,
         |    CAST(floor((num * n + den - 1) / CAST(den AS DOUBLE))
         |      AS BIGINT) AS kk
         |  FROM q CROSS JOIN n),
         |pick AS (SELECT label, kk, min(bin) AS bin FROM cum
         |  CROSS JOIN mm JOIN kq ON cc >= kk GROUP BY label, kk),
         |est AS (SELECT label, kk, p.bin, cnt,
         |    cc - cnt AS prevc, lo, hi
         |  FROM pick p JOIN cum USING (bin) CROSS JOIN mm),
         |g AS (SELECT ym, CAST(count(*) AS BIGINT) AS c
         |  FROM e GROUP BY ym),
         |gc AS (SELECT ym, CAST(sum(c) OVER (ORDER BY ym ROWS BETWEEN
         |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
         |  FROM g),
         |exact AS (SELECT label, CAST(min(ym) AS BIGINT) AS xm
         |  FROM gc JOIN kq ON cc >= kk GROUP BY label)
         |SELECT e2.label, e2.kk AS k_pos,
         |  round(($estE) / 1000000, 6) AS est,
         |  round(CAST(xm AS DOUBLE) / 1000000, 6) AS exact,
         |  round(abs(round(($estE) / 1000000, 6)
         |    - round(CAST(xm AS DOUBLE) / 1000000, 6)), 6) AS abs_err
         |FROM est e2 JOIN exact USING (label)
         |ORDER BY label""".stripMargin
    }) { (s, d) =>
      val wE = "(CAST(hi - lo AS DOUBLE) / 32)"
      val estE = s"CASE WHEN hi = lo THEN CAST(lo AS DOUBLE) ELSE " +
        s"CAST(lo AS DOUBLE) + $wE * bin + $wE * (kk - prevc) / cnt END"
      import s.implicits._
      val e = Tables.events(s, d)
        .select(
          expr("CAST(floor(round(value, 6) * 1000000 + 0.5) AS BIGINT)")
            .as("ym"))
        .localCheckpoint(eager = false)
      val mm = e.agg(min("ym").cast("long").as("lo"),
        max("ym").cast("long").as("hi"))
      val bins = e.crossJoin(broadcast(mm))
        .selectExpr("CASE WHEN hi = lo THEN 0 ELSE " +
          "least(31, CAST(floor(CAST(ym - lo AS DOUBLE)" +
          " / (CAST(hi - lo AS DOUBLE) / 32)) AS BIGINT)) END AS bin")
        .groupBy("bin").agg(count(lit(1)).cast("long").as("cnt"))
        .localCheckpoint(eager = false)
      val n = bins.agg(sum("cnt").cast("long").as("n"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = bins.withColumn("cc", sum("cnt").over(wc).cast("long"))
        .localCheckpoint(eager = false)
      val q = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
        .toDF("label", "num", "den")
      val kq = q.crossJoin(broadcast(n))
        .selectExpr("label",
          "CAST(floor((num * n + den - 1) / CAST(den AS DOUBLE))" +
            " AS BIGINT) AS kk")
        .localCheckpoint(eager = false)
      val pick = cum.join(broadcast(kq), col("cc") >= col("kk"))
        .groupBy("label", "kk").agg(min("bin").as("bin"))
      val estF = pick.join(cum, "bin")
        .withColumn("prevc", col("cc") - col("cnt"))
        .crossJoin(broadcast(mm))
      // exact arm: sharded order statistic over the distinct-value
      // frame (q_auc discipline — per-shard partitioned windows)
      val g = e.groupBy("ym").agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint(eager = false)
      val sh = g.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("ym") - col("lo")).cast("double") /
                ((col("hi") - col("lo")).cast("double") / 1024.0)),
              lit(1023.0)).cast("bigint")))
      val bt = sh.groupBy("bkt").agg(sum("c").cast("long").as("btc"))
      val pre = bt
        .join(broadcast(bt.select(col("bkt").as("ob"),
          col("btc").as("obc"))), col("ob") < col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obc"), lit(0L)).cast("long").as("prec"))
      val ws = Window.partitionBy("bkt").orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, 0)
      val gc = sh.join(broadcast(pre), "bkt")
        .withColumn("cc", (col("prec") + sum("c").over(ws)).cast("long"))
      val exact =
        if (auditOn(s)) gc.join(broadcast(kq), col("cc") >= col("kk"))
          .groupBy("label").agg(min("ym").cast("long").as("xm"))
        else kq.select(col("label"),
          lit(null).cast("long").as("xm"))
      estF.join(broadcast(exact), "label")
        .selectExpr("label", "kk AS k_pos",
          s"round(($estE) / 1000000, 6) AS est",
          "round(CAST(xm AS DOUBLE) / 1000000, 6) AS exact",
          s"round(abs(round(($estE) / 1000000, 6)" +
            " - round(CAST(xm AS DOUBLE) / 1000000, 6)), 6) AS abs_err")
        .orderBy("label")
    },

    // PARETO MASS CONCENTRATION — how many orders (counted from the
    // most valuable down) carry 50% / 90% / 99% of total order
    // value: the operational 80/20 readout (q_gini scores
    // inequality as ONE number; this answers the question a
    // capacity planner actually asks — "how FEW rows hold half the
    // mass", which sets cache sizes, hot-tier cutoffs, and review
    // queue depths). Scale: the q_auc fold + DESCENDING range-shard
    // prefix (the q_gains_curve shape) over the distinct-value
    // frame; threshold picks are ≤3-row broadcast joins against
    // that frame. Determinism: value mass in exact integer cents;
    // the crossing test cum·100 ≥ pct·total runs in EXACT BIGINT
    // space (DECIMAL at 100 TB); fractions are micro-int means.
    Q("q_pareto_mass",
      """WITH g AS (SELECT
        |    CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(s * c) AS BIGINT) AS total FROM g),
        |p AS (SELECT s, c, s * c AS mass,
        |    CAST(coalesce(sum(c) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |      AS BIGINT) AS crows,
        |    CAST(coalesce(sum(s * c) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |      AS BIGINT) AS cmass
        |  FROM g),
        |th AS (SELECT * FROM (VALUES (50), (90), (99)) AS v(pct)),
        |hit AS (SELECT pct, CAST(min(crows) AS BIGINT) AS rows_needed,
        |    CAST(max(s) AS BIGINT) AS cutoff_s
        |  FROM p JOIN th ON cmass * 100 >= pct * (SELECT total FROM t)
        |  GROUP BY pct)
        |SELECT pct, rows_needed,
        |  CAST(floor((2 * rows_needed * 1000000 + n) / (2.0 * n))
        |    / 1000000.0 AS DOUBLE) AS rows_frac,
        |  round(CAST(cutoff_s AS DOUBLE) / 100, 6) AS cutoff_value
        |FROM hit CROSS JOIN t ORDER BY pct""".stripMargin) { (s, d) =>
      val g = Tables.orders(s, d)
        .select(
          expr("CAST(floor(round(o_totalprice, 2) * 100 + 0.5) AS BIGINT)")
            .as("s"))
        .groupBy("s").agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint(eager = false)
      val t = g.agg(sum("c").cast("long").as("n"),
        sum(col("s") * col("c")).cast("long").as("total"))
        .localCheckpoint(eager = false)
      val mm = g.agg(min("s").as("lo"), max("s").as("hi"))
      val sh = g.crossJoin(broadcast(mm))
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("s") - col("lo")).cast("double") /
                ((col("hi") - col("lo")).cast("double") / 1024.0)),
              lit(1023.0)).cast("bigint")))
      val bt = sh.groupBy("bkt")
        .agg(sum("c").cast("long").as("btc"),
          sum(col("s") * col("c")).cast("long").as("btm"))
      val pre = bt
        .join(broadcast(bt.select(col("bkt").as("ob"),
          col("btc").as("obc"), col("btm").as("obm"))),
          col("ob") > col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obc"), lit(0L)).cast("long").as("prec"),
          coalesce(sum("obm"), lit(0L)).cast("long").as("prem"))
      val w = Window.partitionBy("bkt").orderBy(col("s").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val p = sh.join(broadcast(pre), "bkt")
        .withColumn("crows", (col("prec") + sum("c").over(w)).cast("long"))
        .withColumn("cmass",
          (col("prem") + sum(col("s") * col("c")).over(w)).cast("long"))
      import s.implicits._
      val th = Seq(50, 90, 99).toDF("pct")
      val hit = p.crossJoin(broadcast(t))
        .join(broadcast(th), col("cmass") * 100 >= col("pct") * col("total"))
        .groupBy("pct")
        .agg(min("crows").cast("long").as("rows_needed"),
          max("s").cast("long").as("cutoff_s"))
      hit.crossJoin(broadcast(t))
        .selectExpr("pct", "rows_needed",
          "CAST(floor((2 * rows_needed * 1000000 + n) / (2.0 * n))" +
            " / 1000000.0 AS DOUBLE) AS rows_frac",
          "round(CAST(cutoff_s AS DOUBLE) / 100, 6) AS cutoff_value")
        .orderBy("pct")
    },

    // SHUFFLE-SKEW AUDIT — per-candidate-key distribution of rows
    // over 32 hash buckets (the partition layout a
    // groupBy/join/repartition on that key would produce): bucket
    // min/max/mean and the max/mean SKEW RATIO per key — the
    // pre-flight a 100 TB pipeline runs BEFORE picking shuffle keys
    // (q_join_salted is the cure; this is the diagnosis — a skew
    // ratio near 1 means the key partitions evenly, a big one means
    // salting/AQE-skew-join is mandatory). Scale: ONE scan fans both
    // candidate keys via a 2-element explode, ONE partial-aggregated
    // groupBy to ≤64 cells, per-key rollup + windows on that
    // constant frame. Determinism: engine-portable md5 buckets,
    // exact integer counts, micro-int mean, one division rounded 6dp.
    Q("q_skew_audit",
      s"""WITH k AS (SELECT 'l_partkey' AS keyname,
         |    ${TextKit.h28Duck("'skew#' || l_partkey")} % 32 AS bucket
         |  FROM lineitem
         |  UNION ALL SELECT 'l_suppkey',
         |    ${TextKit.h28Duck("'skew#' || l_suppkey")} % 32
         |  FROM lineitem),
         |cell AS (SELECT keyname, bucket,
         |    CAST(count(*) AS BIGINT) AS rows_in FROM k GROUP BY 1, 2)
         |SELECT keyname, CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(min(rows_in) AS BIGINT) AS min_rows,
         |  CAST(max(rows_in) AS BIGINT) AS max_rows,
         |  CAST(floor((2 * sum(rows_in) * 1000000 + count(*))
         |    / (2.0 * count(*))) / 1000000.0 AS DOUBLE) AS mean_rows,
         |  round(CAST(max(rows_in) AS DOUBLE) * count(*)
         |    / sum(rows_in), 6) AS skew_ratio
         |FROM cell GROUP BY keyname ORDER BY keyname""".stripMargin) {
      (s, d) =>
      val k = Tables.lineitem(s, d)
        .select(explode(array(
          struct(lit("l_partkey").as("keyname"),
            (expr(TextKit.h28("concat('skew#', CAST(l_partkey AS STRING))"))
              % 32).as("bucket")),
          struct(lit("l_suppkey").as("keyname"),
            (expr(TextKit.h28("concat('skew#', CAST(l_suppkey AS STRING))"))
              % 32).as("bucket")))).as("kb"))
        .select(col("kb.keyname").as("keyname"),
          col("kb.bucket").as("bucket"))
      val cell = k.groupBy("keyname", "bucket")
        .agg(count(lit(1)).cast("long").as("rows_in"))
      cell.groupBy("keyname")
        .agg(count(lit(1)).cast("long").as("n_buckets"),
          min("rows_in").cast("long").as("min_rows"),
          max("rows_in").cast("long").as("max_rows"),
          expr("CAST(floor((2 * sum(rows_in) * 1000000 + count(*))" +
            " / (2.0 * count(*))) / 1000000.0 AS DOUBLE)").as("mean_rows"),
          expr("round(CAST(max(rows_in) AS DOUBLE) * count(*)" +
            " / sum(rows_in), 6)").as("skew_ratio"))
        .orderBy("keyname")
    },

    // FRESHNESS / COMPLETENESS AUDIT — the per-source data-quality
    // rollup an ingest pipeline alerts on: for each event_type, how
    // stale is its newest row vs the corpus high-water mark
    // (lag_s), how many distinct calendar days did it report
    // (days_active), and what fraction of the corpus's observed
    // span does that cover (coverage < 1 ⇒ the source went dark on
    // some days). The q_expectations sibling checks VALUES; this
    // checks ARRIVAL. Scale: ONE partial-aggregated groupBy folds
    // the fact scan to a |types|-row frame; the 1-row corpus
    // high-water frame broadcasts back (q_abtest discipline — the
    // fact table is scanned once, shuffled never). Determinism:
    // exact integer microseconds (unix_micros ↔ epoch_us), integer
    // day counts, one shared double division.
    Q("q_freshness_audit",
      """WITH g AS (SELECT max(epoch_us(ts)) AS gmax,
        |    date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
        |      + 1 AS span_days
        |  FROM events),
        |t AS (SELECT event_type, count(*) AS n,
        |    max(epoch_us(ts)) AS tmax,
        |    count(DISTINCT CAST(ts AS DATE)) AS days_active
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, days_active, span_days,
        |  round((gmax - tmax) / 1e6, 6) AS lag_s,
        |  round(CAST(days_active AS DOUBLE) / span_days, 6) AS coverage
        |FROM t CROSS JOIN g ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val g = ev.agg(max(expr("unix_micros(ts)")).as("gmax"),
        (datediff(max(col("ts").cast("date")),
          min(col("ts").cast("date"))) + 1).cast("long").as("span_days"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(expr("unix_micros(ts)")).as("tmax"),
          countDistinct(col("ts").cast("date")).as("days_active"))
        .crossJoin(broadcast(g))
        .select(col("event_type"), col("n"), col("days_active"),
          col("span_days"),
          round(expr("(gmax - tmax) / 1e6"), 6).as("lag_s"),
          round(expr("CAST(days_active AS DOUBLE) / span_days"), 6)
            .as("coverage"))
        .orderBy("event_type")
    },
  )
}
