package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import TextKit.{h28, h28Duck}

/** Round-13 inference wave: the rank-based / assumption-light tests
  * and causal estimators that complete the stats suite —
  * Mann–Whitney and Kruskal–Wallis (the nonparametric twins of
  * q_abtest / q_anova), Levene (the variance-homogeneity gate ANOVA
  * itself assumes), partial correlation (the confounder-adjusted
  * member of the correlation family), the IV/Wald LATE estimator
  * (the fourth causal identification strategy next to q_abtest /
  * q_ate_strata / q_match_att / q_did), and a lag-1 Granger test
  * (predictive precedence on the daily series).
  *
  * Scale design notes (100 TB posture):
  *  - The rank tests NEVER sort the corpus: each folds to its
  *    distinct-VALUE frame (bounded by the 2 dp value domain,
  *    ≤ ~33 k cells at any corpus size — the q_emd_drift bound,
  *    policed by GlobalWindowAuditSpec) and double-ranks 2·cum−c+1
  *    stay exact BIGINTs (the q_spearman idiom).
  *  - Everything else is one or two partial-aggregated conditional
  *    folds to a constant-size frame; final statistics are identical
  *    double chains over exact integer / DECIMAL moments.
  */
object RankStats {

  /** Exact half-up integer-micros mean (package.scala mean-rounding
    * caveat), as BIGINT micros: floor((2·S_micro + n) / (2n)). */
  private def microMean(sMicro: String, n: String): String =
    s"CAST(floor((2 * $sMicro + $n) / (2.0 * $n)) AS BIGINT)"

  val qs: Seq[Q] = Seq(

    // MANN–WHITNEY U — the rank-sum two-sample test of view vs click
    // values: distribution-free, so one wild value moves one rank
    // where it drags q_abtest's Welch t arbitrarily (the
    // nonparametric member of the A/B family; q_ks_test compares the
    // CDFs' sup-gap, this tests stochastic dominance). Ranks are
    // AVERAGE ranks doubled into exact integers over the
    // distinct-VALUE frame (2·cum−c+1 — the q_spearman double-rank),
    // with the normal approximation's tie-corrected variance
    // σ² = n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1))). Scale: corpus → value
    // frame in ONE conditional fold (bounded by the 2 dp value
    // domain); the cumulative window runs over THAT frame only
    // (GlobalWindowAuditSpec-documented); rank sums are
    // DECIMAL(38,0)-exact. Determinism: everything is exact integers
    // until one identical double chain; σ = 0 (all values tied)
    // yields NULL z via nullif on both engines.
    Q("q_mann_whitney",
      """WITH v AS (SELECT value AS x,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS ca,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS cb
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY value),
        |r AS (SELECT ca, cb, ca + cb AS c,
        |    2 * CAST(sum(ca + cb) OVER (ORDER BY x) AS BIGINT)
        |      - (ca + cb) + 1 AS r2
        |  FROM v),
        |s AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
        |    CAST(sum(cb) AS BIGINT) AS n2,
        |    sum(CAST(ca AS DECIMAL(38,0)) * r2) AS rs2,
        |    sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tie
        |  FROM r)
        |SELECT n1 AS n_view, n2 AS n_click,
        |  round((CAST(rs2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
        |    / CAST(2 AS DOUBLE), 6) AS u_view,
        |  round(((CAST(rs2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
        |      / CAST(2 AS DOUBLE)
        |      - CAST(n1 AS DOUBLE) * n2 / CAST(2 AS DOUBLE))
        |    / nullif(sqrt(CAST(n1 AS DOUBLE) * n2 / CAST(12 AS DOUBLE)
        |      * ((CAST(n1 + n2 AS DOUBLE) + 1)
        |        - CAST(tie AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
        |          * (n1 + n2 - 1)))), 0), 6) AS z
        |FROM s""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .groupBy(col("value").as("x"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("ca"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("cb"))
        .localCheckpoint(eager = false) // bounded distinct-value frame
      val r = v
        .withColumn("c", col("ca") + col("cb"))
        .withColumn("r2",
          lit(2) * sum(col("c")).over(Window.orderBy("x")).cast("long")
            - col("c") + 1)
      def d0(c: String) = col(c).cast("decimal(38,0)")
      r.agg(sum("ca").cast("long").as("n1"),
          sum("cb").cast("long").as("n2"),
          sum(d0("ca") * col("r2")).as("rs2"),
          sum(d0("c") * col("c") * col("c") - col("c")).as("tie"))
        .selectExpr("n1 AS n_view", "n2 AS n_click",
          """round((CAST(rs2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
            |  / CAST(2 AS DOUBLE), 6) AS u_view""".stripMargin,
          """round(((CAST(rs2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
            |    / CAST(2 AS DOUBLE)
            |    - CAST(n1 AS DOUBLE) * n2 / CAST(2 AS DOUBLE))
            |  / nullif(sqrt(CAST(n1 AS DOUBLE) * n2 / CAST(12 AS DOUBLE)
            |    * ((CAST(n1 + n2 AS DOUBLE) + 1)
            |      - CAST(tie AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
            |        * (n1 + n2 - 1)))), 0), 6) AS z""".stripMargin)
    },

    // KRUSKAL–WALLIS H — the k-group rank test across all five event
    // types: the nonparametric twin of q_anova's omnibus F (does ANY
    // group's value distribution differ), valid under the
    // non-normal / heteroskedastic shapes ANOVA's F assumes away.
    // H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1), tie-corrected by
    // 1 − Σ(t³−t)/(N³−N). Scale: ONE (value, type) conditional fold,
    // the value frame re-aggregated for total counts and ranks
    // (bounded by the 2 dp value domain — GlobalWindowAuditSpec), a
    // value-keyed equi-join hands double-ranks back to the
    // (value, type) cells, and the per-type fold is k rows.
    // Determinism: DECIMAL(38,0) rank sums; per-type H terms round
    // 9 dp into a DECIMAL sum; N³ runs in DOUBLE (never a BIGINT
    // cube — overflow-safe at any N); identical final double chain.
    Q("q_kruskal_wallis",
      """WITH vt AS (SELECT value AS x, event_type,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY value, event_type),
        |vf AS (SELECT x, CAST(sum(cnt) AS BIGINT) AS c
        |  FROM vt GROUP BY x),
        |r AS (SELECT x,
        |    2 * CAST(sum(c) OVER (ORDER BY x) AS BIGINT) - c + 1 AS r2,
        |    c
        |  FROM vf),
        |g AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
        |    sum(CAST(cnt AS DECIMAL(38,0)) * r2) AS rs2
        |  FROM vt JOIN r USING (x) GROUP BY event_type),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
        |    sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tie
        |  FROM vf),
        |hs AS (SELECT CAST(sum(CAST(round(
        |      (CAST(rs2 AS DOUBLE) / 2) * (CAST(rs2 AS DOUBLE) / 2) / n,
        |      9) AS DECIMAL(38,9))) AS DOUBLE) AS hsum FROM g),
        |ht AS (SELECT
        |    CAST(12 AS DOUBLE) / (CAST(nn AS DOUBLE) * (nn + 1)) * hsum
        |      - 3 * (CAST(nn AS DOUBLE) + 1) AS h,
        |    1 - CAST(tie AS DOUBLE)
        |      / nullif(CAST(nn AS DOUBLE) * nn * nn - nn, 0) AS tc
        |  FROM t CROSS JOIN hs)
        |SELECT event_type, n,
        |  round(CAST(rs2 AS DOUBLE) / (CAST(2 AS DOUBLE) * n), 6)
        |    AS mean_rank,
        |  round(h, 6) AS h,
        |  round(h / nullif(tc, 0), 6) AS h_tie
        |FROM g CROSS JOIN ht ORDER BY event_type""".stripMargin) { (s, d) =>
      val vt = Tables.events(s, d)
        .groupBy(col("value").as("x"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .localCheckpoint(eager = false) // bounded (value, type) frame
      val vf = vt.groupBy("x").agg(sum("cnt").cast("long").as("c"))
        .localCheckpoint(eager = false)
      val r = vf.withColumn("r2",
        lit(2) * sum(col("c")).over(Window.orderBy("x")).cast("long")
          - col("c") + 1)
      def d0(c: String) = col(c).cast("decimal(38,0)")
      val g = vt.join(broadcast(r.select("x", "r2")), "x")
        .groupBy("event_type")
        .agg(sum("cnt").cast("long").as("n"),
          sum(d0("cnt") * col("r2")).as("rs2"))
      val t = vf.agg(sum("c").cast("long").as("nn"),
        sum(d0("c") * col("c") * col("c") - col("c")).as("tie"))
      val hs = g.agg(sum(round((col("rs2").cast("double") / 2)
          * (col("rs2").cast("double") / 2) / col("n"), 9)
          .cast(DecimalType(38, 9))).cast("double").as("hsum"))
      val ht = t.crossJoin(hs).selectExpr(
        """CAST(12 AS DOUBLE) / (CAST(nn AS DOUBLE) * (nn + 1)) * hsum
          |  - 3 * (CAST(nn AS DOUBLE) + 1) AS h""".stripMargin,
        """1 - CAST(tie AS DOUBLE)
          |  / nullif(CAST(nn AS DOUBLE) * nn * nn - nn, 0) AS tc""".stripMargin)
      g.crossJoin(broadcast(ht))
        .selectExpr("event_type", "n",
          "round(CAST(rs2 AS DOUBLE) / (CAST(2 AS DOUBLE) * n), 6)" +
            " AS mean_rank",
          "round(h, 6) AS h",
          "round(h / nullif(tc, 0), 6) AS h_tie")
        .orderBy("event_type")
    },

    // LEVENE'S TEST (mean-centered) — variance homogeneity across
    // the five event types: the assumption gate for q_anova itself
    // (its F is only calibrated under equal group variances; Levene
    // runs the same one-way F on the absolute deviations |y − ȳ_j|,
    // which is robust to non-normality). Scale: fold 1 folds the
    // corpus to per-type exact-micro means (k rows, broadcast back);
    // the deviations are SCAN-LOCAL exact BIGINT micros (never a
    // second shuffle of raw rows beyond the type-keyed fold 2); the
    // ANOVA algebra runs on the k-row frame in micro units (W is a
    // variance RATIO — the 10⁶ scale cancels exactly). Determinism:
    // deviations are integer micro subtractions; SSB/SSW terms round
    // 9 dp into DECIMAL sums; identical final double chain.
    Q("q_levene",
      s"""WITH m AS MATERIALIZED (SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
         |      AS BIGINT) AS sm
         |  FROM events GROUP BY event_type),
         |mm AS (SELECT event_type,
         |    ${microMean("sm", "n")} AS m6 FROM m),
         |z AS (SELECT e.event_type,
         |    abs(CAST(round(e.value * 1000000, 0) AS BIGINT) - mm.m6)
         |      AS z6
         |  FROM events e JOIN mm USING (event_type)),
         |zg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(z6 AS DECIMAL(38,0))) AS s,
         |    sum(CAST(z6 AS DECIMAL(38,0)) * z6) AS q
         |  FROM z GROUP BY event_type),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(s) AS DOUBLE) AS stot FROM zg),
         |g AS (SELECT event_type, n, nn, k,
         |    CAST(s AS DOUBLE) AS sd_, CAST(q AS DOUBLE) AS qd_,
         |    round(n * (CAST(s AS DOUBLE) / n - stot / nn)
         |      * (CAST(s AS DOUBLE) / n - stot / nn), 9) AS ssb_term,
         |    round(CAST(q AS DOUBLE)
         |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 9) AS ssw_term
         |  FROM zg CROSS JOIN t),
         |w AS (SELECT
         |    CAST(sum(CAST(ssb_term AS DECIMAL(38,9))) AS DOUBLE) AS ssb,
         |    CAST(sum(CAST(ssw_term AS DECIMAL(38,9))) AS DOUBLE) AS ssw
         |  FROM g)
         |SELECT event_type, n,
         |  round(sd_ / n / CAST(1000000 AS DOUBLE), 6) AS mean_absdev,
         |  k - 1 AS df1, nn - k AS df2,
         |  round(((nn - k) * ssb) / nullif((k - 1) * ssw, 0), 6) AS w_stat
         |FROM g CROSS JOIN w ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val m = ev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(round(col("value") * 1000000L, 0).cast("long"))
            .cast("long").as("sm"))
        .selectExpr("event_type", "n", s"${microMean("sm", "n")} AS m6")
      val z = ev.join(broadcast(m.select("event_type", "m6")), "event_type")
        .select(col("event_type"),
          abs(round(col("value") * 1000000L, 0).cast("long") - col("m6"))
            .as("z6"))
      def d0(c: String) = col(c).cast("decimal(38,0)")
      val zg = z.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(d0("z6")).as("s"),
          sum(d0("z6") * col("z6")).as("q"))
        .localCheckpoint(eager = false)
      val t = zg.agg(sum("n").cast("long").as("nn"),
        count(lit(1)).cast("long").as("k"),
        sum("s").cast("double").as("stot"))
      val g = zg.crossJoin(broadcast(t))
        .selectExpr("event_type", "n", "nn", "k",
          "CAST(s AS DOUBLE) AS sd_", "CAST(q AS DOUBLE) AS qd_",
          """round(n * (CAST(s AS DOUBLE) / n - stot / nn)
            |  * (CAST(s AS DOUBLE) / n - stot / nn), 9) AS ssb_term""".stripMargin,
          """round(CAST(q AS DOUBLE)
            |  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 9) AS ssw_term""".stripMargin)
        .localCheckpoint(eager = false)
      val w = g.agg(
        sum(col("ssb_term").cast(DecimalType(38, 9))).cast("double").as("ssb"),
        sum(col("ssw_term").cast(DecimalType(38, 9))).cast("double").as("ssw"))
      g.crossJoin(broadcast(w))
        .selectExpr("event_type", "n",
          "round(sd_ / n / CAST(1000000 AS DOUBLE), 6) AS mean_absdev",
          "k - 1 AS df1", "nn - k AS df2",
          "round(((nn - k) * ssb) / nullif((k - 1) * ssw, 0), 6) AS w_stat")
        .orderBy("event_type")
    },

    // PARTIAL CORRELATION — each lineitem measure pair's Pearson r
    // with the THIRD measure held fixed: r_xy.z = (r_xy − r_xz·r_yz)
    // / √((1−r_xz²)(1−r_yz²)) — the confounder-adjusted member of
    // the correlation family (q_corr_matrix reports raw association;
    // this asks whether it survives conditioning — the difference
    // between "price correlates with discount" and "only through
    // quantity"). Scale: the SAME single exact-DECIMAL moment fold
    // as q_corr_matrix (one partial-aggregated scan, constant-size
    // reshape after). Determinism: the three raw r's and the partial
    // transform are one identical double chain over exact decimal
    // sums; a degenerate conditioning variable (|r_xz| = 1) yields
    // NULL via nullif.
    Q("q_partial_corr",
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
        |r AS (SELECT n,
        |    (n * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
        |      / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |           * (n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS rqp,
        |    (n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
        |      / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |           * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS rqd,
        |    (n * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
        |      / sqrt((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
        |           * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS rpd
        |  FROM s),
        |p AS (SELECT n,
        |    'quantity_extendedprice_given_discount' AS pair,
        |    rqp AS rxy, rqd AS rxz, rpd AS ryz FROM r
        |  UNION ALL SELECT n, 'quantity_discount_given_extendedprice',
        |    rqd, rqp, rpd FROM r
        |  UNION ALL SELECT n, 'extendedprice_discount_given_quantity',
        |    rpd, rqp, rqd FROM r)
        |SELECT pair, n, round(rxy, 6) AS r_raw,
        |  round((rxy - rxz * ryz)
        |    / nullif(sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 0), 6)
        |    AS r_partial
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
      val r = sums.selectExpr("n",
        """(n * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
          |  / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
          |       * (n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS rqp""".stripMargin,
        """(n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
          |  / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
          |       * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS rqd""".stripMargin,
        """(n * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
          |  / sqrt((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
          |       * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS rpd""".stripMargin)
      r.selectExpr(
        """stack(3,
          |  'quantity_extendedprice_given_discount', rqp, rqd, rpd,
          |  'quantity_discount_given_extendedprice', rqd, rqp, rpd,
          |  'extendedprice_discount_given_quantity', rpd, rqp, rqd
          |) AS (pair, rxy, rxz, ryz)""".stripMargin, "n")
        .selectExpr("pair", "n", "round(rxy, 6) AS r_raw",
          """round((rxy - rxz * ryz)
            |  / nullif(sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 0), 6)
            |  AS r_partial""".stripMargin)
        .orderBy("pair")
    },

    // IV / WALD ESTIMATOR — the encouragement-design LATE: with a
    // deterministic hash-half instrument over users, the local
    // average treatment effect of purchases (treatment x) on click
    // spend (outcome y) is the ratio of intent-to-treat effects
    // LATE = (ȳ₁−ȳ₀)/(x̄₁−x̄₀) — the fourth causal identification
    // strategy (q_abtest randomizes, q_ate_strata reweights,
    // q_match_att matches, q_did uses panel timing; IV uses an
    // EXOGENOUS push). The op's first-class output is the FIRST
    // STAGE itself: with a pure-hash instrument the true first
    // stage is ≈ 0, the weak-instrument trap every IV user must
    // check before reading the ratio — itt_x is reported and a
    // vanishing one NULLs the LATE via nullif (the spec plants a
    // real first stage to pin the arithmetic). Scale: one user-level
    // conditional fold (user frame), one 2-arm fold of THAT frame,
    // constant-size algebra after. Determinism: md5-parity arms, all
    // means exact half-up integer micros, one identical double chain.
    Q("q_iv_wald",
      s"""WITH u AS (SELECT user_id,
         |    ${h28Duck("'iv#' || user_id")} % 2 AS z,
         |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
         |      AS x,
         |    CAST(coalesce(sum(CAST(round(value * 1000000, 0) AS BIGINT))
         |      FILTER (event_type = 'click'), 0) AS BIGINT) AS y6
         |  FROM events GROUP BY user_id),
         |a AS (SELECT z, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y6) AS BIGINT) AS sy6
         |  FROM u GROUP BY z),
         |w AS (SELECT
         |    max(CASE WHEN z = 1 THEN n END) AS n1,
         |    max(CASE WHEN z = 0 THEN n END) AS n0,
         |    max(CASE WHEN z = 1 THEN ${microMean("sx * 1000000", "n")} END) AS mx1,
         |    max(CASE WHEN z = 0 THEN ${microMean("sx * 1000000", "n")} END) AS mx0,
         |    max(CASE WHEN z = 1 THEN ${microMean("sy6", "n")} END) AS my1,
         |    max(CASE WHEN z = 0 THEN ${microMean("sy6", "n")} END) AS my0
         |  FROM a)
         |SELECT n1 AS n_enc, n0 AS n_ctl,
         |  round(CAST(mx1 AS DOUBLE) / 1000000, 6) AS mean_x_enc,
         |  round(CAST(mx0 AS DOUBLE) / 1000000, 6) AS mean_x_ctl,
         |  round(CAST(mx1 - mx0 AS DOUBLE) / 1000000, 6) AS itt_x,
         |  round(CAST(my1 - my0 AS DOUBLE) / 1000000, 6) AS itt_y,
         |  round(CAST(my1 - my0 AS DOUBLE)
         |    / nullif(CAST(mx1 - mx0 AS DOUBLE), 0), 6) AS late
         |FROM w""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("x"),
          coalesce(sum(when(col("event_type") === "click",
            round(col("value") * 1000000L, 0).cast("long"))), lit(0L))
            .cast("long").as("y6"))
        .withColumn("z",
          expr(h28("concat('iv#', CAST(user_id AS STRING))")) % 2)
      val a = u.groupBy("z")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("x").cast("long").as("sx"),
          sum("y6").cast("long").as("sy6"))
      a.agg(
          max(when(col("z") === 1, col("n"))).as("n1"),
          max(when(col("z") === 0, col("n"))).as("n0"),
          max(when(col("z") === 1,
            expr(microMean("sx * 1000000", "n")))).as("mx1"),
          max(when(col("z") === 0,
            expr(microMean("sx * 1000000", "n")))).as("mx0"),
          max(when(col("z") === 1, expr(microMean("sy6", "n")))).as("my1"),
          max(when(col("z") === 0, expr(microMean("sy6", "n")))).as("my0"))
        .selectExpr("n1 AS n_enc", "n0 AS n_ctl",
          "round(CAST(mx1 AS DOUBLE) / 1000000, 6) AS mean_x_enc",
          "round(CAST(mx0 AS DOUBLE) / 1000000, 6) AS mean_x_ctl",
          "round(CAST(mx1 - mx0 AS DOUBLE) / 1000000, 6) AS itt_x",
          "round(CAST(my1 - my0 AS DOUBLE) / 1000000, 6) AS itt_y",
          """round(CAST(my1 - my0 AS DOUBLE)
            |  / nullif(CAST(mx1 - mx0 AS DOUBLE), 0), 6) AS late""".stripMargin)
    },

    // GRANGER PRECEDENCE (lag-1) — do yesterday's views predict
    // today's clicks beyond what yesterday's clicks already do?
    // OLS of c_t on (c_{t−1}, v_{t−1}) vs the AR(1)-restricted
    // model; the F for the added regressor is the classic
    // Granger-causality read on the daily series (q_rolling_corr
    // watches CONTEMPORANEOUS co-movement; q_did needs a treatment —
    // this is the observational lead/lag screen). Scale: the corpus
    // folds to the calendar-day frame in ONE conditional fold; lag
    // and moment algebra run on that ≤366-row frame
    // (GlobalWindowAuditSpec-documented); both model fits are CLOSED
    // FORMS of one DECIMAL(38,0)-exact moment fold — no iteration,
    // no matrix solver. Determinism: daily counts are exact BIGINTs,
    // moments exact decimals, and both engines evaluate one
    // identical double chain; degenerate series (zero variance)
    // yield NULLs via nullif.
    Q("q_granger",
      """WITH day AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |l AS (SELECT d, c AS y,
        |    lag(c) OVER (ORDER BY d) AS x1,
        |    lag(v) OVER (ORDER BY d) AS x2
        |  FROM day),
        |f AS (SELECT y, x1, x2 FROM l WHERE x1 IS NOT NULL),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(x1 AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(x2 AS DECIMAL(38,0))) AS s2,
        |    sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
        |    sum(CAST(x1 AS DECIMAL(38,0)) * x1) AS s11,
        |    sum(CAST(x2 AS DECIMAL(38,0)) * x2) AS s22,
        |    sum(CAST(x1 AS DECIMAL(38,0)) * y) AS s1y,
        |    sum(CAST(x2 AS DECIMAL(38,0)) * y) AS s2y,
        |    sum(CAST(x1 AS DECIMAL(38,0)) * x2) AS s12
        |  FROM f),
        |m AS (SELECT n,
        |    n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
        |    n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
        |    n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
        |    n * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
        |    n * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
        |    n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12
        |  FROM s),
        |b AS (SELECT n, cyy, c11, c1y,
        |    (c22 * c1y - c12 * c2y) / nullif(c11 * c22 - c12 * c12, 0) AS b1,
        |    (c11 * c2y - c12 * c1y) / nullif(c11 * c22 - c12 * c12, 0) AS b2,
        |    c2y
        |  FROM m),
        |rss AS (SELECT n, b1, b2,
        |    cyy - b1 * c1y - b2 * c2y AS rssf,
        |    cyy - c1y * c1y / nullif(c11, 0) AS rssr,
        |    cyy
        |  FROM b)
        |SELECT n AS n_days,
        |  round(b1, 6) AS beta_lag_clicks,
        |  round(b2, 6) AS beta_lag_views,
        |  round((rssr - rssf) * (n - 3) / nullif(rssf, 0), 6) AS f_stat,
        |  round(1 - rssf / nullif(cyy, 0), 6) AS r2_full,
        |  round(1 - rssr / nullif(cyy, 0), 6) AS r2_restricted
        |FROM rss""".stripMargin) { (s, d) =>
      val day = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("c"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("v"))
        .localCheckpoint(eager = false) // calendar-bounded day frame
      val w = Window.orderBy("d")
      val f = day
        .withColumn("x1", lag("c", 1).over(w))
        .withColumn("x2", lag("v", 1).over(w))
        .filter(col("x1").isNotNull)
        .select(col("c").as("y"), col("x1"), col("x2"))
      def d0(c: String) = col(c).cast("decimal(38,0)")
      val sums = f.agg(count(lit(1)).cast("long").as("n"),
        sum(d0("y")).as("sy"), sum(d0("x1")).as("s1"),
        sum(d0("x2")).as("s2"),
        sum(d0("y") * col("y")).as("syy"),
        sum(d0("x1") * col("x1")).as("s11"),
        sum(d0("x2") * col("x2")).as("s22"),
        sum(d0("x1") * col("y")).as("s1y"),
        sum(d0("x2") * col("y")).as("s2y"),
        sum(d0("x1") * col("x2")).as("s12"))
      sums.selectExpr("n",
          "n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy",
          "n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11",
          "n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22",
          "n * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y",
          "n * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y",
          "n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12")
        .selectExpr("n", "cyy", "c11", "c1y", "c2y",
          "(c22 * c1y - c12 * c2y) / nullif(c11 * c22 - c12 * c12, 0) AS b1",
          "(c11 * c2y - c12 * c1y) / nullif(c11 * c22 - c12 * c12, 0) AS b2")
        .selectExpr("n", "b1", "b2",
          "cyy - b1 * c1y - b2 * c2y AS rssf",
          "cyy - c1y * c1y / nullif(c11, 0) AS rssr", "cyy")
        .selectExpr("n AS n_days",
          "round(b1, 6) AS beta_lag_clicks",
          "round(b2, 6) AS beta_lag_views",
          "round((rssr - rssf) * (n - 3) / nullif(rssf, 0), 6) AS f_stat",
          "round(1 - rssf / nullif(cyy, 0), 6) AS r2_full",
          "round(1 - rssr / nullif(cyy, 0), 6) AS r2_restricted")
    })
}
