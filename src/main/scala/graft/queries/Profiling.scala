package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

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
  )
}
