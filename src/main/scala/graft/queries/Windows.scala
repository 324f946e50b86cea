package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function surface (SURVEY §2B): ranking, analytic lag/lead,
  * explicit frames, grouped top-k (the per-aspect generalization of
  * the reference's global top-k, A11).
  *
  * Scale notes: one shuffle per distinct (partitionBy, orderBy) spec;
  * specs here are shared within each query so Catalyst plans a single
  * Window exec. Running sums accumulate in DECIMAL — DuckDB evaluates
  * window aggregates with segment trees, so even "sequential" frames
  * add in a different order than Spark's streaming accumulation.
  */
object Windows {

  val qs: Seq[Q] = Seq(

    // Top-3 orders per customer with row_number / rank / dense_rank.
    Q("q_win_rank",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS price,
        |    row_number() OVER w AS rn, rank() OVER w AS rk,
        |    dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 6).alias("price"),
        row_number().over(w).alias("rn"),
        rank().over(w).alias("rk"),
        dense_rank().over(w).alias("drk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // lag/lead deltas per user over the event stream.
    Q("q_win_analytic",
      """SELECT event_id, user_id, round(value, 6) AS value,
        |  round(lag(value) OVER w, 6) AS prev_value,
        |  round(lead(value) OVER w, 6) AS next_value,
        |  round(value - lag(value) OVER w, 6) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        round(col("value"), 6).alias("value"),
        round(lag("value", 1).over(w), 6).alias("prev_value"),
        round(lead("value", 1).over(w), 6).alias("next_value"),
        round(col("value") - lag("value", 1).over(w), 6).alias("delta"))
        .orderBy("user_id", "event_id")
    },

    // Explicit frames: running total (unbounded preceding) + moving
    // 3-row average.
    // Frame sums ride the integer-micros form (msum discipline,
    // package.scala — native long adds per frame instead of a
    // Decimal128 object per row, bit-identical rounded output):
    // value ≤ ~330 with 2 dp, so even an unbounded running frame
    // sums exactly through ~10¹⁰ rows per user.
    Q("q_win_frame",
      """SELECT event_id, user_id,
        |  round(CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1000000, 6) AS running,
        |  round(CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1000000
        |    / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val runW = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val movW = base.rowsBetween(-2, Window.currentRow)
      val micros = round(col("value") * lit(1000000L), 0).cast("long")
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        round(sum(micros).over(runW).cast("double") / lit(1000000L), 6)
          .alias("running"),
        round(sum(micros).over(movW).cast("double") / lit(1000000L)
          / count(lit(1)).over(movW), 6).alias("mov_avg"))
        .orderBy("user_id", "event_id")
    },

    // Time-RANGE window frame: trailing-1-hour sum per user, ordered
    // by event time. Unlike the ROWS frames above, the frame is
    // defined in VALUE space (ts intervals), so tied timestamps are
    // peers and the result is order-independent within ties — the
    // frame type streaming-adjacent analytics actually need. DECIMAL
    // accumulation keeps the sliding sum exact on both engines.
    Q("q_win_range_frame",
      """SELECT event_id, user_id,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,6)))
        |    OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |          RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 6) AS trail_1h
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).selectExpr("event_id", "user_id",
        """round(CAST(sum(CAST(value AS DECIMAL(38,6)))
          |  OVER (PARTITION BY user_id ORDER BY ts
          |        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |  AS DOUBLE), 6) AS trail_1h""".stripMargin)
        .orderBy("user_id", "event_id")
    },

    // Grouped top-k: 2 longest docs per language (A11 per aspect).
    Q("q_topk_group",
      """SELECT * FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents
        |) WHERE rn <= 2 ORDER BY lang, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d).select(
        col("lang"), col("doc_id"), col("n_chars"),
        row_number().over(w).alias("rn"))
        .filter(col("rn") <= 2)
        .orderBy("lang", "rn")
    },

    // Quartile bucketing per priority class (ntile — equal-height
    // binning for stratified sampling / training-data splits). The
    // window order carries a unique tiebreak key so bucket boundaries
    // are engine-stable.
    Q("q_win_ntile",
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).alias("quartile"))
        .orderBy("o_orderkey")
    },
  )
}
