package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps.{drain, drainUpsert, eventsStream}

/** Streaming queries (SURVEY §2B streaming table) with exact batch
  * twins as oracles. See graft.streaming.StreamingOps for the
  * execution harness and the scale rationale.
  */
object Streaming {

  val qs: Seq[Q] = Seq(

    // Tumbling 1-hour windows (epoch-aligned, = date_trunc('hour')).
    Q("q_stream_tumbling",
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        val agg = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(col("window.start").as("ws"), col("event_type"),
            col("n"), col("total_value"))
        drain(s, agg, "update").orderBy("ws", "event_type")
    },

    // Sliding 1-hour windows every 15 minutes: each event lands in 4
    // windows; twin unrolls the 4 slide offsets per event.
    Q("q_stream_sliding",
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |x AS (SELECT time_bucket(INTERVAL '15 minutes', ts)
        |        - j * INTERVAL '15 minutes' AS ws, event_type, value
        |      FROM e CROSS JOIN range(4) t(j))
        |SELECT ws, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
        |FROM x GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        val agg = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(col("window.start").as("ws"), col("event_type"),
            col("n"), col("total_value"))
        drain(s, agg, "update").orderBy("ws", "event_type")
    },

    // Gap-based 30-minute sessions per user. Spark merges an event
    // into the open session iff its ts is STRICTLY inside
    // [prev_ts, prev_ts + gap) — the twin's lag-diff uses `<` to
    // match (SURVEY §7 "session gap-boundary semantics"). Session
    // windows only support APPEND output, which emits a session once
    // the watermark passes its end (last_ts + gap) — so the batch
    // twin applies the SAME watermark cutoff: sessions ending within
    // 40 minutes (gap + watermark delay) of the stream's max event
    // time are still open/unemitted and are excluded on both sides.
    // window.start = first event ts; the end is reported as max(ts)
    // (an aggregate) because Spark's window.end is last_ts + gap.
    Q("q_stream_session",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM e),
        |l AS (SELECT user_id, ts,
        |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |               < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS newsess
        |      FROM e),
        |g AS (SELECT user_id, ts,
        |        sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM l),
        |sess AS (SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
        |           count(*) AS n
        |         FROM g GROUP BY user_id, sid)
        |SELECT user_id, session_start, last_ts, n FROM sess, wm
        |WHERE last_ts + INTERVAL '30 minutes' < wm.w
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      val agg = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("last_ts"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("session_start"), col("last_ts"), col("n"))
      drain(s, agg, "append").orderBy("user_id", "session_start")
    },

    // Arbitrary stateful processing: a running per-user profile via
    // mapGroupsWithState (SURVEY §2B "stateful arbitrary" — the
    // reference's incremental store maintenance generalized). State =
    // (event count, id checksum, latest event time); all three folds
    // are order-independent (integer adds + max), so the final state
    // is deterministic regardless of arrival order and matches the
    // batch aggregate twin exactly.
    Q("q_stream_stateful",
      """SELECT user_id, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  max(CAST(ts AS TIMESTAMP)) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.GroupStateTimeout
      val ds = eventsStream(s, d)
        .select(col("user_id"), col("event_id"), col("ts"))
        .as[(Long, Long, java.sql.Timestamp)]
      val profiles = ds.groupByKey(_._1)
        .mapGroupsWithState[(Long, Long, java.sql.Timestamp),
          (Long, Long, Long, java.sql.Timestamp)](GroupStateTimeout.NoTimeout) {
          case (uid, rows, state) =>
            var st = state.getOption.getOrElse((0L, 0L, new java.sql.Timestamp(0L)))
            rows.foreach { case (_, eid, t) =>
              st = (st._1 + 1, st._2 + eid, if (t.after(st._3)) t else st._3)
            }
            state.update(st)
            (uid, st._1, st._2, st._3)
        }.toDF("user_id", "n", "id_sum", "last_ts")
      drain(s, profiles, "update").orderBy("user_id")
    },

    // Incremental upsert — the reference's ingest loop
    // (add_or_update_photo per new file, photo_vector_search.py:94 +
    // A7) as a first-class streaming operator: micro-batches fold
    // into a keyed snapshot via the foreachBatch latest-wins merge
    // (StreamingOps.drainUpsert). The batch twin is A7's
    // q_upsert_latest_wins window — on single-batch testdata they
    // coincide exactly; multi-batch convergence is unit-tested
    // (StreamingSpec "drainUpsert folds multiple micro-batches").
    Q("q_stream_upsert",
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |       round(value, 6) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                   ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val snap = drainUpsert(s,
        eventsStream(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("ts"), col("value")),
        keys = Seq("user_id", "event_type"),
        ord = Seq("ts", "event_id"))
      snap.select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), round(col("value"), 6).as("value"))
        .orderBy("user_id", "event_type")
    },

    // Stream-stream INNER join with watermarks + a time-range
    // condition: click→purchase attribution within 1 hour, the
    // canonical two-feed streaming join. Both sides carry a
    // watermark and the join predicate bounds p_ts to
    // [c_ts, c_ts + 1h], so the state store only retains each side
    // until the other's watermark passes the range (bounded state —
    // the property that makes the join runnable forever). Inner
    // joins emit in the processing batch (no watermark wait), so the
    // AvailableNow drain sees every pair and the batch twin is the
    // plain interval join. Both sides derive from ONE readStream
    // (Spark plans a dual scan); at 100 TB each side is its own
    // topic/feed and the same plan holds.
    Q("q_stream_join",
      """WITH c AS (SELECT user_id, event_id AS click_id,
        |             CAST(ts AS TIMESTAMP) AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |        CAST(ts AS TIMESTAMP) AS p_ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, click_id, purchase_id, c_ts, p_ts
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL '1 hour'
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin) { (s, d) =>
      val src = eventsStream(s, d)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "10 minutes")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("c_user").as("user_id"), col("click_id"),
          col("purchase_id"), col("c_ts"), col("p_ts"))
      drain(s, joined, "append")
        .orderBy("user_id", "click_id", "purchase_id")
    },

    // Streaming dedup: distinct (user_id, event_type) pairs within
    // the watermark via dropDuplicates — state-store dedup keyed on
    // the projected columns (projection first, so which physical row
    // survives is irrelevant and the result is deterministic).
    Q("q_stream_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val deduped = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .select(col("user_id"), col("event_type"), col("ts"))
        .dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      drain(s, deduped, "append").orderBy("user_id", "event_type")
    },

    // Streaming OHLC — the live twin of q_ohlc_resample (same oracle
    // SQL): hourly open/high/low/close bars maintained incrementally
    // in watermark-bounded state. open/close use the SAME zero-padded
    // epoch#event_id total-order key as the batch op, and min_by/
    // max_by/min/max/count/decimal-sum are all mergeable aggregates,
    // so each micro-batch folds into per-(window, type) state without
    // replay — the bar a dashboard reads mid-hour is exact for the
    // events the watermark has admitted.
    Q("q_stream_ohlc", Analytics.ohlcSql) { (s, d) =>
      val agg = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(min_by(col("value"), Analytics.ohlcKey).as("open"),
          max("value").as("high"), min("value").as("low"),
          max_by(col("value"), Analytics.ohlcKey).as("close"),
          count(lit(1)).as("volume"),
          dsum(col("value")).as("vsum"))
        .select(col("event_type"), col("window.start").as("bucket"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("vsum"))
      drain(s, agg, "update").orderBy("event_type", "bucket")
    },
  )
}
