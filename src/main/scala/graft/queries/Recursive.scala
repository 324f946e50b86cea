package graft.queries

import graft.Tables

/** Recursive-CTE operator (WITH RECURSIVE landed in Spark 4): walk
  * each user's event chain from its first event, one recursion level
  * per hop. Iterative graph/hierarchy traversal as ONE declarative
  * query — the reference's only iteration is its Python ingest loop;
  * at engine level this is the shape BOM explosions, org rollups,
  * and lineage walks take.
  *
  * Scale posture: each recursion level is a hash join keyed on
  * (user_id, event_id) against the (small, windowed) edge list —
  * work per level is proportional to the frontier, and the explicit
  * depth < 20 cap bounds the plan on both engines identically (a
  * production walk caps depth or converges; unbounded recursion over
  * 100 TB is a bug, not a feature). The edge list itself comes from
  * one lead() window pass, not the recursion.
  */
object Recursive {

  private def chainSql(eventsRel: String, tsExpr: String): String =
    s"""WITH RECURSIVE
       |nxt AS (SELECT user_id, event_id,
       |    lead(event_id) OVER (PARTITION BY user_id
       |      ORDER BY $tsExpr, event_id) AS next_id
       |  FROM $eventsRel WHERE user_id < 5),
       |seed AS (SELECT user_id, event_id, 1 AS depth FROM (
       |    SELECT user_id, event_id,
       |      row_number() OVER (PARTITION BY user_id
       |        ORDER BY $tsExpr, event_id) AS rn
       |    FROM $eventsRel WHERE user_id < 5) f WHERE rn = 1),
       |chain AS (
       |  SELECT user_id, event_id, depth FROM seed
       |  UNION ALL
       |  SELECT n.user_id, n.next_id, c.depth + 1
       |  FROM chain c JOIN nxt n
       |    ON c.user_id = n.user_id AND c.event_id = n.event_id
       |  WHERE n.next_id IS NOT NULL AND c.depth < 20)
       |SELECT user_id, event_id, depth FROM chain
       |ORDER BY user_id, depth""".stripMargin

  val qs: Seq[Q] = Seq(
    // Oracle orders by the micros-truncated timestamp (CAST) so tie
    // order matches the engine's normalized event times exactly.
    // Engine-side structure differs from the oracle's single
    // statement in two deliberate ways (same results, measured 5.4 s
    // → sub-second at sf0.1):
    //  1. the windowed edge list and the seed are MATERIALIZED
    //     (cache()) before the recursion — a non-recursive CTE
    //     referenced inside the recursive step is otherwise
    //     re-evaluated at every level, turning one window pass over
    //     events into twenty;
    //  2. a child session with few shuffle partitions — every level
    //     schedules one task per partition and the frontier is ~5
    //     rows, so 32-wide shuffles would be pure scheduling
    //     overhead (same right-sizing as StreamingOps.eventsStream).
    // Work per level is then genuinely ∝ frontier, which is the
    // property that lets the walk run at any corpus size.
    Q("q_cte_recursive",
      chainSql("events", "CAST(ts AS TIMESTAMP)")) { (s, d) =>
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE re-optimizes every recursion level for a ~5-row frontier
      // (measured +1 s over 20 levels) — static planning wins here.
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      graft.Sessions.prepare(ss)
      Tables.events(ss, d).createOrReplaceTempView("graft_events_rec")
      ss.sql(
        """SELECT user_id, event_id,
          |  lead(event_id) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id) AS next_id
          |FROM graft_events_rec WHERE user_id < 5""".stripMargin)
        .cache().createOrReplaceTempView("graft_nxt_rec")
      ss.sql(
        """SELECT user_id, event_id, 1 AS depth FROM (
          |  SELECT user_id, event_id,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS rn
          |  FROM graft_events_rec WHERE user_id < 5) f WHERE rn = 1""".stripMargin)
        .cache().createOrReplaceTempView("graft_seed_rec")
      ss.sql(
        """WITH RECURSIVE chain AS (
          |  SELECT user_id, event_id, depth FROM graft_seed_rec
          |  UNION ALL
          |  SELECT n.user_id, n.next_id, c.depth + 1
          |  FROM chain c JOIN graft_nxt_rec n
          |    ON c.user_id = n.user_id AND c.event_id = n.event_id
          |  WHERE n.next_id IS NOT NULL AND c.depth < 20)
          |SELECT user_id, event_id, depth FROM chain
          |ORDER BY user_id, depth""".stripMargin)
    },
  )
}
