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
    Q("q_cte_recursive",
      chainSql("events", "CAST(ts AS TIMESTAMP)")) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("graft_events_rec")
      s.sql(chainSql("graft_events_rec", "ts"))
    },
  )
}
