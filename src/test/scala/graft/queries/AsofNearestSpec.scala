package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan shape for q_join_asof_nearest at sf0.001: the
  * window formulation must equal a brute-force nearest-within-
  * tolerance recompute, including direction and tie preference. */
class AsofNearestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("asof_nearest: matches brute force on every event (direction, delta, tolerance)") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) AS os").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Math.floorDiv(r.getTimestamp(2).getTime, 1000L)))
    val out = SparkEntry.queries("q_join_asof_nearest")(spark, sf)
      .selectExpr("event_id",
        "unix_timestamp(CAST(nearest_od AS TIMESTAMP)) AS os",
        "delta_s", "side").collect()
    assert(out.length === events.length)
    val byId = out.map(r => r.getAs[Long]("event_id") -> r).toMap
    events.foreach { case (eid, uid, es) =>
      val cands = orders.getOrElse(uid, Array.empty[Long])
        .map(os => (math.abs(es - os) * 2 + (if (os > es) 1L else 0L), os))
        .filter(_._1 <= 2 * 259200L + 1)
      val r = byId(eid)
      if (cands.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("os")), s"event $eid")
        assert(r.isNullAt(r.fieldIndex("side")))
      } else {
        val (k, os) = cands.minBy(_._1)
        assert(r.getAs[Long]("os") === os, s"od @ $eid")
        assert(r.getAs[Long]("delta_s") === k / 2, s"delta @ $eid")
        assert(r.getAs[String]("side") ===
          (if (k % 2 == 1) "forward" else "backward"), s"side @ $eid")
      }
    }
  }

  test("asof_nearest: one window operator, one hash exchange, no joins") {
    val plan = SparkEntry.queries("q_join_asof_nearest")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      "both directions must ride the union+window, not a range join")
    assert("Window".r.findAllIn(plan).length === 1,
      "backward and forward frames must share one Window operator")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1)
  }
}
