package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan shape for q_hits at sf0.001: the 3-iteration
  * mutual-reinforcement scores must match an exact Scala recompute
  * of the same rounded-arithmetic chain, and the loop must never
  * shuffle-join the node-sized score frames. */
class HitsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("hits: scores match a Scala recompute of the rounded L2 power iteration") {
    val e = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val parts = e.map(_._1).distinct.sorted
    val supps = e.map(_._2).distinct.sorted
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var a = supps.map(_ -> r12(1.0 / math.sqrt(supps.length))).toMap
    var h = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val hr = e.groupBy(_._1).map { case (p, es) =>
        // Exact DECIMAL(38,12) sums of already-12dp values ≡ double
        // sums here (each term has ≤12dp; magnitudes keep the sum
        // exact in BigDecimal space).
        p -> es.map(x => BigDecimal(a(x._2))).sum.toDouble
      }
      val hn = math.sqrt(hr.values.map(v => BigDecimal(r12(v * v))).sum
        .toDouble)
      h = hr.map { case (p, v) => p -> r12(v / hn) }
      val ar = e.groupBy(_._2).map { case (sid, es) =>
        sid -> es.map(x => BigDecimal(h(x._1))).sum.toDouble
      }
      val an = math.sqrt(ar.values.map(v => BigDecimal(r12(v * v))).sum
        .toDouble)
      a = ar.map { case (sid, v) => sid -> r12(v / an) }
    }
    val out = SparkEntry.queries("q_hits")(spark, sf).collect()
    assert(out.length === math.min(20, supps.length)
      + math.min(20, parts.length))
    out.foreach { r =>
      val id = r.getAs[Long]("node_id")
      val want = if (r.getAs[String]("side") == "authority") a(id) else h(id)
      assert(math.abs(r.getAs[Double]("score") - want) < 1e-9,
        s"${r.getAs[String]("side")} @ $id")
    }
    // Each side's emitted list is the true top-20 of its score map.
    val topA = a.toSeq.sortBy { case (id, v) => (-v, id) }.take(20).map(_._1)
    assert(out.filter(_.getAs[String]("side") == "authority")
      .map(_.getAs[Long]("node_id")).toSet === topA.toSet)
  }

  test("hits: half-steps broadcast the node-sized frames") {
    val plan = SparkEntry.queries("q_hits")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "score frames must broadcast into the edge join")
  }
}
