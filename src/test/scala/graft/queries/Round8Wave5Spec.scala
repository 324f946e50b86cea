package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 fifth wave
  * (triangle counting / assortativity / path n-grams) at sf0.001 —
  * independent Scala recomputes plus the PLANS.md shuffle claims. */
class Round8Wave5Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def h28(sx: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  /** Undirected co-purchase edge list (u < v), optionally on the
    * tri# node sample — the test-side mirror of both graph ops'
    * edge derivation. */
  private def edges(sampled: Boolean): Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, p) => !sampled || h28(s"tri#$p") % 2 == 0 }
      .distinct
    li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
  }

  // --------------------------------------------------- triangles

  test("triangle_count: exact triangles of the sampled graph, brute-force checked") {
    val e = edges(sampled = true)
    val adj = (e.toSeq ++ e.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keySet
    val tri = e.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).size
    }.sum / 3L  // each triangle counted once per edge
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val r = SparkEntry.queries("q_triangle_count")(spark, sf).collect().head
    assert(r.getAs[Long]("nodes") === nodes.size.toLong)
    assert(r.getAs[Long]("edges") === e.size.toLong)
    assert(r.getAs[Long]("wedges") === wedges)
    assert(r.getAs[Long]("triangles") === tri)
    assert(r.getAs[Long]("est_triangles_full") === tri * 8)
    val c = 3.0 * tri / wedges
    assert(math.abs(r.getAs[Double]("clustering") - c) < 1e-6)
  }

  test("triangle_count: equi-joins only — no cartesian product, no window") {
    val plan = SparkEntry.queries("q_triangle_count")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the orientation/wedge predicates must not degrade to a cross join")
    assert(!plan.contains("Window"))
  }

  // ----------------------------------------------- assortativity

  test("assortativity: matches the Pearson degree correlation recomputed in Scala") {
    val e = edges(sampled = false)
    val deg = (e.toSeq ++ e.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val dir = e.toSeq.flatMap(p => Seq(p, (p._2, p._1)))
    val s1 = dir.size.toLong
    val sx = dir.map(p => deg(p._1)).sum
    val sxx = dir.map(p => deg(p._1) * deg(p._1)).sum
    val sxy = dir.map(p => deg(p._1) * deg(p._2)).sum
    val expected = (s1 * sxy - sx * sx).toDouble / (s1 * sxx - sx * sx)
    val r = SparkEntry.queries("q_assortativity")(spark, sf).collect().head
    assert(r.getAs[Long]("nodes") === deg.size.toLong)
    assert(r.getAs[Long]("edges") === e.size.toLong)
    assert(math.abs(r.getAs[Double]("assortativity") - expected) < 1e-6)
  }

  test("assortativity: moment fold carries no shuffle join") {
    val plan = SparkEntry.queries("q_assortativity")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "node-sized deg frames must broadcast onto the edge scan")
  }

  // ------------------------------------------------- path n-grams

  test("path_ngrams: top-20 3-paths match a Scala recompute") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val counts = ev.groupBy(_._1).values.flatMap { seq =>
      val s = seq.sortBy(e => (e._2, e._3)).map(_._4)
      s.sliding(3).filter(_.size == 3).map(w => (w(0), w(1), w(2)))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val out = SparkEntry.queries("q_path_ngrams")(spark, sf).collect()
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, ((a, b, c), n)) =>
      assert((r.getAs[String]("e1"), r.getAs[String]("e2"),
        r.getAs[String]("e3")) === ((a, b, c)))
      assert(r.getAs[Long]("n") === n.toLong)
    }
  }

  test("path_ngrams: both leads share one window, top-k is TakeOrdered") {
    val plan = SparkEntry.queries("q_path_ngrams")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length === 1,
      "both lead() offsets must ride the same window spec")
    assert(plan.contains("TakeOrderedAndProject"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2)
  }
}
