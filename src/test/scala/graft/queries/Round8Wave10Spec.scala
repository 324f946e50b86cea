package graft.queries

import java.math.{BigDecimal => JBD, RoundingMode}
import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 tenth wave
  * (k-means / precedence mining / Poisson bootstrap) at sf0.001. */
class Round8Wave10Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    new JBD(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  // -------------------------------------------------------- kmeans

  test("kmeans: (cid, n, sse) matches an exact Scala Lloyd recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    // Sequential fold, exactly the engine's zip_with/aggregate order.
    def d2(v: Array[Double], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += (v(i) - c(i)) * (v(i) - c(i)); i += 1 }
      r6(acc)
    }
    def assign(cents: Map[Int, Array[Double]]) = vecs.map { case (id, v) =>
      val best = cents.toSeq.map { case (cid, c) => (d2(v, c), cid) }.min
      (id, v, best._2, best._1)
    }
    var cents = vecs.filter(_._1 < 8)
      .map { case (id, v) => id.toInt -> v }.toMap
    for (_ <- 1 to 2) {
      cents = assign(cents).groupBy(_._3).map { case (cid, xs) =>
        val n = xs.length
        cid -> Array.tabulate(64) { p =>
          val s = xs.map(x => new JBD(x._2(p))
            .setScale(12, RoundingMode.HALF_UP))
            .foldLeft(JBD.ZERO)(_.add(_))
          r6(s.doubleValue / n)
        }
      }
    }
    val expect = assign(cents).groupBy(_._3).map { case (cid, xs) =>
      val sse = xs.map(x => new JBD(x._4).setScale(6, RoundingMode.HALF_UP))
        .foldLeft(JBD.ZERO)(_.add(_)).doubleValue
      (cid, xs.length.toLong, r6(sse))
    }.toSet
    val out = SparkEntry.queries("q_kmeans")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === expect)
    // .toSeq first: summing over the Set would collapse equal sizes.
    assert(out.toSeq.map(_._2).sum === vecs.length.toLong)
  }

  test("kmeans: centroids broadcast into every pass, no shuffle join") {
    val plan = SparkEntry.queries("q_kmeans")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the k-row centroid frame must broadcast into the assignment scans")
  }

  // ---------------------------------------------------- precedence

  test("precedence: matches an exact first-occurrence recompute") {
    val firsts = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getTimestamp(2)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    val types = firsts.keys.map(_._2).toSeq.distinct.sorted
    val users = firsts.keys.map(_._1).toSeq.distinct
    val out = SparkEntry.queries("q_precedence")(spark, sf).collect()
    assert(out.length === types.combinations(2).length)
    out.foreach { r =>
      val (t1, t2) = (r.getString(0), r.getString(1))
      assert(t1 < t2, "one row per unordered pair, keyed t1 < t2")
      val both = users.filter(u =>
        firsts.contains((u, t1)) && firsts.contains((u, t2)))
      val before = both.count(u =>
        firsts((u, t1)).before(firsts((u, t2))))
      assert(r.getAs[Long]("n_both") === both.length.toLong)
      assert(r.getAs[Long]("n_before") === before.toLong)
      val z = (before - both.length / 2.0) / math.sqrt(both.length / 4.0)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    }
  }

  // ------------------------------------------------- bootstrap ci

  test("bootstrap_ci: replicas and CI match an exact hash recompute") {
    def md5h28(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    val thresholds = Array(98751885L, 197503771L, 246879713L,
      263338361L, 267453023L, 268275955L)
    def wgt(h: Long): Long = {
      val i = thresholds.indexWhere(h < _)
      if (i < 0) 6L else i.toLong
    }
    val orders = Tables.orders(spark, sf).selectExpr("o_orderkey",
      "o_orderpriority",
      "CAST(floor(round(o_totalprice, 6) * 1e6 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def intMean(s: BigInt, n: Long): Double =
      ((2 * s + n) / (2 * n)).toDouble / 1e6
    val out = SparkEntry.queries("q_bootstrap_ci")(spark, sf).collect()
    assert(out.length === orders.map(_._2).distinct.length)
    out.foreach { r =>
      val prio = r.getString(0)
      val grp = orders.filter(_._2 == prio)
      assert(r.getAs[Long]("n") === grp.length.toLong)
      assert(r.getAs[Double]("mean") ===
        intMean(grp.map(x => BigInt(x._3)).sum, grp.length.toLong))
      val ms = (1 to 32).flatMap { b =>
        val ws = grp.map(x => (wgt(md5h28(s"boot#$b#${x._1}")), x._3))
        val n = ws.map(_._1).sum
        if (n == 0) None
        else Some(intMean(ws.map(x => BigInt(x._1) * x._2).sum, n))
      }.sorted
      def pct(p: Double): Double = {
        val rank = p * (ms.length - 1)
        val lo = rank.toInt
        val g = rank - lo
        val v = if (lo + 1 < ms.length) ms(lo) * (1 - g) + ms(lo + 1) * g
                else ms(lo)
        r6(v)
      }
      assert(r.getAs[Double]("ci_lo") === pct(0.025), s"ci_lo @ $prio")
      assert(r.getAs[Double]("ci_hi") === pct(0.975), s"ci_hi @ $prio")
      assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
      assert(r.getAs[Double]("mean") > r.getAs[Double]("ci_lo") &&
        r.getAs[Double]("mean") < r.getAs[Double]("ci_hi"),
        "32 same-distribution replicas should bracket the sample mean")
    }
  }

  test("bootstrap_ci: one pass — replicas fold map-side, no self-join") {
    val plan = SparkEntry.queries("q_bootstrap_ci")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastHashJoin"),
      "the 5-row real-means frame joins the replica means broadcast")
  }
}
