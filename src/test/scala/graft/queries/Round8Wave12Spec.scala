package graft.queries

import java.math.{BigDecimal => JBD, RoundingMode}
import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 twelfth wave
  * (target encoding / window funnel / LOF) at sf0.001. */
class Round8Wave12Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def md5h28(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  // ------------------------------------------------ target encoding

  test("target_encoding: out-of-fold means match an exact recompute") {
    val rows = Tables.orders(spark, sf).selectExpr("o_orderkey",
      "o_orderpriority",
      "CAST(floor(round(o_totalprice, 6) * 1e6 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map { case (k, p, m) => (p, md5h28(s"fold#$k") % 5, m) }
    val out = SparkEntry.queries("q_target_encoding")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length * 5)
    out.foreach { r =>
      val (prio, fold) = (r.getString(0), r.getAs[Long]("fold"))
      val cell = rows.filter(x => x._1 == prio && x._2 == fold)
      val oof = rows.filter(x => x._1 == prio && x._2 != fold)
      assert(r.getAs[Long]("n_cell") === cell.length.toLong)
      assert(r.getAs[Long]("oof_n") === oof.length.toLong)
      val s = oof.map(x => BigInt(x._3)).sum
      val n = oof.length
      val enc = ((2 * s + n) / (2 * n)).toDouble / 1e6
      assert(r.getAs[Double]("encoding") === enc, s"enc @ $prio/$fold")
    }
    // The leak test: the encoding must NOT equal the with-fold mean
    // for at least some cells (they coincide only by fluke).
    val differs = out.count { r =>
      val (prio, _) = (r.getString(0), r.getAs[Long]("fold"))
      val all = rows.filter(_._1 == prio)
      val s = all.map(x => BigInt(x._3)).sum
      val full = ((2 * s + all.length) / (2 * all.length)).toDouble / 1e6
      r.getAs[Double]("encoding") != full
    }
    assert(differs > 0)
  }

  test("target_encoding: cells fold once, totals broadcast back") {
    val plan = SparkEntry.queries("q_target_encoding")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  // -------------------------------------------------- window funnel

  test("window_funnel: depths match a per-user 24h replay") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val depths = ev.groupBy(_._1).map { case (_, xs) =>
      val v = xs.filter(_._2 == "view").map(_._3)
      if (v.isEmpty) 0
      else {
        val t1 = v.min
        val dl = t1 + 24L * 3600 * 1000
        val c = xs.filter(x => x._2 == "click" && x._3 > t1 && x._3 <= dl)
          .map(_._3)
        if (c.isEmpty) 1
        else {
          val t2 = c.min
          val p = xs.filter(x =>
            x._2 == "purchase" && x._3 > t2 && x._3 <= dl)
          if (p.isEmpty) 2 else 3
        }
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = SparkEntry.queries("q_window_funnel")(spark, sf).collect()
      .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("users")).toMap
    assert(out === depths)
  }

  test("window_funnel: bounded depths never exceed q_funnel's") {
    val wf = SparkEntry.queries("q_window_funnel")(spark, sf).collect()
      .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("users")).toMap
    val f = SparkEntry.queries("q_funnel")(spark, sf).collect().head
    val reached2 = wf.filterKeys(_ >= 2).values.sum
    val reached3 = wf.getOrElse(3, 0L)
    assert(reached2 <= f.getAs[Long]("clicked"),
      "a 24h-bounded click count cannot exceed the unbounded one")
    assert(reached3 <= f.getAs[Long]("purchased"))
  }

  // ------------------------------------------------------------ lof

  test("lof: scores match an exact Scala recompute of the definition") {
    def r(x: Double, s: Int): JBD =
      new JBD(x).setScale(s, RoundingMode.HALF_UP)
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(x => (x.getLong(0), x.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += (a(i) - b(i)) * (a(i) - b(i)); i += 1 }
      r(acc, 6).doubleValue
    }
    val knn = vecs.map { case (a, av) =>
      a -> vecs.filter(_._1 != a)
        .map { case (b, bv) => (d2(av, bv), b) }.sorted.take(5)
    }.toMap
    val kdist = knn.map { case (a, ns) => a -> ns.map(_._1).max }
    val lrd = knn.map { case (a, ns) =>
      val s = ns.map { case (d, b) => r(math.max(d, kdist(b)), 6) }
        .foldLeft(JBD.ZERO)(_.add(_))
      a -> r(5.0 / s.doubleValue, 9).doubleValue
    }
    val lof = knn.map { case (a, ns) =>
      val sNano = ns.map { case (_, b) =>
        r(lrd(b) / lrd(a), 9).movePointRight(9)
      }.foldLeft(JBD.ZERO)(_.add(_)).longValueExact
      a -> r(((2 * sNano + 5) / 10).toDouble / 1e9, 6).doubleValue
    }
    val expect = lof.toSeq.map { case (id, v) => (-v, id) }.sorted.take(20)
      .map { case (nv, id) => (id, -nv) }
    val out = SparkEntry.queries("q_lof")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
    assert(out.toSeq === expect)
    out.foreach { case (_, v) => assert(v > 0.5 && v < 5, s"LOF $v sane") }
  }

  test("lof: post-kNN stages are edge-frame-sized, never pairwise") {
    val plan = SparkEntry.queries("q_lof")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1,
      "only the kNN stage may be pairwise; kd/lrd joins are key-equi")
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
