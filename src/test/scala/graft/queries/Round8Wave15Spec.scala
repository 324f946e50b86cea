package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 fifteenth wave
  * (PSI drift / rank-1 ALS / modularity) at sf0.001. */
class Round8Wave15Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  // ------------------------------------------------------------ psi

  test("psi: bins, smoothed terms, and total match an exact replay") {
    val rows = Tables.events(spark, sf)
      .selectExpr("unix_timestamp(ts)", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val t0 = rows.map(_._1).min; val t1 = rows.map(_._1).max
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    def bin(v: Double): Long =
      if (hi == lo) 0L
      else math.min(math.floor((v - lo) / ((hi - lo) / 10.0)).toLong, 9L)
    val cells = rows.groupBy { case (t, v) =>
      (if (2 * (t - t0) < (t1 - t0)) 0 else 1, bin(v))
    }.map { case (k, v) => k -> v.size.toLong }
    val bins = cells.keys.map(_._2).toSet
    val cp = bins.map(b => b -> (cells.getOrElse((0, b), 0L) + 1)).toMap
    val cq = bins.map(b => b -> (cells.getOrElse((1, b), 0L) + 1)).toMap
    val np = cp.values.sum.toDouble; val nq = cq.values.sum.toDouble
    val terms = bins.map { b =>
      b -> round9((cp(b) / np - cq(b) / nq) *
        math.log(cp(b) * nq / (cq(b) * np)))
    }.toMap
    val total = round9(terms.values.map(BigDecimal(_)).sum.toDouble)
    val out = SparkEntry.queries("q_psi")(spark, sf).collect()
    assert(out.length === bins.size)
    out.foreach { r =>
      val b = r.getLong(0)
      assert(r.getAs[Long]("n_ref") === cp(b) - 1)
      assert(r.getAs[Long]("n_cur") === cq(b) - 1)
      assert(r.getAs[Double]("psi_term") === terms(b), s"term @ bin $b")
      assert(r.getAs[Double]("psi_total") === total)
    }
    // PSI of a stationary-ish fixture is finite and non-negative-ish;
    // the invariant that must hold exactly: total = Σ terms.
  }

  // ------------------------------------------------------------ als

  test("als_rank1: factors match an exact two-iteration replay") {
    val ratings = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_custkey", "l_partkey", "CAST(l_quantity AS BIGINT)")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    def round12(x: Double): Double =
      new java.math.BigDecimal(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue
    def half(byKey: Map[(Long, Long), Long], f: Map[Long, Double],
        keyOf: ((Long, Long)) => Long, otherOf: ((Long, Long)) => Long)
        : Map[Long, Double] =
      byKey.toSeq.groupBy(t => keyOf(t._1)).map { case (k, es) =>
        val num = es.map { case (e, r) =>
          BigDecimal(round12(r * f(otherOf(e)))) }.sum
        val den = es.map { case (e, _) =>
          val x = f(otherOf(e)); BigDecimal(round12(x * x)) }.sum
        k -> round12(num.toDouble / den.toDouble)
      }
    val v0 = ratings.keys.map(_._2).toSet.map((p: Long) => p -> 1.0).toMap
    val u1 = half(ratings, v0, _._1, _._2)
    val v1 = half(ratings, u1, _._2, _._1)
    val u2 = half(ratings, v1, _._1, _._2)
    val v2 = half(ratings, u2, _._2, _._1)
    val expTop = u2.toSeq.sortBy { case (c, u) => (-u, c) }.take(20)
    val expTops = v2.toSeq.sortBy { case (p, v) => (-v, p) }.take(20)
    val out = SparkEntry.queries("q_als_rank1")(spark, sf).collect()
    val gotC = out.filter(_.getString(0) == "customer")
      .map(r => (r.getLong(1), r.getDouble(2)))
    val gotP = out.filter(_.getString(0) == "part")
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(gotC.toSeq.sortBy(t => (-t._2, t._1)) === expTop)
    assert(gotP.toSeq.sortBy(t => (-t._2, t._1)) === expTops)
  }

  test("als_rank1: factor joins broadcast — no SortMergeJoin") {
    val plan = SparkEntry.queries("q_als_rank1")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  // ----------------------------------------------------- modularity

  test("modularity: community terms match an exact replay") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brand = Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val m = edges.size.toLong
    val el = edges.toSeq.map { case (u, v) => (brand(u), brand(v)) }
    val mIn = el.filter(t => t._1 == t._2).groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val dTot = (el.map(_._1) ++ el.map(_._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val out = SparkEntry.queries("q_modularity")(spark, sf).collect()
    assert(out.length === dTot.size)
    val total = round9(dTot.keys.toSeq.map { c =>
      val t = mIn.getOrElse(c, 0L).toDouble / m -
        math.pow(dTot(c).toDouble / (2 * m), 2)
      BigDecimal(round9(t))
    }.sum.toDouble)
    out.foreach { r =>
      val c = r.getString(0)
      assert(r.getAs[Long]("m_in") === mIn.getOrElse(c, 0L))
      assert(r.getAs[Long]("degree_total") === dTot(c))
      assert(r.getAs[Double]("q_term") === round9(
        mIn.getOrElse(c, 0L).toDouble / m -
          (dTot(c).toDouble / (2 * m)) * (dTot(c).toDouble / (2 * m))))
      assert(r.getAs[Double]("modularity") === total)
    }
  }
}
