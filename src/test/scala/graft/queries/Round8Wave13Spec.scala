package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 thirteenth wave
  * (DBSCAN / mutual information / permutation test) at sf0.001. */
class Round8Wave13Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // --------------------------------------------------------- dbscan

  test("dbscan: roles and clusters match an exact Scala recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += (a(i) - b(i)) * (a(i) - b(i)); i += 1 }
      new java.math.BigDecimal(acc)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    }
    val nbr = (for {
      (a, av) <- vecs; (b, bv) <- vecs
      if a != b && d2(av, bv) <= 1.34
    } yield (a, b)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val core = nbr.filter(_._2.length >= 3).keySet
    // Exact connected components over the core-core graph.
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (a <- core; b <- nbr(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val cluster = core.map(c => c -> find(c)).toMap
    val out = SparkEntry.queries("q_dbscan")(spark, sf).collect()
    assert(out.length === vecs.length)
    out.foreach { r =>
      val id = r.getLong(0)
      r.getString(1) match {
        case "core" =>
          assert(core(id))
          assert(r.getAs[Long]("cluster") === cluster(id), s"cluster @ $id")
        case "border" =>
          assert(!core(id))
          val expect = nbr.getOrElse(id, Array.empty[Long])
            .filter(core.contains).map(cluster).min
          assert(r.getAs[Long]("cluster") === expect, s"border @ $id")
        case "noise" =>
          assert(!core(id))
          assert(nbr.getOrElse(id, Array.empty[Long])
            .forall(b => !core(b)))
          assert(r.isNullAt(r.fieldIndex("cluster")))
      }
    }
  }

  // ------------------------------------------------ mutual info

  test("mutual_info: cell PMIs and the total match exact counts") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val joint = rows.groupBy(identity).map { case (k, v) => k -> v.length }
    val ma = rows.groupBy(_._1).map { case (k, v) => k -> v.length }
    val mb = rows.groupBy(_._2).map { case (k, v) => k -> v.length }
    val out = SparkEntry.queries("q_mutual_info")(spark, sf).collect()
    assert(out.length === joint.size)
    out.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_ab") === joint(k).toLong)
      val pmi = math.log(joint(k) * n / (ma(k._1).toDouble * mb(k._2)))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-8)
    }
    // MI total ≥ 0 (information inequality) and constant across rows.
    val totals = out.map(_.getAs[Double]("mi_total")).distinct
    assert(totals.length === 1)
    assert(totals.head >= 0)
  }

  // ------------------------------------------- permutation test

  test("permutation_test: p-value matches an exact hash replay") {
    def md5h28(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    val g = Tables.events(spark, sf)
      .filter("event_type IN ('view', 'click')")
      .selectExpr("event_id", "event_type",
        "CAST(floor(round(value, 6) * 1e6 + 0.5) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def intMean(s: BigInt, n: Long): Double =
      ((2 * s + n) / (2 * n)).toDouble / 1e6
    val obsDiff =
      intMean(g.filter(_._2 == "view").map(x => BigInt(x._3)).sum,
        g.count(_._2 == "view").toLong) -
      intMean(g.filter(_._2 == "click").map(x => BigInt(x._3)).sum,
        g.count(_._2 == "click").toLong)
    val extreme = (1 to 64).count { b =>
      val sides = g.map(x => (md5h28(s"perm#$b#${x._1}") % 2, x._3))
      val d =
        intMean(sides.filter(_._1 == 0).map(x => BigInt(x._2)).sum,
          sides.count(_._1 == 0).toLong) -
        intMean(sides.filter(_._1 == 1).map(x => BigInt(x._2)).sum,
          sides.count(_._1 == 1).toLong)
      math.abs(d) >= math.abs(obsDiff)
    }
    val out = SparkEntry.queries("q_permutation_test")(spark, sf)
      .collect().head
    assert(out.getAs[Long]("na") === g.count(_._2 == "view").toLong)
    assert(out.getAs[Long]("nb") === g.count(_._2 == "click").toLong)
    assert(math.abs(out.getAs[Double]("diff_obs") - obsDiff) < 1e-5)
    assert(out.getAs[Long]("n_extreme") === extreme.toLong)
    val p = math.floor((2.0 * (1 + extreme) * 1000000 + 65) / 130.0) / 1e6
    assert(math.abs(out.getAs[Double]("p_value") - p) < 1e-6)
    assert(out.getAs[Double]("p_value") > 0 &&
      out.getAs[Double]("p_value") <= 1)
  }

  test("permutation_test: replicas fold map-side in one pass") {
    val plan = SparkEntry.queries("q_permutation_test")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }
}
