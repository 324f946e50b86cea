package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 seventh wave
  * (vocabulary coverage / minhash LSH recall audit) at sf0.001. */
class Round8Wave7Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------- vocab coverage

  test("vocab_coverage: head sums match a Scala recompute of the token counts") {
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val counts = texts.flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = counts.values.sum
    val ordered = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val out = SparkEntry.queries("q_vocab_coverage")(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val k = r.getAs[Int]("k")
      val covered = ordered.take(k).map(_._2).sum
      assert(r.getAs[Long]("vocab") === counts.size.toLong)
      assert(r.getAs[Long]("covered") === covered, s"covered @ $k")
      assert(r.getAs[Long]("total") === total)
      assert(math.abs(r.getAs[Double]("coverage") -
        covered.toDouble / total) < 1e-6)
    }
    // Coverage is monotone in k and reaches 1.0 once k ≥ |vocab|.
    val cov = out.sortBy(_.getAs[Int]("k")).map(_.getAs[Double]("coverage"))
    assert(cov.sameElements(cov.sorted))
    if (counts.size <= 1000) assert(cov.last === 1.0)
  }

  test("vocab_coverage: no global rank — three TakeOrdered heads, zero windows") {
    val plan = SparkEntry.queries("q_vocab_coverage")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "head sums must be TakeOrdered, not a ranked window")
    assert("TakeOrderedAndProject".r.findAllIn(plan).length === 3)
  }

  // --------------------------------------------- minhash LSH audit

  test("minhash_recall: metrics match a brute-force truth set and the band candidates") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val truth = (for {
      i <- sets.indices; j <- sets.indices if i < j
      (id1, s1) = sets(i); (id2, s2) = sets(j)
      jac = (s1 & s2).size.toDouble / (s1 | s2).size
      if math.rint(jac * 1e6) / 1e6 >= 0.6
    } yield (math.min(id1, id2), math.max(id1, id2))).toSet
    val r = SparkEntry.queries("q_minhash_recall")(spark, sf).collect().head
    assert(r.getAs[Long]("n_true") === truth.size.toLong)
    val hits = r.getAs[Long]("hits")
    val nCand = r.getAs[Long]("n_cand")
    assert(hits <= math.min(truth.size.toLong, nCand))
    assert(math.abs(r.getAs[Double]("recall") -
      hits.toDouble / truth.size) < 1e-6)
    assert(math.abs(r.getAs[Double]("precision") -
      hits.toDouble / nCand) < 1e-6)
    // 8×4 at τ=0.6 sits far up the S-curve: on this fixture the
    // sketch must catch at least half the true pairs.
    assert(r.getAs[Double]("recall") >= 0.5, "LSH config collapsed")
  }

  test("minhash_recall: no all-pairs cartesian between data-sized frames") {
    val plan = SparkEntry.queries("q_minhash_recall")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "only band/prefix equi-joins may pair documents")
  }
}
