package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan shape for q_hybrid_search at sf0.001: RRF must
  * fuse exactly the two arms' rank lists, and the rank machinery
  * must never use a partition-less window. */
class HybridSearchSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("hybrid_search: RRF equals a Scala fusion of the two arms' recomputed ranks") {
    // Vector arm recompute: cosine distance to vec_id 0, top-50.
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qv = emb.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      1 - dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val vecRanks = emb.filter(_._1 != 0L)
      .map { case (id, v) => (math.rint(cos(v, qv) * 1e6) / 1e6, id) }
      .sortBy(identity).take(50).zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    // Lexical arm: trust the engine's own q_bm25 (oracle-verified)
    // for scores; ranks = (score desc, doc_id) over its top-50.
    val lexRanks = SparkEntry.queries("q_bm25")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy { case (id, sc) => (-sc, id) }.take(50).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (vecRanks.keySet ++ lexRanks.keySet).map { id =>
      val rrf = lexRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vecRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, math.rint(rrf * 1e6) / 1e6)
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val out = SparkEntry.queries("q_hybrid_search")(spark, sf).collect()
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, (id, rrf)) =>
      assert(r.getAs[Long]("doc_id") === id)
      assert(math.abs(r.getAs[Double]("rrf") - rrf) < 1e-6, s"rrf @ $id")
      val lr = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long])
      val vr = Option(r.getAs[Any]("vec_rank")).map(_.asInstanceOf[Long])
      assert(lr === lexRanks.get(id), s"lex rank @ $id")
      assert(vr === vecRanks.get(id), s"vec rank @ $id")
    }
  }

  test("hybrid_search: ranks come from triangular joins, not windows") {
    val plan = SparkEntry.queries("q_hybrid_search")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "per-arm ranks must be better-rows counts over the pinned " +
        "top-k frames")
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
