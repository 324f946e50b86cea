package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 sixth wave
  * (retrieval evaluation / IVF index health) at sf0.001. */
class Round8Wave6Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def embs: Array[(Long, Int, Array[Double])] =
    Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>)")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  private def cosDist(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    math.rint((1 - dot / (na * nb)) * 1e6) / 1e6
  }

  // ------------------------------------------------ retrieval eval

  test("retrieval_eval: MRR and nDCG match a Scala recompute of the exact arm") {
    val e = embs
    val out = SparkEntry.queries("q_retrieval_eval")(spark, sf).collect()
    assert(out.length === 4)
    val labelCount = e.groupBy(_._2).map { case (k, v) => k -> v.size }
    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val (_, qlabel, qv) = e.find(_._1 == qid).get
      val ranked = e.filter(_._1 != qid)
        .map { case (id, lab, v) => (cosDist(v, qv), id, lab) }
        .sortBy { case (dd, id, _) => (dd, id) }.take(10)
      val rels = ranked.zipWithIndex.map { case ((_, _, lab), i) =>
        (i + 1, if (lab == qlabel) 1 else 0)
      }
      val hits = rels.map(_._2).sum
      assert(r.getAs[Long]("hits") === hits.toLong, s"hits @ $qid")
      val firstRel = rels.find(_._2 == 1).map(_._1)
      val mrr = firstRel.map(1.0 / _).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("mrr") - mrr) < 1e-6, s"mrr @ $qid")
      val dcg = rels.map { case (rank, rel) =>
        rel / (math.log(rank + 1) / math.log(2))
      }.sum
      val idealN = math.min(labelCount(qlabel) - 1, 10)
      val idcg = (1 to idealN).map(i =>
        1.0 / (math.log(i + 1) / math.log(2))).sum
      assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-5,
        s"ndcg @ $qid")
    }
  }

  test("retrieval_eval: no shuffle join") {
    val plan = SparkEntry.queries("q_retrieval_eval")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }

  // -------------------------------------------------- index stats

  test("index_stats: occupancy partitions the corpus and load factors scale k-fold") {
    val out = SparkEntry.queries("q_index_stats")(spark, sf).collect()
    assert(out.length === 16, "one row per codebook cell, empty included")
    val n = embs.length
    assert(out.map(_.getAs[Long]("members")).sum === n.toLong)
    out.foreach { r =>
      val m = r.getAs[Long]("members")
      val share = r.getAs[Double]("share")
      assert(math.abs(share - m.toDouble / n) < 1e-6)
      assert(math.abs(r.getAs[Double]("load_factor") - 16.0 * m / n) < 1e-5)
    }
    // The assignment must agree with a Scala argmin over the same
    // codebook (vec_id < 16 are the centroids; ties break to low cid).
    val e = embs
    val cents = e.filter(_._1 < 16).map(c => (c._1, c._3))
    val counts = e.map { case (_, _, v) =>
      cents.map { case (cid, cv) => (cosDist(v, cv), cid) }.min._2
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    out.foreach { r =>
      assert(r.getAs[Long]("members") ===
        counts.getOrElse(r.getAs[Long]("cid"), 0).toLong,
        s"members @ cell ${r.getAs[Long]("cid")}")
    }
  }

  test("index_stats: corpus read once — final plan reads pinned frames only") {
    val plan = SparkEntry.queries("q_index_stats")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "the final plan reads only pinned frames — the corpus is read " +
        "exactly once, at cell-count checkpoint materialization")
    assert(!plan.contains("SortMergeJoin"))
  }
}
