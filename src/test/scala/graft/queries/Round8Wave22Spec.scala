package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 twenty-second
  * wave (BFS hops / cosine LSH / rolling correlation) at sf0.001. */
class Round8Wave22Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // ------------------------------------------------------- bfs_hops

  test("bfs_hops: frontier sizes match a driver-side BFS") {
    val edges = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (s"p${r.getLong(0)}", s"s${r.getLong(1)}"))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seed = "p" + edges.map(_._1.drop(1).toLong).min
    var visited = Set(seed); var frontier = Set(seed)
    val exp = (1 to 4).map { h =>
      val nbrs = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
      frontier = nbrs -- visited
      visited = visited ++ frontier
      (h.toLong, frontier.size.toLong, visited.size.toLong)
    }
    val out = SparkEntry.queries("q_bfs_hops")(spark, sf).collect()
    assert(out.length === 4)
    out.zip(exp).foreach { case (r, (h, f, v)) =>
      assert(r.getAs[Long]("hop") === h)
      assert(r.getAs[Long]("frontier_size") === f, s"hop $h")
      assert(r.getAs[Long]("reached") === v, s"hop $h")
    }
    // reach is monotone non-decreasing
    val rs = out.map(_.getAs[Long]("reached"))
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b })
  }

  // ------------------------------------------------------ lsh_embed

  test("lsh_embed: the audit columns are mutually consistent") {
    val out = SparkEntry.queries("q_lsh_embed")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val (nc, nt, hits) = (r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_true"), r.getAs[Long]("hits"))
    assert(hits <= nt && hits <= nc)
    assert(r.getAs[Long]("n_vecs") ===
      Tables.embeddings(spark, sf).count())
    if (nt > 0) {
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      // the banded-SRP operating point: non-trivial recall on the
      // sim>=0.4 truth set (theory ~0.5 for 4x4 at 66 degrees)
      assert(recall > 0.2, s"recall $recall collapsed")
    }
    // candidate set is far below all-pairs (the point of LSH)
    val n = r.getAs[Long]("n_vecs")
    assert(nc < n * (n - 1) / 2 / 2, "candidates ~ all pairs")
  }

  test("lsh_embed: the candidate arm joins equi on the band key") {
    // the truth arm is block-chunked pairwise by design (exactSim);
    // the CANDIDATE arm must never be — assert its standalone plan
    // resolves to a hash equi-join, not a nested loop
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(vec_id % 7 AS BIGINT) AS band",
        "CAST(vec_id % 3 AS BIGINT) AS s")
    val cand = e.as("a").join(
      e.selectExpr("vec_id AS id2", "band AS b2", "s AS s2"),
      org.apache.spark.sql.functions.col("band") ===
        org.apache.spark.sql.functions.col("b2") &&
        org.apache.spark.sql.functions.col("s") ===
          org.apache.spark.sql.functions.col("s2") &&
        org.apache.spark.sql.functions.col("vec_id") <
          org.apache.spark.sql.functions.col("id2"))
    val plan = cand.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.linesIterator.take(4).mkString("\n"))
  }

  // --------------------------------------------------- rolling_corr

  test("rolling_corr: windows match an exact integer replay") {
    val days = Tables.events(spark, sf)
      .selectExpr("CAST(ts AS DATE) AS d", "event_type").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
      .groupBy(_._1).map { case (d, v) =>
        (d, v.count(_._2 == "view").toLong,
          v.count(_._2 == "click").toLong)
      }.toSeq.sortBy(_._1)
    val exp = days.indices.filter(_ >= 6).map { i =>
      val w = days.slice(i - 6, i + 1)
      val sx = w.map(_._2).sum; val sy = w.map(_._3).sum
      val sxx = w.map(t => t._2 * t._2).sum
      val syy = w.map(t => t._3 * t._3).sum
      val sxy = w.map(t => t._2 * t._3).sum
      val den = (7 * sxx - sx * sx) * (7 * syy - sy * sy)
      val corr =
        if (den <= 0) None
        else Some(round6((7 * sxy - sx * sy) / math.sqrt(den.toDouble)))
      (days(i)._1, days(i)._2, days(i)._3, corr)
    }
    val out = SparkEntry.queries("q_rolling_corr")(spark, sf).collect()
    assert(out.length === exp.length)
    out.zip(exp).foreach { case (r, (d, x, y, corr)) =>
      assert(r.getDate(0).toString === d)
      assert(r.getAs[Long]("x") === x)
      assert(r.getAs[Long]("y") === y)
      corr match {
        case Some(c) => assert(r.getAs[Double]("corr7") === c, s"@ $d")
        case None => assert(r.isNullAt(r.fieldIndex("corr7")))
      }
    }
    // correlations live in [-1, 1]
    out.filter(!_.isNullAt(3)).foreach(r =>
      assert(math.abs(r.getAs[Double]("corr7")) <= 1.0))
  }
}
