package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 fourth wave
  * (attribution / CUSUM change-point / JL random projection) at
  * sf0.001 — independent Scala recomputes plus the PLANS.md shuffle
  * claims. */
class Round8Wave4Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def h28(sx: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  // ---------------------------------------------------- attribution

  test("attribution: matrix matches a Scala recompute and counts every purchase") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { seq =>
      val s = seq.sortBy(e => (e._2, e._3))
      s.indices.filter(i => s(i)._4 == "purchase").map { i =>
        val touches = s.take(i).map(_._4)
          .filter(t => t == "click" || t == "view")
        (touches.headOption.getOrElse("(none)"),
          touches.lastOption.getOrElse("(none)"))
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val out = SparkEntry.queries("q_attribution")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("conversions")).sum
      === ev.count(_._4 == "purchase"))
    assert(out.length === expected.size)
    out.foreach { r =>
      val key = (r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))
      assert(r.getAs[Long]("conversions") === expected(key).toLong,
        s"conversions @ $key")
    }
  }

  test("attribution: one user shuffle, no joins") {
    val plan = SparkEntry.queries("q_attribution")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      "only the user window hash + the matrix aggregation may shuffle")
  }

  // ----------------------------------------------------- changepoint

  test("changepoint: peak |CUSUM| day matches an exact-integer Scala recompute") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate,
        math.rint(r.getDouble(2) * 1e6).toLong))
    val expected = ev.groupBy(_._1).map { case (typ, rows) =>
      val byDay = rows.groupBy(_._2).toSeq.sortBy(_._1.toString)
        .map { case (day, v) => (day, v.map(_._3).sum, v.size.toLong) }
      def halfUp(s: Long, n: Long) = math.floor((2 * s + n) / (2.0 * n)).toLong
      val st = byDay.map(_._2).sum
      val nt = byDay.map(_._3).sum
      val mu6 = halfUp(st, nt)
      val cusum = byDay.scanLeft(0L) { case (acc, (_, s, n)) =>
        acc + halfUp(s, n) - mu6
      }.tail
      val days = byDay.map(_._1)
      val best = days.zip(cusum).minBy { case (day, c) =>
        (-math.abs(c), day.toString)
      }
      typ -> (best._1.toString, best._2, days.length.toLong)
    }
    val out = SparkEntry.queries("q_changepoint")(spark, sf).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (day, c6, nDays) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[java.sql.Date]("cp_day").toString === day)
      assert(math.abs(r.getAs[Double]("cusum") - c6 / 1e6) < 1e-9)
      assert(r.getAs[Long]("n_days") === nDays)
    }
  }

  test("changepoint: corpus read once, grand means broadcast") {
    val plan = SparkEntry.queries("q_changepoint")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "grand totals must read the pinned type×day frame")
    assert(!plan.contains("SortMergeJoin"))
  }

  // ----------------------------------------- random projection (JL)

  test("random_projection: folds match a Scala recompute of the hash-sign matrix") {
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val out = SparkEntry.queries("q_random_projection")(spark, sf).collect()
    assert(out.length === emb.length * 16)
    val byKey = out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j"))
      -> r.getAs[Double]("proj")).toMap
    emb.take(20).foreach { case (id, v) =>
      (0 until 16).foreach { j =>
        val p = v.zipWithIndex.map { case (x, dd) =>
          val s = (h28(s"rp#$j/$dd") % 2) * 2 - 1
          math.rint(x * 1e6) / 1e6 * s
        }.sum
        assert(math.abs(byKey((id, j)) - p) < 1e-5, s"proj @ ($id, $j)")
      }
    }
  }

  test("random_projection: zero hash exchanges, zero joins — the projection rides the scan") {
    val plan = SparkEntry.queries("q_random_projection")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(!plan.contains("Join"))
    assert(!plan.contains("Window"))
  }

  test("random_projection: the sketch is an unbiased k-scaled distance estimator") {
    // Sanity of the sketch's PURPOSE, not just its arithmetic. For a
    // ±1 sign matrix, E‖P(a−b)‖² = k·‖a−b‖², so across many pairs
    // the mean of ‖Pa−Pb‖² / (k·‖a−b‖²) must concentrate near 1.
    // (Per-pair rank preservation is NOT the contract at k=16,
    // d=64 — JL ε ≈ √(ln n / k) ≈ 0.8 here, and high-dim distance
    // concentration makes pairwise ranks mostly noise; measured
    // Spearman ≈ 0.27 on this fixture, documented, not asserted.)
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).take(40)
    val proj = SparkEntry.queries("q_random_projection")(spark, sf).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Int]("j")).map(_.getAs[Double]("proj")).toArray
      }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- emb.indices; k <- emb.indices if i < k
      orig = d2(emb(i)._2, emb(k)._2) if orig > 1e-12
    } yield d2(proj(emb(i)._1), proj(emb(k)._1)) / (16.0 * orig)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 2.0,
      s"JL norm estimate biased: mean ratio $mean over ${ratios.length} pairs")
  }
}
