package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics + plan-shape invariants for the round-8 twentieth wave
  * (EWMA forecast / EB shrinkage / feature hashing) at sf0.001. */
class Round8Wave20Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // -------------------------------------------------- ewma_forecast

  test("ewma: closed form equals the sequential recursion") {
    val days = Tables.events(spark, sf)
      .selectExpr("CAST(ts AS DATE) AS d").groupBy("d").count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    // closed form with the same per-term 9dp rounding
    val exp = days.indices.map { t =>
      val terms = (0 to t).map { i =>
        if (i == 0) round9(math.pow(0.7, t) * days(0)._2)
        else round9(0.3 * math.pow(0.7, t - i) * days(i)._2)
      }
      round6(terms.map(BigDecimal(_)).sum.toDouble)
    }
    val out = SparkEntry.queries("q_ewma_forecast")(spark, sf).collect()
    assert(out.length === days.length)
    out.zipWithIndex.foreach { case (r, t) =>
      assert(r.getDate(0).toString === days(t)._1)
      assert(r.getAs[Long]("y") === days(t)._2)
      assert(r.getAs[Double]("ewma") === exp(t), s"ewma @ $t")
      if (t == 0) assert(r.isNullAt(r.fieldIndex("forecast")))
      else {
        assert(r.getAs[Double]("forecast") === exp(t - 1))
        assert(r.getAs[Double]("abs_err") ===
          round6(math.abs(days(t)._2 - exp(t - 1))))
      }
    }
    // the sequential recursion agrees within the rounding budget
    var s = days(0)._2.toDouble
    days.indices.drop(1).foreach { t =>
      s = 0.3 * days(t)._2 + 0.7 * s
      assert(math.abs(exp(t) - s) < 1e-4, s"recursion drift @ $t")
    }
  }

  test("ewma: broadcast triangle — no SortMergeJoin") {
    val plan = SparkEntry.queries("q_ewma_forecast")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
  }

  // --------------------------------------------------- eb_shrinkage

  test("eb_shrinkage: shrinkage pulls small-n toward the prior mean") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END r")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byPart = li.groupBy(_._1).map { case (p, v) =>
      (p, v.size.toLong, v.map(_._2).sum.toLong)
    }.toSeq
    val rates = byPart.map { case (_, n, x) => round9(x.toDouble / n) }
    val np = rates.size
    val sr = rates.map(BigDecimal(_)).sum.toDouble
    val sq = rates.map(r => BigDecimal(round9(r * r))).sum.toDouble
    val m = sr / np
    val v = sq / np - m * m
    val k = m * (1 - m) / v - 1
    val exp = byPart.map { case (p, n, x) =>
      (p, n, x, round6((x + k * m) / (n + k)))
    }.sortBy { case (p, _, _, s) => (-s, p) }.take(20)
    val out = SparkEntry.queries("q_eb_shrinkage")(spark, sf).collect()
    assert(out.length === 20)
    out.zip(exp).foreach { case (r, (p, n, x, s)) =>
      assert(r.getAs[Long]("part") === p)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("x") === x)
      assert(r.getAs[Double]("shrunk_rate") === s)
      assert(r.getAs[Double]("prior_mean") === round6(m))
      assert(r.getAs[Double]("prior_strength") === round6(k))
      // shrinkage: the shrunk rate sits between raw rate and prior
      val raw = x.toDouble / n
      assert((s >= math.min(raw, m) - 1e-6) &&
        (s <= math.max(raw, m) + 1e-6))
    }
    assert(k > 0, s"prior strength $k should be positive here")
  }

  test("eb_shrinkage: prior broadcast + TakeOrdered top-20") {
    val plan = SparkEntry.queries("q_eb_shrinkage")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // ------------------------------------------------ feature_hashing

  test("feature_hashing: dims, masses, and signs match a replay") {
    def h28(e: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(e.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 7), 16)
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val counts = toks.groupBy(identity).map { case (t, v) =>
      (t, v.size.toLong)
    }
    val dims = counts.toSeq.map { case (t, c) =>
      val h = h28(s"fh#$t")
      (h % 64, c, if ((h / 64) % 2 == 0) c else -c)
    }.groupBy(_._1).map { case (d, v) =>
      d -> (v.size.toLong, v.map(_._2).sum, v.map(_._3).sum)
    }
    val total = counts.values.sum
    val out = SparkEntry.queries("q_feature_hashing")(spark, sf).collect()
    assert(out.length === dims.size)
    out.foreach { r =>
      val (nt, mass, signed) = dims(r.getAs[Long]("dim"))
      assert(r.getAs[Long]("n_tokens") === nt)
      assert(r.getAs[Long]("mass") === mass)
      assert(r.getAs[Long]("signed_mass") === signed)
      assert(r.getAs[Double]("mass_share") ===
        round9(mass.toDouble / total))
      // sign cancellation: |signed| <= mass always
      assert(math.abs(signed) <= mass)
    }
  }
}
