package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestBase, Tables}

/** Round-12 second-wave specs. Each test recomputes the operator's
  * contract independently (direct recursion instead of the prefix
  * identity, hand-built formulas, planted graphs) so an engine-side
  * refactor can't silently change semantics while the DuckDB oracle
  * drifts with it. */
class Round12WaveSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private def haveSf: Boolean =
    new java.io.File(s"$sf/documents.parquet").exists()

  // ------------------------------------------------- q_cusum_alarms

  test("cusum_alarms: the window prefix identity equals the " +
    "max(0, S+y) reset recursion, and thresholds are sd-derived") {
    assume(haveSf)
    // Recompute daily/grand means from the raw events with the same
    // exact-integer forms, then run the RECURSION the op's windows
    // replace — every cusum cell must match bit-for-bit.
    val base = Tables.events(spark, sf).select(col("event_type"),
        col("ts").cast("date").cast("string").as("day"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("y6"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byType = base.groupBy(_._1)
    val expected = byType.flatMap { case (t, rows) =>
      val daily = rows.groupBy(_._2).toSeq.sortBy(_._1).map {
        case (day, rs) =>
          val s = rs.map(_._3).sum; val n = rs.size.toLong
          (day, math.floor((2.0 * s + n) / (2.0 * n)).toLong)
      }
      val st = rows.map(_._3).sum; val nt = rows.size.toLong
      val mu6 = math.floor((2.0 * st + nt) / (2.0 * nt)).toLong
      val devs = daily.map { case (_, m6) => m6 - mu6 }
      val nD = daily.size
      val sd6 = math.round(math.sqrt(
        devs.map(d => d.toDouble * d).sum / (nD - 1.0)))
      val k6 = math.floor(sd6 / 2.0).toLong
      val h6 = 4L * sd6
      var shi = 0L; var slo = 0L
      daily.zip(devs).map { case ((day, _), d6) =>
        shi = math.max(0L, shi + (d6 - k6))
        slo = math.max(0L, slo + (-d6 - k6))
        (t, day) -> (shi, slo, shi > h6, slo > h6)
      }
    }.toMap
    val out = SparkEntry.queries("q_cusum_alarms")(spark, sf)
      .withColumn("day", col("day").cast("string")).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (shi, slo, ahi, alo) =
        expected((r.getString(0), r.getString(1)))
      assert(r.getAs[Double]("cusum_hi") ===
        math.rint(shi / 1000000.0 * 1e6) / 1e6)
      assert(r.getAs[Double]("cusum_lo") ===
        math.rint(slo / 1000000.0 * 1e6) / 1e6)
      assert(r.getAs[Boolean]("alarm_hi") === ahi)
      assert(r.getAs[Boolean]("alarm_lo") === alo)
    }
  }

  // --------------------------------------------------- q_burstiness

  test("burstiness: planted even vs clumped tokens get VMR 0 vs the " +
    "hand formula, ranked clumped-first") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12w_")
    // 'flat' once per doc in 25 docs (VMR 0); 'clump' in 20 docs,
    // 6 times in one of them, once elsewhere.
    val rows = (0 until 25).map { i =>
      val clump =
        if (i == 0) Array.fill(6)("clump")
        else if (i < 20) Array("clump")
        else Array.empty[String]
      val text = (Array("flat") ++ clump).mkString(" ")
      (i.toLong, text, "en", "src0", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_burstiness")(spark, dir.toString)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("vmr"))).toMap
    // flat: df 25, total 25, ss 25 → vmr (25·25−625)/(24·25) = 0.
    assert(out("flat") === ((25L, 25L, 0.0)))
    // clump: df 20, total 25, ss 55 → (20·55−625)/(19·25) = 1.0.
    assert(out("clump") === ((20L, 25L, 1.0)))
  }

  // ------------------------------------------- q_confusion_metrics

  test("confusion_metrics: identities against the shared NB " +
    "confusion (tp/f1/accuracy/macro consistency)") {
    assume(haveSf)
    val conf = SparkEntry.queries("q_naive_bayes")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
    val out = SparkEntry.queries("q_confusion_metrics")(spark, sf)
      .collect()
    val nTest = conf.map(_._3).sum
    val tpTot = conf.filter(c => c._1 == c._2).map(_._3).sum
    assert(out.map(_.getAs[Long]("n_actual")).sum === nTest)
    assert(out.map(_.getAs[Long]("tp")).sum === tpTot)
    out.foreach { r =>
      val (na, np, tp) = (r.getAs[Long]("n_actual"),
        r.getAs[Long]("n_predicted"), r.getAs[Long]("tp"))
      assert(na === conf.filter(_._1 == r.getString(0)).map(_._3).sum)
      assert(np === conf.filter(_._2 == r.getString(0)).map(_._3).sum)
      if (na + np > 0)
        assert(r.getAs[Double]("f1") ===
          math.rint(2.0 * tp / (na + np) * 1e6) / 1e6)
      assert(r.getAs[Double]("accuracy") ===
        math.rint(tpTot.toDouble / nTest * 1e6) / 1e6)
      // accuracy ∈ [0,1]; macro_f1 ∈ [0,1] and equal on every row.
      assert(r.getAs[Double]("macro_f1") >= 0.0 &&
        r.getAs[Double]("macro_f1") <= 1.0)
    }
    assert(out.map(_.getAs[Double]("macro_f1")).distinct.length === 1)
  }

  // ------------------------------------------------- q_embed_drift

  test("embed_drift: an identical-vector label drifts exactly 0; " +
    "drift stays within the cosine range") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12w_")
    // label 0: 12 copies of the same vector (both hash-halves share
    // the centroid → cos 1, drift 0 regardless of half assignment);
    // label 1: axis-mix so drift is defined but nontrivial.
    val rows =
      (0 until 12).map(i =>
        (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f), 0)) ++
      (12 until 24).map(i =>
        (i.toLong, if (i % 3 == 0) Array(1.0f, 0f, 0f, 0f)
                   else Array(0f, 1.0f, 0f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_drift")(spark, dir.toString)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("cos_ab"),
          r.getAs[Double]("drift"))).toMap
    val (nA0, nB0, cos0, drift0) = out(0)
    assert(nA0 + nB0 === 12L)
    assert(cos0 === 1.0 && drift0 === 0.0)
    val (_, _, cos1, drift1) = out(1)
    assert(cos1 >= -1.0 && cos1 <= 1.0)
    assert(math.abs(1.0 - cos1 - drift1) < 2e-6)
  }

  // ------------------------------------------ q_contrastive_pairs

  test("contrastive_pairs: ring properties — positive same-label " +
    "never-self bijection, negative cross-label, margin identity") {
    assume(haveSf)
    val labelOf = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = SparkEntry.queries("q_contrastive_pairs")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, l, p, n) = (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))
      assert(p !== a, "positive must not be the anchor itself")
      assert(labelOf(p) === l, "positive must share the anchor label")
      assert(labelOf(n) !== l, "negative must be another label")
      assert(r.getAs[Double]("margin") ===
        math.rint((r.getAs[Double]("neg_dist") -
          r.getAs[Double]("pos_dist")) * 1e6) / 1e6)
    }
    // Ring shift is a bijection within each label: every member of a
    // kept label appears exactly once as someone's positive.
    out.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      val anchors = rs.map(_.getAs[Long]("vec_id")).toSet
      val positives = rs.map(_.getAs[Long]("pos_id")).toSet
      assert(anchors === positives)
    }
  }

  // ------------------------------------------------------- q_sssp

  test("sssp: planted weighted chain relaxes to the exact min-plus " +
    "distances (duplicate lots keep the min weight)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12w_")
    // Chain p1 -1- s1 -5- p2 -2- s2, plus a duplicate heavier lot on
    // (p1, s1) that the min-weight fold must discard, plus a direct
    // shortcut p1 -9- s2 that relaxation must beat (0+1+5+2 = 8 < 9).
    Seq((1L, 1L, 1.0), (1L, 1L, 40.0), (2L, 1L, 5.0), (2L, 2L, 2.0),
        (1L, 2L, 9.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_sssp")(spark, dir.toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("p1" -> 0L, "s1" -> 1L, "p2" -> 6L, "s2" -> 8L))
  }

  // ------------------------------------------------ shared helpers

  /** Scala twin of TextKit.h28 (7-hex-char md5 prefix as a long). */
  private def h28(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => "%02x".format(b & 0xff)).mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16)
  }

  /** Spark round(x, n) semantics: BigDecimal HALF_UP. */
  private def rnd(x: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue

  // ----------------------------------------------- q_knn_classifier

  test("knn_classifier: brute-force half-out 5-NN majority vote " +
    "recomputes the per-class accuracies") {
    assume(haveSf)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val labeled = vecs.filter(v => h28(s"knncls#${v._1}") % 2 == 0)
    val eval = vecs.filter(v => h28(s"knncls#${v._1}") % 2 != 0)
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      1.0 - dot / math.sqrt(na * nb)
    }
    val expected = eval.map { case (aid, albl, av) =>
      val top5 = labeled
        .map { case (bid, blbl, bv) => (rnd(cosDist(av, bv), 6), bid, blbl) }
        .sortBy(t => (t._1, t._2)).take(5)
      val pred = top5.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      (albl, pred == albl)
    }.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.count(_._2).toLong)
    }.toMap
    val out = SparkEntry.queries("q_knn_classifier")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_eval")).sum === eval.length.toLong)
    out.foreach { r =>
      val (n, c) = expected(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_eval") === n)
      assert(r.getAs[Long]("n_correct") === c)
      assert(r.getAs[Double]("acc") === rnd(c.toDouble / n, 6))
    }
  }

  // ------------------------------------------------ q_class_balance

  test("class_balance: every class fills majority-size slots by " +
    "hash-ring cycling, copies uniform within one") {
    assume(haveSf)
    val out = SparkEntry.queries("q_class_balance")(spark, sf).collect()
    val byLabel = out.groupBy(_.getAs[Int]("label"))
    val sizes = Tables.embeddings(spark, sf).groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m = sizes.values.max
    byLabel.foreach { case (l, rs) =>
      assert(rs.map(_.getAs[Long]("slot")).sorted.toSeq === (1L to m))
      // Each member repeats floor(M/nl) or ceil(M/nl) times.
      val counts = rs.groupBy(_.getAs[Long]("vec_id")).values.map(_.length)
      assert(counts.size.toLong === sizes(l))
      assert(counts.max - counts.min <= 1)
      // Duplicates are exactly the beyond-class-size slots.
      rs.foreach(r => assert((r.getAs[Int]("is_dup") == 1) ===
        (r.getAs[Long]("slot") > sizes(l))))
    }
    // The majority class has zero synthetic copies.
    val majority = sizes.maxBy { case (l, n) => (n, -l) }._1
    assert(byLabel(majority).forall(_.getAs[Int]("is_dup") == 0))
  }

  // ----------------------------------------------------- q_spearman

  test("spearman: exact average-rank Pearson recompute over the " +
    "three lineitem pairs") {
    assume(haveSf)
    val rows = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def r2s(xs: Array[Double]): Array[Long] = {
      // double average rank: 2·minRank + count − 1 per tie group.
      val byV = xs.zipWithIndex.groupBy(_._1)
      val sortedVals = byV.keys.toArray.sorted
      var cum = 0L
      val rank = sortedVals.map { v =>
        val c = byV(v).length.toLong
        val r2 = 2 * (cum + 1) + c - 1
        cum += c
        v -> r2
      }.toMap
      xs.map(rank)
    }
    val rq = r2s(rows.map(_._1)); val rp = r2s(rows.map(_._2))
    val rd = r2s(rows.map(_._3))
    def rho(a: Array[Long], b: Array[Long]): Double = {
      val n = BigInt(a.length)
      val sx = a.map(BigInt(_)).sum; val sy = b.map(BigInt(_)).sum
      val sxx = a.map(x => BigInt(x) * x).sum
      val syy = b.map(y => BigInt(y) * y).sum
      val sxy = a.zip(b).map { case (x, y) => BigInt(x) * y }.sum
      rnd((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)), 6)
    }
    val out = SparkEntry.queries("q_spearman")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(math.abs(out("quantity_extendedprice") - rho(rq, rp)) < 2e-6)
    assert(math.abs(out("quantity_discount") - rho(rq, rd)) < 2e-6)
    assert(math.abs(out("extendedprice_discount") - rho(rp, rd)) < 2e-6)
  }

  // ---------------------------------------------------- q_tukey_hsd

  test("tukey_hsd: pair frame is C(k,2) ordered, q_stat = diff/se, " +
    "significance consistent with q_anova's SSW") {
    assume(haveSf)
    val anova = SparkEntry.queries("q_anova")(spark, sf).collect()
    val k = anova.length
    val msw = anova.head.getAs[Double]("ss_within") /
      anova.head.getAs[Long]("df2")
    val nOf = anova.map(r =>
      r.getString(0) -> r.getAs[Long]("n")).toMap
    val out = SparkEntry.queries("q_tukey_hsd")(spark, sf).collect()
    assert(out.length === k * (k - 1) / 2)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      assert(r.getAs[Long]("n_a") === nOf(a))
      assert(r.getAs[Long]("n_b") === nOf(b))
      val se = math.sqrt(msw / 2 *
        (1.0 / nOf(a) + 1.0 / nOf(b)))
      assert(math.abs(r.getAs[Double]("se") - se) < 1e-5)
      val q = r.getAs[Double]("mean_diff") / r.getAs[Double]("se")
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-4)
      assert(r.getAs[Boolean]("significant") ===
        (r.getAs[Double]("q_stat") > 3.858) ||
        math.abs(r.getAs[Double]("q_stat") - 3.858) < 1e-3)
    }
  }

  // ------------------------------------------------------- q_gmm_1d

  test("gmm_1d: a planted 1.0/9.0 bimodal mixture recovers both " +
    "modes with ~equal weights") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12w_")
    val t0 = 1700000000000000000L
    (0 until 1000).map { i =>
      (i.toLong, t0 + i * 1000000000L, (i % 40).toLong, "view",
        if (i % 2 == 0) 1.0 else 9.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_gmm_1d")(spark, dir.toString)
      .collect().map(r => r.getAs[Int]("comp") ->
        (r.getAs[Double]("pi"), r.getAs[Double]("mu"),
          r.getAs[Double]("sigma"))).toMap
    val (pi1, mu1, sg1) = out(1); val (pi2, mu2, sg2) = out(2)
    assert(math.abs(pi1 + pi2 - 1.0) < 1e-6)
    assert(math.abs(pi1 - 0.5) < 0.05 && math.abs(mu1 - 1.0) < 0.1 &&
      math.abs(mu2 - 9.0) < 0.1,
      s"mixture did not separate: pi=$pi1 mu1=$mu1 mu2=$mu2")
    assert(sg1 >= 0.001 && sg2 >= 0.001) // the floored-σ contract
  }

  // -------------------------------------------------------- q_cuped

  test("cuped: moment-identity recompute from raw events; adjusted " +
    "diff identity holds") {
    assume(haveSf)
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(round(value * 1000000) AS BIGINT)",
        "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = math.floor((ev.map(_._3).min.toDouble +
      ev.map(_._3).max) / 2.0).toLong
    val users = ev.groupBy(_._1).map { case (uid, rows) =>
      (h28(s"cuped#$uid") % 2,
        rows.filter(_._3 < mid).map(_._2).sum,
        rows.filter(_._3 >= mid).map(_._2).sum)
    }.toSeq
    val n = users.length.toDouble
    def bd(xs: Seq[Long]): Double = xs.map(BigInt(_)).sum.toDouble
    def bd2(xs: Seq[(Long, Long)]): Double =
      xs.map { case (a, b) => BigInt(a) * b }.sum.toDouble
    val sp = bd(users.map(_._2)); val sq = bd(users.map(_._3))
    val spp = bd2(users.map(u => (u._2, u._2)))
    val sqq = bd2(users.map(u => (u._3, u._3)))
    val spq = bd2(users.map(u => (u._2, u._3)))
    val a0 = users.filter(_._1 == 0); val a1 = users.filter(_._1 == 1)
    val theta = (n * spq - sp * sq) / (n * spp - sp * sp)
    val draw = (bd(a0.map(_._3)) / a0.length -
      bd(a1.map(_._3)) / a1.length) / 1e6
    val dpre = (bd(a0.map(_._2)) / a0.length -
      bd(a1.map(_._2)) / a1.length) / 1e6
    val vr = ((n * sqq - sq * sq) + theta * theta * (n * spp - sp * sp)
      - 2 * theta * (n * spq - sp * sq)) / (n * sqq - sq * sq)
    val out = SparkEntry.queries("q_cuped")(spark, sf).collect().head
    assert(out.getAs[Long]("n_users") === users.length.toLong)
    assert(math.abs(out.getAs[Double]("theta") - theta) < 2e-6)
    assert(math.abs(out.getAs[Double]("diff_raw") - draw) < 2e-6)
    assert(math.abs(out.getAs[Double]("diff_cuped") -
      (draw - theta * dpre)) < 2e-6)
    assert(math.abs(out.getAs[Double]("var_ratio") - vr) < 2e-6)
    assert(out.getAs[Double]("var_ratio") >= 0.0 &&
      out.getAs[Double]("var_ratio") <= 1.0 + 1e-9)
  }

  test("cuped: a perfect pre covariate (post = 2*pre per user) gives " +
    "theta 2, zero residual variance, zero adjusted diff") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12w_")
    val t0 = 1700000000000000000L
    val day = 86400L * 1000000000L
    // 40 users: one pre event (value u+1) and one post event
    // (value 2(u+1)) each, pre/post split by the 20-day midpoint.
    val rows = (0 until 40).flatMap { u =>
      Seq((u * 2L, t0 + day, u.toLong, "view", (u + 1).toDouble, ""),
        (u * 2L + 1, t0 + 39 * day, u.toLong, "view",
          2.0 * (u + 1), ""))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_cuped")(spark, dir.toString)
      .collect().head
    assert(out.getAs[Double]("theta") === 2.0)
    assert(out.getAs[Double]("var_ratio") === 0.0)
    assert(out.getAs[Double]("diff_cuped") === 0.0)
  }

  // ---------------------------------------------------------- q_did

  test("did: a planted treatment-only-in-post shift recovers exactly " +
    "the effect with a zero pre-trend") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12w_")
    val t0 = 1700000000000000000L
    val day = 86400L * 1000000000L
    // 40 users, 2 pre days + 2 post days each (midpoint = day 20 of
    // the 40-day span). Everyone spends 10.0 per event; the
    // hash-treated arm gains +5.0 ONLY in the post period.
    val rows = (0 until 40).flatMap { u =>
      val arm = h28(s"did#$u") % 2
      Seq(1L, 2L, 38L, 39L).zipWithIndex.map { case (dd, i) =>
        val post = dd > 20
        val v = if (post && arm == 1) 15.0 else 10.0
        (u * 10L + i, t0 + dd * day, u.toLong, "view", v, "")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_did")(spark, dir.toString)
      .collect().head
    assert(out.getAs[Double]("pre_treat") === 10.0)
    assert(out.getAs[Double]("pre_ctrl") === 10.0)
    assert(out.getAs[Double]("post_treat") === 15.0)
    assert(out.getAs[Double]("post_ctrl") === 10.0)
    assert(out.getAs[Double]("did") === 5.0)
    assert(out.getAs[Double]("pre_gap_slope") === 0.0)
  }

  // ------------------------------------------------------- q_seq_ab

  test("seq_ab: cumulative Welch z recomputed from raw events; OBF " +
    "boundary decreasing toward ~2.04 at the horizon") {
    assume(haveSf)
    val ev = Tables.events(spark, sf)
      .selectExpr("CAST(ts AS DATE)", "user_id",
        "CAST(round(value * 1000000) AS BIGINT)").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val out = SparkEntry.queries("q_seq_ab")(spark, sf).collect()
    val looks = out.length
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("look") === i + 1L)
      assert(r.getAs[Double]("boundary") ===
        rnd(2.797 / math.sqrt((i + 1.0) / looks), 6))
    }
    assert(out.map(_.getAs[Double]("boundary")).toSeq ===
      out.map(_.getAs[Double]("boundary")).sortBy(-_).toSeq)
    assert(math.abs(out.last.getAs[Double]("boundary") - 2.797) < 1e-9)
    // z recompute at the final look (full-horizon Welch).
    val arm = (u: Long) => h28(s"seq#$u") % 2
    val a = ev.filter(e => arm(e._2) == 0).map(_._3)
    val b = ev.filter(e => arm(e._2) == 1).map(_._3)
    def mv(xs: Array[Long]): (Double, Double) = {
      val n = xs.length.toDouble
      val s = xs.map(BigInt(_)).sum.toDouble
      val q = xs.map(x => BigInt(x) * x).sum.toDouble
      (s / n, (q - s * s / n) / (n - 1.0) / n)
    }
    val (ma, va) = mv(a); val (mb, vb) = mv(b)
    val z = ((ma - mb) / 1e6) / math.sqrt((va + vb) / 1e12)
    assert(math.abs(out.last.getAs[Double]("z") - z) < 2e-6)
    assert(out.last.getAs[Long]("n_a") === a.length.toLong)
    assert(out.last.getAs[Long]("n_b") === b.length.toLong)
  }

  // ---------------------------------------------------- q_match_att

  test("match_att: per-nation nearest-control matching recomputed " +
    "by direct scan (tie goes to the earlier control)") {
    assume(haveSf)
    val spend = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 1000000) AS BIGINT)"))
        .cast("long").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3)))
    val expected = cust.groupBy(_._2).map { case (nation, rows) =>
      val sorted = rows.sortBy(c => (c._4, c._1))
      val treatedIdx = sorted.zipWithIndex.filter(_._1._3 == "BUILDING")
      val diffs = treatedIdx.flatMap { case (t, i) =>
        val prev = sorted.take(i).reverse.find(_._3 != "BUILDING")
        val next = sorted.drop(i + 1).find(_._3 != "BUILDING")
        val pick = (prev, next) match {
          case (None, None) => None
          case (Some(p), None) => Some(p)
          case (None, Some(n)) => Some(n)
          case (Some(p), Some(n)) =>
            if (t._4 - p._4 <= n._4 - t._4) Some(p) else Some(n)
        }
        pick.map(c => spend.getOrElse(t._1, 0L) -
          spend.getOrElse(c._1, 0L))
      }
      val att =
        if (diffs.isEmpty) None
        else Some(math.floor((2.0 * diffs.sum + diffs.length) /
          (2.0 * diffs.length)) / 1e6)
      nation -> (treatedIdx.length.toLong, diffs.length.toLong, att)
    }
    val out = SparkEntry.queries("q_match_att")(spark, sf).collect()
    out.foreach { r =>
      val (nt, nm, att) = expected(r.getInt(0))
      assert(r.getAs[Long]("n_treated") === nt)
      assert(r.getAs[Long]("n_matched") === nm)
      att.foreach(a => assert(r.getAs[Double]("att") === a))
      assert(nm <= nt)
    }
  }

  // ----------------------------------------------------- q_crossval

  test("crossval: folds partition the corpus, accuracies fold to " +
    "the reported mean/sd, and a per-fold model equals a direct " +
    "leave-fold-out retrain") {
    assume(haveSf)
    val out = SparkEntry.queries("q_crossval")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("fold")).sorted.toSeq === (0L to 4L))
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_test")).sum === nDocs)
    val accs = out.map(_.getAs[Double]("acc"))
    val mean = rnd(accs.map(a => java.math.BigDecimal.valueOf(a))
      .reduce(_ add _).doubleValue / accs.length, 6)
    assert(out.head.getAs[Double]("mean_acc") === mean)
    assert(out.map(_.getAs[Double]("mean_acc")).distinct.length === 1)
    assert(out.forall(r => r.getAs[Long]("n_correct") <=
      r.getAs[Long]("n_test")))
    // The count identity behind the one-pass design: for every
    // (lang, token), global − fold-f equals a direct count over the
    // corpus WITHOUT fold f (checked for f = 0 over all cells).
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").filter(_.nonEmpty)))
    def fold(id: Long): Long = h28(s"cv#$id") % 5
    val global = docs.flatMap { case (_, l, w) => w.map(t => (l, t)) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val f0 = docs.filter(d => fold(d._1) == 0)
      .flatMap { case (_, l, w) => w.map(t => (l, t)) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val retrain = docs.filter(d => fold(d._1) != 0)
      .flatMap { case (_, l, w) => w.map(t => (l, t)) }
      .groupBy(identity).view.mapValues(_.length).toMap
    global.keys.foreach { k =>
      assert(global(k) - f0.getOrElse(k, 0) === retrain.getOrElse(k, 0))
    }
  }

  // ------------------------------------------------------ q_textrank

  test("textrank: damped co-occurrence PageRank recomputed from raw " +
    "tokens matches the top-20") {
    assume(haveSf)
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val pairs = texts.flatMap { w =>
      (0 until w.length - 1).map(i => (w(i), w(i + 1))) ++
        (0 until w.length - 2).map(i => (w(i), w(i + 2)))
    }.filter(p => p._1 != p._2)
    val wt = (pairs ++ pairs.map(_.swap)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val wdeg = wt.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    var r = wdeg.keys.map(_ -> 1.0).toMap
    (1 to 3).foreach { _ =>
      val m = scala.collection.mutable.Map[String, java.math.BigDecimal]()
      wt.foreach { case ((src, dst), w) =>
        val term = java.math.BigDecimal.valueOf(
          rnd(r(src) * w / wdeg(src), 12))
        m(dst) = m.getOrElse(dst, java.math.BigDecimal.ZERO).add(term)
      }
      r = m.map { case (n, s) =>
        n -> rnd(0.15 + 0.85 * s.doubleValue, 12)
      }.toMap
    }
    val expected = r.toSeq.sortBy { case (t, s) => (-s, t) }.take(20)
    val out = SparkEntry.queries("q_textrank")(spark, sf).collect()
      .map(row => (row.getString(0), row.getAs[Double]("score")))
    assert(out.toSeq === expected)
  }

  // --------------------------------------------------------- q_pacf

  test("pacf: Durbin-Levinson recomputed from the op's own ACF " +
    "column; lag-1 PACF equals lag-1 ACF") {
    assume(haveSf)
    val out = SparkEntry.queries("q_pacf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Double]("acf"),
        r.getAs[Double]("pacf"))).sortBy(_._1)
    assert(out.map(_._1).toSeq === (1L to 7L))
    val rho = out.map(t => t._1 -> t._2).toMap
    assert(out.head._3 === rho(1L))
    var phi = Map(1L -> rho(1L))
    (2 to 7).foreach { k =>
      val snum = phi.toSeq.sortBy(_._1)
        .map { case (j, v) => rnd(v * rho(k - j), 12) }.sum
      val sden = phi.toSeq.sortBy(_._1)
        .map { case (j, v) => rnd(v * rho(j), 12) }.sum
      val pkk = rnd((rho(k.toLong) - snum) / (1.0 - sden), 9)
      assert(math.abs(out(k - 1)._3 - pkk) < 2e-9,
        s"lag $k pacf ${out(k - 1)._3} vs recomputed $pkk")
      phi = phi.map { case (j, v) =>
        j -> rnd(v - pkk * phi(k - j), 9)
      } + (k.toLong -> pkk)
    }
  }
}
