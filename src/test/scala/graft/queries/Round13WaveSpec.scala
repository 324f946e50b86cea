package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Round-13 wave recompute specs: each new inference operator is
  * pinned against an INDEPENDENT implementation — hand-derived
  * closed forms on planted fixtures, plain-Scala recomputations, or
  * cross-operator identities — never the operator's own plan. */
class Round13WaveSpec extends SparkTestBase {

  private def plantEvents(rows: Seq[(Long, String, Double, Long)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13w_")
    rows.zipWithIndex.map { case ((u, t, v, ts), i) =>
      (i.toLong, ts, u, t, v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir.toString
  }

  private val t0 = 1700000000000000000L // nanos
  private def sec(n: Long): Long = t0 + n * 1000000000L
  private def day(n: Long): Long = t0 + n * 86400L * 1000000000L

  private val sf = "/root/testdata/sf0.001"
  private def haveSf = new java.io.File(s"$sf/lineitem.parquet").exists()

  // ------------------------------------------------- q_mann_whitney

  test("mann_whitney: hand-derived U and tie-corrected z on a planted " +
    "five-observation fixture") {
    // views {1, 2, 3}, clicks {2, 4}: average ranks 1, 2.5, 4 for the
    // views (value 2 ties across arms), so R1 = 7.5,
    // U1 = 7.5 - 3*4/2 = 1.5, mu = 3, tie term (t=2) = 6,
    // sigma^2 = (3*2/12) * ((5+1) - 6/(5*4)) = 2.85.
    val out = SparkEntry.queries("q_mann_whitney")(spark, plantEvents(Seq(
      (1L, "view", 1.0, sec(0)), (2L, "view", 2.0, sec(1)),
      (3L, "view", 3.0, sec(2)), (4L, "click", 2.0, sec(3)),
      (5L, "click", 4.0, sec(4))))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_view") === 3L)
    assert(r.getAs[Long]("n_click") === 2L)
    assert(r.getAs[Double]("u_view") === 1.5)
    val zExpect = BigDecimal((1.5 - 3.0) / math.sqrt(2.85))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") === zExpect)
  }

  test("mann_whitney: all-tied values yield NULL z (sigma = 0), not " +
    "a division blow-up") {
    val out = SparkEntry.queries("q_mann_whitney")(spark, plantEvents(Seq(
      (1L, "view", 5.0, sec(0)), (2L, "view", 5.0, sec(1)),
      (3L, "click", 5.0, sec(2))))).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("z")))
  }

  // ----------------------------------------------- q_kruskal_wallis

  test("kruskal_wallis: hand-derived H on a planted three-group " +
    "no-tie fixture") {
    // Groups (view, click, purchase) with values 1..6, no ties:
    // view {1, 2}, click {3, 4}, purchase {5, 6} → rank sums 3, 7, 11
    // H = 12/(6*7) * (9/2 + 49/2 + 121/2) - 3*7 = 25.57142857... - 21
    val out = SparkEntry.queries("q_kruskal_wallis")(spark, plantEvents(Seq(
      (1L, "view", 1.0, sec(0)), (2L, "view", 2.0, sec(1)),
      (3L, "click", 3.0, sec(2)), (4L, "click", 4.0, sec(3)),
      (5L, "purchase", 5.0, sec(4)), (6L, "purchase", 6.0, sec(5)))))
      .collect()
    assert(out.length === 3)
    val h = out.head.getAs[Double]("h")
    val hExpect = BigDecimal(12.0 / 42.0 * (4.5 + 24.5 + 60.5) - 21.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h === hExpect)
    // No ties → the tie correction is exactly 1: h_tie == h.
    assert(out.forall(r => r.getAs[Double]("h_tie") === h))
    // Mean ranks: view (1+2)/2 = 1.5, click 3.5, purchase 5.5.
    val mr = out.map(r => r.getString(0) -> r.getAs[Double]("mean_rank")).toMap
    assert(mr("view") === 1.5 && mr("click") === 3.5 && mr("purchase") === 5.5)
  }

  // ------------------------------------------------------- q_levene

  test("levene: hand-derived W on a planted two-group fixture") {
    // view {0, 4} (mean 2, |dev| = {2, 2}), click {0, 0, 6, 6}
    // (mean 3, |dev| = {3, 3, 3, 3}). Deviation groups have ZERO
    // within-group variance → SSW = 0 → W is NULL via nullif... so
    // jitter one: click {0, 0, 6, 8} (mean 3.5, |dev| {3.5, 3.5,
    // 2.5, 4.5}). z-bar(view)=2, z-bar(click)=3.5, grand=3.
    // SSB = 2*(2-3)^2 + 4*(3.5-3)^2 = 3; SSW = 0 + (0+0+1+1) = 2.
    // W = ((6-2)/(2-1)) * 3/2 ... = (nn-k)*ssb/((k-1)*ssw) = 4*3/2 = 6.
    val out = SparkEntry.queries("q_levene")(spark, plantEvents(Seq(
      (1L, "view", 0.0, sec(0)), (2L, "view", 4.0, sec(1)),
      (3L, "click", 0.0, sec(2)), (4L, "click", 0.0, sec(3)),
      (5L, "click", 6.0, sec(4)), (6L, "click", 8.0, sec(5)))))
      .collect()
    assert(out.length === 2)
    val byType = out.map(r => r.getString(0) -> r).toMap
    assert(byType("view").getAs[Double]("mean_absdev") === 2.0)
    assert(byType("click").getAs[Double]("mean_absdev") === 3.5)
    assert(out.forall(_.getAs[Double]("w_stat") === 6.0))
    assert(out.forall(_.getAs[Long]("df1") === 1L))
    assert(out.forall(_.getAs[Long]("df2") === 4L))
  }

  // ------------------------------------------------ q_partial_corr

  test("partial_corr: satisfies the partial-correlation identity " +
    "against q_corr_matrix's raw cells on real data") {
    assume(haveSf)
    val raw = SparkEntry.queries("q_corr_matrix")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr")).toMap
    val rqp = raw("quantity_extendedprice")
    val rqd = raw("quantity_discount")
    val rpd = raw("extendedprice_discount")
    val got = SparkEntry.queries("q_partial_corr")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("r_raw"), r.getAs[Double]("r_partial"))).toMap
    def partial(rxy: Double, rxz: Double, ryz: Double): Double =
      (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val cases = Seq(
      ("quantity_extendedprice_given_discount", rqp, rqd, rpd),
      ("quantity_discount_given_extendedprice", rqd, rqp, rpd),
      ("extendedprice_discount_given_quantity", rpd, rqp, rqd))
    cases.foreach { case (name, rxy, rxz, ryz) =>
      val (rRaw, rPart) = got(name)
      // r_raw re-reports the corr_matrix cell (same fold, same round).
      assert(math.abs(rRaw - rxy) < 1e-9, s"$name r_raw")
      // The identity holds on 6dp-rounded inputs to ~1e-5.
      assert(math.abs(rPart - partial(rxy, rxz, ryz)) < 1e-4,
        s"$name partial identity: got $rPart vs ${partial(rxy, rxz, ryz)}")
    }
  }

  // ---------------------------------------------------- q_iv_wald

  test("iv_wald: LATE equals the ratio of independently recomputed " +
    "ITT effects on a planted compliance fixture") {
    // Recompute each user's arm with an INDEPENDENT md5 (java
    // MessageDigest), then plant purchases/click-spend so both arms
    // are nonempty and the first stage is real.
    def arm(u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"iv#$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      (java.lang.Long.parseLong(hex, 16) % 2).toInt
    }
    val users = (1L to 40L)
    val rows = users.flatMap { u =>
      val z = arm(u)
      // Encouraged users purchase twice and click 10.0; controls
      // purchase once and click 4.0.
      val nPur = 1 + z
      val spend = if (z == 1) 10.0 else 4.0
      (0 until nPur).map(i => (u, "purchase", 1.0, sec(u * 10 + i))) :+
        ((u, "click", spend, sec(u * 10 + 5)))
    }
    val out = SparkEntry.queries("q_iv_wald")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 1)
    val r = out.head
    val n1 = users.count(arm(_) == 1)
    val n0 = users.size - n1
    assert(n1 > 0 && n0 > 0, "fixture must populate both arms")
    assert(r.getAs[Long]("n_enc") === n1.toLong)
    assert(r.getAs[Long]("n_ctl") === n0.toLong)
    assert(r.getAs[Double]("itt_x") === 1.0)   // 2 - 1 purchases
    assert(r.getAs[Double]("itt_y") === 6.0)   // 10 - 4 spend
    assert(r.getAs[Double]("late") === 6.0)    // 6.0 / 1.0
  }

  test("iv_wald: a zero first stage NULLs the LATE instead of " +
    "reporting a garbage ratio") {
    // Every user purchases exactly once regardless of arm; outcomes
    // differ → itt_x = 0 → late NULL.
    val rows = (1L to 20L).flatMap { u =>
      Seq((u, "purchase", 1.0, sec(u * 10)),
        (u, "click", (u % 4).toDouble, sec(u * 10 + 1)))
    }
    val out = SparkEntry.queries("q_iv_wald")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("itt_x") === 0.0)
    assert(out.head.isNullAt(out.head.fieldIndex("late")))
  }

  // ------------------------------------------------ corpus-stats ops

  private def plantDocs(rows: Seq[(Long, String, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13w_")
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("readability: hand-derived Flesch on a planted one-lang corpus") {
    // "go. go. go." → 3 words, 3 vowel groups, 3 sentence runs:
    // FRE = 206.835 - 1.015*(3/3) - 84.6*(3/3) = 121.22.
    val out = SparkEntry.queries("q_readability")(spark, plantDocs(Seq(
      (0L, "go. go. go.", "en", "s0")))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 1L)
    assert(r.getAs[Long]("mean_words") === 3L)
    assert(r.getAs[Double]("syll_per_word") === 1.0)
    assert(r.getAs[Double]("mean_fre") === 121.22)
  }

  test("hapax: exact corpus-frequency-1 counts per source") {
    // corpus counts: a:2, b:2, c:1 → hapax = {c}, living in srcB.
    val out = SparkEntry.queries("q_hapax")(spark, plantDocs(Seq(
      (0L, "a a b", "en", "srcA"), (1L, "b c", "en", "srcB"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Double]("hapax_share"))).toMap
    assert(out("srcA") === ((3L, 2L, 0L, 0.0)))
    assert(out("srcB") === ((2L, 2L, 1L, 0.5)))
  }

  test("heaps_law: growth points exact, beta matches an independent " +
    "in-test log-log OLS") {
    // 10 docs (one per bucket): doc i = one new token + 'common'.
    val docs = (0L to 9L).map(i => (i, s"t$i common", "en", "s0"))
    val out = SparkEntry.queries("q_heaps_law")(spark, plantDocs(docs))
      .collect()
    assert(out.length === 10)
    val cumTok = out.map(_.getAs[Long]("cum_tokens")).toSeq
    val cumVoc = out.map(_.getAs[Long]("cum_vocab")).toSeq
    assert(cumTok === (1L to 10L).map(_ * 2))
    assert(cumVoc === Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
    // Independent OLS over the same 9dp-rounded ln points.
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = cumTok.map(t => r9(math.log(t.toDouble)))
    val ys = cumVoc.map(v => r9(math.log(v.toDouble)))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => r9(x * x)).sum
    val sxy = xs.zip(ys).map { case (x, y) => r9(x * y) }.sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.head.getAs[Double]("heaps_beta") - beta) < 1e-5)
    assert(out.map(_.getAs[Double]("heaps_beta")).distinct.length === 1)
  }

  test("pii_density: digit runs, handles, and emails are counted per " +
    "surface with the rows-affected share") {
    val s = spark
    import s.implicits._
    val dir = plantDocs(Seq(
      (0L, "contact me at a@b.com now", "en", "s0"),
      (1L, "clean text only", "en", "s0")))
    Seq((0L, "Customer#000000042", 1, 10.0, "BUILDING"),
      (1L, "NoDigitsHere", 2, 20.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q_pii_density")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val cn = out("customer_name")
    assert(cn.getAs[Long]("n_rows") === 2L)
    assert(cn.getAs[Long]("digit_runs") === 1L)
    assert(cn.getAs[Long]("handles") === 1L)
    assert(cn.getAs[Long]("emails") === 0L)
    assert(cn.getAs[Double]("id_density") === 0.5)
    val dt = out("document_text")
    assert(dt.getAs[Long]("emails") === 1L)
    assert(dt.getAs[Long]("digit_runs") === 0L)
    assert(dt.getAs[Double]("id_density") === 0.5)
  }

  // ------------------------------------------- cluster-eval + IVFPQ

  private def plantEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13w_")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  test("cluster_purity: label-pure duplicate-pair clusters give " +
    "overall purity 1 and the count identities hold") {
    // Seeds are vec_ids 0..7; ids 8..15 are exact copies with the
    // same label → every cluster is a pure duplicate pair.
    val base = (0 until 8).map { i =>
      val v = Array.fill(8)(0.1f); v(i % 4) = 1.0f + i; v
    }
    val rows = (0L to 7L).map(i => (i, base(i.toInt), i.toInt)) ++
      (8L to 15L).map(i => (i, base(i.toInt - 8), i.toInt - 8))
    val out = SparkEntry.queries("q_cluster_purity")(spark, plantEmb(rows))
      .collect()
    assert(out.map(_.getAs[Long]("n")).sum === 16L)
    assert(out.forall(_.getAs[Double]("purity") === 1.0))
    assert(out.head.getAs[Double]("overall_purity") === 1.0)
    val nmi = out.head.getAs[Double]("nmi")
    assert(nmi > 0.99 && nmi < 1.01,
      s"identical partitions must have NMI 1, got $nmi")
    // n_majority sums to the overall-purity numerator.
    val om = out.map(_.getAs[Long]("n_majority")).sum
    assert(om === 16L)
  }

  test("silhouette: zero-radius clusters score exactly 1") {
    // Every point coincides with its centroid → a = 0, b > 0 →
    // s = (b - 0)/b = 1 for every point.
    val base = (0 until 8).map { i =>
      val v = Array.fill(8)(0.0f); v(i % 8) = 2.0f + i; v
    }
    val rows = (0L to 7L).map(i => (i, base(i.toInt), 0)) ++
      (8L to 15L).map(i => (i, base(i.toInt - 8), 0))
    val out = SparkEntry.queries("q_silhouette")(spark, plantEmb(rows))
      .collect()
    assert(out.length === 8)
    assert(out.forall(_.getAs[Long]("n") === 2L))
    assert(out.forall(_.getAs[Double]("mean_silhouette") === 1.0))
    assert(out.head.getAs[Double]("overall_silhouette") === 1.0)
  }

  test("knn_ivfpq: exact re-rank distances match an independent " +
    "in-test cosine, and recall vs exact top-5 is sane") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val all = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val q = all(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      1.0 - dot / math.sqrt(na * nb)
    }
    val out = SparkEntry.queries("q_knn_ivfpq")(spark, sf).collect()
    assert(out.length === 5)
    val dists = out.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
    out.foreach { r =>
      val expect = cos(q, all(r.getAs[Long]("vec_id")))
      assert(math.abs(r.getAs[Double]("dist") - expect) < 1e-5,
        s"re-rank distance for ${r.getAs[Long]("vec_id")}")
    }
    // ANN funnel sanity: at least 3 of the exact top-5 survive the
    // IVF probe + PQ pool (the declared recall tradeoff, not exact).
    val exact5 = all.toSeq.map { case (id, v) => (cos(q, v), id) }
      .sortBy(identity).take(5).map(_._2).toSet
    val got = out.map(_.getAs[Long]("vec_id")).toSet
    assert((exact5 & got).size >= 3,
      s"ivfpq recall collapsed: exact $exact5 vs got $got")
  }

  // -------------------------------------- bollinger / rsi / graphs

  test("bollinger: hand-derived band on a 7-day ramp") {
    // One view event per day, values 1..7: on day 7 the window is
    // full — ma = 4, sd = 2, upper = 8, lower = 0, %B = 7/8.
    val rows = (0 until 7).map(i =>
      (1L, "view", (i + 1).toDouble, day(i.toLong)))
    val out = SparkEntry.queries("q_bollinger")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("close") === 7.0)
    assert(r.getAs[Double]("ma7") === 4.0)
    assert(r.getAs[Double]("sd7") === 2.0)
    assert(r.getAs[Double]("upper") === 8.0)
    assert(r.getAs[Double]("lower") === 0.0)
    assert(r.getAs[Double]("pct_b") === 0.875)
  }

  test("bollinger: a flat series gives zero-width bands and NULL %B") {
    val rows = (0 until 7).map(i => (1L, "view", 5.0, day(i.toLong)))
    val out = SparkEntry.queries("q_bollinger")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("sd7") === 0.0)
    assert(out.head.isNullAt(out.head.fieldIndex("pct_b")))
  }

  test("rsi: a monotone ramp saturates RSI at exactly 100") {
    // 8 days, values 1..8 → 7 positive deltas on day 8.
    val rows = (0 until 8).map(i =>
      (1L, "view", (i + 1).toDouble, day(i.toLong)))
    val out = SparkEntry.queries("q_rsi")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("avg_gain") === 1.0)
    assert(r.getAs[Double]("avg_loss") === 0.0)
    assert(r.getAs[Double]("rsi") === 100.0)
  }

  test("link_pred: scores match an independent in-test CF " +
    "recomputation and never recommend an owned part") {
    assume(haveSf)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custOf = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // item-CF sims (co >= 2, top 20 by (cosine desc, u, v)).
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val coCount = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length
           if ps(i) != ps(j))
        coCount((ps(i), ps(j))) = coCount.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    val n = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sims = coCount.toSeq.filter(_._2 >= 2).map { case ((u, v), c) =>
      (u, v, r6(c.toDouble / math.sqrt(n(u).toDouble * n(v))))
    }.sortBy { case (u, v, cos) => (-cos, u, v) }.take(20)
    val owned = li.map { case (o, p) => (custOf(o), p) }.toSet
    val scores = scala.collection.mutable
      .Map[(Long, Long), (Long, BigDecimal)]()
    for ((u, v, cos) <- sims; dir <- Seq((u, v), (v, u))) {
      val (src, dst) = dir
      owned.filter(_._2 == src).foreach { case (cust, _) =>
        if (!owned.contains((cust, dst))) {
          val (sup, sc) = scores.getOrElse((cust, dst), (0L, BigDecimal(0)))
          scores((cust, dst)) = (sup + 1, sc + BigDecimal(cos))
        }
      }
    }
    val expect = scores.toSeq
      .map { case ((c, p), (sup, sc)) => (c, p, sup, sc.toDouble) }
      .sortBy { case (c, p, _, sc) => (-sc, c, p) }.take(25)
    val got = SparkEntry.queries("q_link_pred")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("score")))
    assert(got.length === expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-9)
    }
    got.foreach(g => assert(!owned.contains((g._1, g._2)),
      s"recommended an owned part: $g"))
  }

  test("degree_hist: bin bounds hold and Hill alpha matches an " +
    "independent recomputation") {
    assume(haveSf)
    val out = SparkEntry.queries("q_degree_hist")(spark, sf).collect()
    out.foreach { r =>
      val bin = r.getLong(0)
      assert(r.getAs[Long]("min_deg") >= (1L << bin))
      assert(r.getAs[Long]("max_deg") < (1L << (bin + 1)))
    }
    // Independent degree + Hill recomputation from raw lineitem.
    def h28(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(sx.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7), 16)
    }
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, p) => h28(s"tri#$p") % 2 == 0 }
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(_.getAs[Long]("n_nodes")).sum === deg.size.toLong)
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tail = deg.values.filter(_ >= 4).toSeq
    val alpha = 1 + tail.length /
      tail.map(dd => r9(math.log(dd / 3.5))).sum
    assert(math.abs(out.head.getAs[Double]("hill_alpha") - alpha) < 1e-5)
  }

  // --------------------------------- mcnemar / bcubed / hurst

  test("mcnemar: cells decompose exactly from q_naive_bayes's " +
    "confusion plus an independently recomputed majority class") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    def h28(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(sx.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7), 16)
    }
    val mlang = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => h28(s"split#$id") < 214748365L }
      .groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (l, c) => (-c, l) }.head._1
    val conf = SparkEntry.queries("q_naive_bayes")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def tot(f: (String, String) => Boolean) =
      conf.filter { case (a, p, _) => f(a, p) }.map(_._3).sum
    val out = SparkEntry.queries("q_mcnemar")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === conf.map(_._3).sum)
    assert(r.getAs[Long]("both_right") === tot((a, p) => a == p && a == mlang))
    assert(r.getAs[Long]("nb_only") === tot((a, p) => a == p && a != mlang))
    assert(r.getAs[Long]("base_only") === tot((a, p) => a != p && a == mlang))
    val b = r.getAs[Long]("nb_only").toDouble
    val c = r.getAs[Long]("base_only").toDouble
    if (b + c > 0) {
      val chi = (math.abs(b - c) - 1) * (math.abs(b - c) - 1) / (b + c)
      assert(math.abs(r.getAs[Double]("mcnemar_chi2") - chi) < 1e-9)
    }
  }

  test("bcubed: a label-identical partition scores exactly 1/1/1, " +
    "and real data stays in (0, 1]") {
    val base = (0 until 8).map { i =>
      val v = Array.fill(8)(0.1f); v(i % 4) = 1.0f + i; v
    }
    val rows = (0L to 7L).map(i => (i, base(i.toInt), i.toInt)) ++
      (8L to 15L).map(i => (i, base(i.toInt - 8), i.toInt - 8))
    val out = SparkEntry.queries("q_bcubed")(spark, plantEmb(rows))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("b3_precision") === 1.0)
    assert(out.head.getAs[Double]("b3_recall") === 1.0)
    assert(out.head.getAs[Double]("b3_f1") === 1.0)
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val real = SparkEntry.queries("q_bcubed")(spark, sf).collect().head
    val (p, rr, f) = (real.getAs[Double]("b3_precision"),
      real.getAs[Double]("b3_recall"), real.getAs[Double]("b3_f1"))
    assert(p > 0 && p <= 1 && rr > 0 && rr <= 1)
    assert(f <= math.max(p, rr) + 1e-9 && f >= math.min(p, rr) - 1e-9)
  }

  test("hurst: a pure alternating series has R/S exactly 1 at every " +
    "block size, hence H = 0 (perfect mean reversion)") {
    // Days 0..15 alternate 1/3 events: every complete block's
    // rescaled range is exactly 1 at m = 4, 8, 16 (hand-derivable:
    // dev range = sigma*m at each scale), so the log-log slope is 0.
    val rows = (0 until 16).flatMap { i =>
      val c = if (i % 2 == 0) 1 else 3
      (0 until c).map(j => (j.toLong + 1, "view", 1.0,
        day(i.toLong) + j * 1000000000L))
    }
    val out = SparkEntry.queries("q_hurst")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 3)
    val byM = out.map(r => r.getLong(0) -> r).toMap
    assert(byM(4L).getAs[Long]("n_blocks") === 4L)
    assert(byM(8L).getAs[Long]("n_blocks") === 2L)
    assert(byM(16L).getAs[Long]("n_blocks") === 1L)
    out.foreach(r => assert(r.getAs[Double]("mean_rs") === 1.0))
    out.foreach(r => assert(r.getAs[Double]("hurst") === 0.0))
  }

  test("hurst: a constant series has zero variance everywhere -> " +
    "NULL mean R/S and NULL H, never a division blow-up") {
    val rows = (0 until 16).map(i => (1L, "view", 1.0, day(i.toLong)))
    val out = SparkEntry.queries("q_hurst")(spark, plantEvents(rows))
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("mean_rs")))
      assert(r.isNullAt(r.fieldIndex("hurst")))
    }
  }

  // --------------------------------- q_join_interval / q_source_text

  test("join_interval: hand-placed sessions and bursts overlap " +
    "exactly once each, with exact micro durations, and a pair " +
    "spanning two grid cells dedups to one") {
    def t(sec: Long) = t0 + sec * 1000000000L
    val rows = Seq(
      // user 1: one session [0, 1200 s] (20-min gap < 30)
      (1L, "view", 1.0, t(0)), (1L, "view", 1.0, t(1200)),
      // user 2: one session far away, no burst overlap
      (2L, "view", 1.0, t(7200 + 3600 * 24)),
      // user 3: session [3500, 3700 s] crossing the hour-cell edge
      (3L, "view", 1.0, t(3500)), (3L, "view", 1.0, t(3700)),
      // errors: burst A [600, 900 s] (user 99), burst B
      // [3500, 3700 s] crossing the same cell edge (user 98)
      (99L, "error", 1.0, t(600)), (99L, "error", 1.0, t(900)),
      (98L, "error", 1.0, t(3500)), (98L, "error", 1.0, t(3700)))
    val out = SparkEntry.queries("q_join_interval")(spark, plantEvents(rows))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // user 1: burst A [600, 900] inside [0, 1200] → 300 s overlap.
    assert(out(1L) === ((1L, 1L, 1L, 300L * 1000000L)))
    assert(out(2L) === ((1L, 0L, 0L, 0L)))
    // user 3: identical span as burst B; the pair shares TWO hour
    // cells but must count once, overlap = 200 s.
    assert(out(3L) === ((1L, 1L, 1L, 200L * 1000000L)))
    // the error users' own sessions overlap their bursts too.
    assert(out(99L) === ((1L, 1L, 1L, 300L * 1000000L)))
    assert(out(98L) === ((1L, 1L, 1L, 200L * 1000000L)))
  }

  test("source_text: the tab-separated text round trip recovers " +
    "every row of the events table bit-for-bit") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    // The registry query aggregates; assert the stronger row-level
    // contract by re-reading the staged lines with the same parse.
    val n = SparkEntry.queries("q_source_text")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(n === Tables.events(spark, sf).count())
    val agg = SparkEntry.queries("q_source_text")(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        graft.queries.dsum(org.apache.spark.sql.functions.col("value"))
          .as("total_value"),
        org.apache.spark.sql.functions.min("ts").as("min_ts"),
        org.apache.spark.sql.functions.max("ts").as("max_ts"))
      .orderBy("event_type").collect()
    assert(agg.map(_.toString).toSeq === direct.map(_.toString).toSeq)
  }

  // ----------------------------------------------------- q_granger

  test("granger: closed form matches an independent in-test OLS on " +
    "the planted daily series") {
    // 12 days of counts; clicks follow lagged views plus an AR kick
    // with deterministic wobble so neither fit is perfect.
    val views = Seq(5, 9, 4, 11, 7, 13, 6, 10, 8, 12, 5, 9)
    val clicks = Seq(3, 6, 8, 5, 10, 7, 12, 6, 9, 8, 11, 6)
    val rows = views.zipWithIndex.flatMap { case (v, i) =>
      (0 until v).map(j => (j.toLong + 1, "view", 1.0, day(i) + j * 1000000000L))
    } ++ clicks.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map(j => (j.toLong + 1, "click", 1.0, day(i) + (100 + j) * 1000000000L))
    }
    val out = SparkEntry.queries("q_granger")(spark,
      plantEvents(rows.map(r => (r._1, r._2, r._3, r._4)))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === 11L)
    // Independent OLS: y = clicks(1..), x1 = clicks(0..-1), x2 = views(0..-1).
    val y = clicks.drop(1).map(_.toDouble)
    val x1 = clicks.dropRight(1).map(_.toDouble)
    val x2 = views.dropRight(1).map(_.toDouble)
    val n = y.length.toDouble
    def s(a: Seq[Double]) = a.sum
    def sp(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    val (cyy, c11, c22) = (n * sp(y, y) - s(y) * s(y),
      n * sp(x1, x1) - s(x1) * s(x1), n * sp(x2, x2) - s(x2) * s(x2))
    val (c1y, c2y, c12) = (n * sp(x1, y) - s(x1) * s(y),
      n * sp(x2, y) - s(x2) * s(y), n * sp(x1, x2) - s(x1) * s(x2))
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val rssf = cyy - b1 * c1y - b2 * c2y
    val rssr = cyy - c1y * c1y / c11
    assert(math.abs(r.getAs[Double]("beta_lag_clicks") - b1) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta_lag_views") - b2) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_stat")
      - (rssr - rssf) * (n - 3) / rssf) < 1e-4)
    assert(r.getAs[Double]("r2_full") >= r.getAs[Double]("r2_restricted"))
  }
}
