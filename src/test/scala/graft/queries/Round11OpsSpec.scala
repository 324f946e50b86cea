package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Round-11 operator specs: the Gopher rule battery, positional
  * phrase search, Cohen's kappa, broadcast z-score normalization, and
  * the Theil–Sen robust trend. Each is re-derived in plain Scala from
  * the raw tables (the Round9OpsSpec discipline) and the SURVEY row's
  * plan-shape claim is asserted where it carries the scale story. */
class Round11OpsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  private def docs(): Array[(Long, String, Long)] =
    Tables.documents(spark, sf).select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  // -------------------------------------------------- gopher_filters

  test("gopher_filters: rules and pass recompute per document") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val expected = docs().filter(_._2.trim.nonEmpty).map { case (id, text, _) =>
      val w = toks(text)
      val wc = w.length
      val mwl = w.map(_.length).sum.toDouble / wc
      val stops = w.count(Set("the", "a", "of", "to", "and"))
      val alpha = w.count(_.forall(c => c >= 'a' && c <= 'z')).toDouble / wc
      val rep = w.groupBy(identity).values.map(_.length).max.toDouble / wc
      val rules = Seq(wc >= 30 && wc <= 80, mwl >= 3 && mwl <= 10,
        stops >= 2, alpha >= 0.9, rep <= 0.12)
      id -> (wc.toLong, stops.toLong, rules.map(b => if (b) 1 else 0),
        rules.forall(identity))
    }.toMap

    val out = SparkEntry.queries("q_gopher_filters")(spark, sf).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (wc, stops, rules, pass) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("wc") === wc)
      assert(r.getAs[Long]("stop_cnt") === stops)
      assert(Seq("r_wc", "r_mwl", "r_stop", "r_alpha", "r_rep")
        .map(c => r.getAs[Int](c)) === rules)
      assert(r.getAs[Int]("pass") === (if (pass) 1 else 0))
    }
    // The battery must discriminate on this corpus (not all-pass /
    // all-fail), or the thresholds have drifted off the data.
    val passes = out.count(_.getAs[Int]("pass") == 1)
    assert(passes > 0 && passes < out.length,
      s"degenerate rule battery: $passes/${out.length} pass")
  }

  test("gopher_filters plan is scan-local: no shuffle before the sort") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val plan = SparkEntry.queries("q_gopher_filters")(spark, sf)
      .queryExecution.executedPlan.toString
    // One barrier round-robin (local parallelism) + the final total
    // order sort; no aggregation or join exchange anywhere.
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"rule battery must not aggregate or join:\n$plan")
  }

  // --------------------------------------------------- phrase_search

  test("phrase_search: positional adjacency counts recompute") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val expected = docs().map { case (id, text, _) =>
      val w = toks(text)
      id -> w.sliding(2).count(p =>
        p.length == 2 && p(0) == "value" && p(1) == "table")
    }.filter(_._2 > 0).toMap
    val out = SparkEntry.queries("q_phrase_search")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hits").toInt).toMap
    assert(out === expected)
  }

  test("phrase_search filters postings to the query terms before joining") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val qe = SparkEntry.queries("q_phrase_search")(spark, sf).queryExecution
    // The per-term selections must survive into the optimized plan as
    // filters below the join (posting-list volume, not corpus volume).
    val optimized = qe.optimizedPlan.toString
    assert(optimized.contains("= value") || optimized.contains("value)"),
      s"term filter missing from optimized plan:\n$optimized")
    assert(!qe.executedPlan.toString.contains("CartesianProduct"),
      "phrase join must be an equi-join on (doc_id, pos)")
  }

  // ---------------------------------------------------- cohens_kappa

  test("cohens_kappa: confusion table and kappa recompute") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val labels = docs().map { case (_, text, nChars) =>
      val a = nChars >= 300
      val b = toks(text).count(Set("the", "a")) >= 3
      (a, b)
    }
    val n = labels.length
    val n11 = labels.count(l => l._1 && l._2)
    val n10 = labels.count(l => l._1 && !l._2)
    val n01 = labels.count(l => !l._1 && l._2)
    val n00 = labels.count(l => !l._1 && !l._2)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    val kappa = (po - pe) / (1 - pe)

    val out = SparkEntry.queries("q_cohens_kappa")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === n.toLong)
    assert((r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")) ===
      ((n11.toLong, n10.toLong, n01.toLong, n00.toLong)))
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-6)
    // κ must sit strictly between chance and perfect agreement on
    // this corpus — a degenerate rater pair (constant labels) would
    // collapse pe → po and the statistic to 0/0.
    assert(r.getAs[Double]("kappa") > 0 && r.getAs[Double]("kappa") < 1)
  }

  // ------------------------------------------------ zscore_normalize

  test("zscore_normalize: group moments and z recompute") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val stats = ev.groupBy(_._2).map { case (t, rows) =>
      val vs = rows.map(_._3)
      val n = vs.length
      val mu = vs.sum / n
      val sigma = math.sqrt(vs.map(v => v * v).sum / n - mu * mu)
      t -> (mu, sigma)
    }
    val out = SparkEntry.queries("q_zscore_normalize")(spark, sf).collect()
    assert(out.length === ev.length)
    val byId = ev.map(e => e._1 -> e).toMap
    out.foreach { r =>
      val (_, typ, v) = byId(r.getAs[Long]("event_id"))
      val (mu, sigma) = stats(typ)
      assert(math.abs(r.getAs[Double]("mu") - mu) < 1e-4)
      assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-4)
      assert(math.abs(r.getAs[Double]("z") - (v - mu) / sigma) < 1e-3)
    }
  }

  test("zscore_normalize broadcasts the moment frame (corpus never shuffles)") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val plan = SparkEntry.queries("q_zscore_normalize")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"moment join must broadcast the |types|-row side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fact side must not shuffle for the moment join:\n$plan")
  }

  // -------------------------------------------------------- theil_sen

  test("theil_sen: per-user median pairwise slope recomputes") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "value", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(_._3)
      val slopes = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if sorted(j)._3 != sorted(i)._3
      } yield (sorted(j)._2 - sorted(i)._2) /
        ((sorted(j)._3 - sorted(i)._3) / 1e6)).sorted
      val n = slopes.length
      val med =
        if (n % 2 == 1) slopes(n / 2)
        else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
      u -> (n, med)
    }
    val out = SparkEntry.queries("q_theil_sen")(spark, sf).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (n, med) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_pairs") === n.toLong)
      assert(math.abs(r.getAs[Double]("sen_slope") - med) < 1e-5)
    }
  }

  // --------------------------------------------- jaccard_containment

  test("jaccard_containment: asymmetric ratio recomputes; catches " +
    "subset pairs Jaccard misses") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    def shingles(text: String): Set[String] =
      toks(text).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val sh = docs().map { case (id, text, _) => id -> shingles(text) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (i1, s1) <- sh; (i2, s2) <- sh if i1 != i2
      c = (s1 & s2).size.toDouble / s1.size if c >= 0.5
    } yield (i1, i2) -> math.rint(c * 1e6) / 1e6).toMap
    val out = SparkEntry.queries("q_jaccard_containment")(spark, sf).collect()
    val got = out.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
      r.getAs[Double]("cont")).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6) }
  }

  test("jaccard_containment prefix filter is complete by construction") {
    // Planted: a 3-shingle doc fully contained in a 40-shingle doc —
    // J ≈ 0.075 (q_dedup_near's τ=0.6 AND its length filter both
    // reject it) but C(A→B) = 1.0; under the global rarity order A's
    // prefix is ⌊3 − ⌈1.5⌉⌋ + 1 = 2 shingles, and the pair MUST
    // survive because a shared shingle sits in that prefix.
    val s = spark
    import s.implicits._
    val small = "alpha beta gamma delta epsilon"
    val big = ("w" + (1 to 40).mkString(" w") + " " + small + " tail").trim
    val df = Seq((0L, small), (1L, big)).toDF("doc_id", "text")
    val sh = graft.queries.DedupStages.shingleSets(df)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    val contained = (sh(0L) & sh(1L)).size.toDouble / sh(0L).size
    assert(contained === 1.0, "fixture: small doc fully contained")
  }

  // ------------------------------------------------- word_shingles

  test("word_shingles kernel is string-identical to the HOF chain on " +
    "real docs and edge cases") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val hof = "array_distinct(if(size(w) < 3, array(), " +
      "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', " +
      "element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))"
    val both = Tables.documents(spark, sf)
      .withColumn("w", expr(
        "filter(split(lower(text), ' '), t -> t <> '')"))
      .select(
        expr("word_shingles(lower(text), 3, true)").as("k"),
        expr(hof).as("h"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
    // Edge cases: empty, 1-2 tokens, repeated shingles, multi-space.
    val s0 = spark
    import s0.implicits._
    val edge = Seq("", "a", "a b", "a b c", "a b c a b c a b c",
      "a  b   c", " x y z ").toDF("text")
      .select(expr("word_shingles(lower(text), 3, true)").as("k"),
        expr("array_distinct(if(size(filter(split(lower(text), ' '), " +
          "t -> t <> '')) < 3, array(), transform(sequence(1, " +
          "size(filter(split(lower(text), ' '), t -> t <> '')) - 2), " +
          "i -> concat_ws(' ', element_at(filter(split(lower(text), ' '), " +
          "t -> t <> ''), i), element_at(filter(split(lower(text), ' '), " +
          "t -> t <> ''), i + 1), element_at(filter(split(lower(text), " +
          "' '), t -> t <> ''), i + 2)))))").as("h"))
      .collect()
    edge.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  // -------------------------------------------------- ngram_novelty

  test("ngram_novelty: df=1 fraction recomputes per document") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    def shingles(text: String): Set[String] =
      toks(text).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val sh = docs().map { case (id, text, _) => id -> shingles(text) }
      .filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2.toSeq).groupBy(identity).map {
      case (g, xs) => g -> xs.length
    }
    val out = SparkEntry.queries("q_ngram_novelty")(spark, sf).collect()
    assert(out.length === sh.length)
    val byId = sh.toMap
    out.foreach { r =>
      val s0 = byId(r.getAs[Long]("doc_id"))
      val novel = s0.count(df(_) == 1)
      assert(r.getAs[Long]("n_shingles") === s0.size.toLong)
      assert(r.getAs[Long]("novel") === novel.toLong)
      assert(math.abs(r.getAs[Double]("novelty") -
        novel.toDouble / s0.size) < 1e-6)
    }
    // Non-degenerate on the fixture: the planted near-dup docs share
    // shingles (novelty < 1 somewhere), originals keep unique ones.
    assert(out.exists(_.getAs[Double]("novelty") < 1.0))
    assert(out.exists(_.getAs[Double]("novelty") > 0.0))
  }

  test("ngram_novelty plan has no pair stage: two aggs and one equi-join") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val plan = SparkEntry.queries("q_ngram_novelty")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"novelty must never build a pair stage:\n$plan")
  }

  // --------------------------------------------------- tfidf_topk

  test("tfidf_topk: per-doc rows bounded by k; ranks follow (cos desc, d2)") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val out = SparkEntry.queries("q_tfidf_topk")(spark, sf).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getAs[Long]("d1"))
    byDoc.foreach { case (d1, rows) =>
      assert(rows.length <= 5, s"doc $d1 has ${rows.length} > k rows")
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ===
        (1L to rows.length).toSeq, s"ranks not dense @ $d1")
      // rank order == (cos desc, d2 asc)
      val pairs = sorted.map(r => (-r.getAs[Double]("cos"),
        r.getAs[Long]("d2"))).toSeq
      assert(pairs === pairs.sorted, s"rank order broken @ $d1")
    }
  }

  test("tfidf_topk output is n·k-bounded where tfidf_pairs is clique-quadratic") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    // The scale contract this op exists for: rows ≤ 5 per participating
    // doc regardless of how large a near-dup clique grows, while the
    // τ-threshold pair form grows with clique².
    val topk = SparkEntry.queries("q_tfidf_topk")(spark, sf).count()
    val docs = Tables.documents(spark, sf).count()
    assert(topk <= docs * 5)
  }

  // ------------------------------------------------ freshness_audit

  test("freshness_audit: lag, active days and coverage recompute") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS us",
        "CAST(ts AS DATE) AS d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
    val gmax = ev.map(_._2).max
    val span = {
      val ds = ev.map(_._3)
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(ds.min),
        java.time.LocalDate.parse(ds.max)) + 1
    }
    val out = SparkEntry.queries("q_freshness_audit")(spark, sf).collect()
    assert(out.length === ev.map(_._1).distinct.length)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val rows = ev.filter(_._1 == t)
      assert(r.getAs[Long]("n") === rows.length.toLong)
      assert(r.getAs[Long]("days_active") ===
        rows.map(_._3).distinct.length.toLong)
      assert(r.getAs[Long]("span_days") === span)
      assert(math.abs(r.getAs[Double]("lag_s") -
        (gmax - rows.map(_._2).max) / 1e6) < 1e-6)
      assert(math.abs(r.getAs[Double]("coverage") -
        rows.map(_._3).distinct.length.toDouble / span) < 1e-6)
    }
  }

  test("freshness_audit folds the scan once: one aggregate pair, no sort-merge") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val plan = SparkEntry.queries("q_freshness_audit")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"corpus high-water frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no data-sized shuffle join belongs in this plan:\n$plan")
  }

  test("theil_sen is robust where OLS is not: one planted outlier") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // 10 points on value = 2·t; one wild outlier at the end.
    val base = (1 to 10).map(i => (1L, i.toDouble * 2, i.toLong * 1000000L))
    val wild = Seq((1L, 1e6, 11L * 1000000L))
    val df = (base ++ wild).toDF("user_id", "v", "us")
    val a = df.selectExpr("user_id", "v AS v1", "us AS us1")
    val b = df.selectExpr("user_id", "v AS v2", "us AS us2")
    val slope = a.join(b, Seq("user_id")).filter(col("us1") < col("us2"))
      .selectExpr("user_id", "(v2 - v1) / ((us2 - us1) / 1e6) AS slope")
      .groupBy("user_id")
      .agg(expr("percentile(slope, 0.5)").as("sen"))
      .head.getAs[Double]("sen")
    assert(math.abs(slope - 2.0) < 1e-9,
      s"median slope must ignore the outlier, got $slope")
  }
}
