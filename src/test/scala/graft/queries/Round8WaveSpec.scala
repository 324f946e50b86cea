package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape invariants for the round-8 second wave
  * (OHLC resample / grouped OLS / k-anonymity / butterfly counting /
  * KL drift / sparse tf-idf pairs) at sf0.001. Each operator is
  * checked against an independent Scala recompute where the algebra
  * allows, plus the shuffle-shape claims the 100 TB notes make. */
class Round8WaveSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Test-side mirror of TextKit.h28 (first 7 md5 hex chars as a
    * 28-bit int) — ONE definition for every hash-contract check. */
  private def h28(sx: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  private def events: Array[(Long, java.sql.Timestamp, String, Double)] =
    Tables.events(spark, sf)
      .select("event_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3)))

  // ---------------------------------------------------------- ohlc

  test("ohlc_resample: open/close are the time-ordered first/last, volume partitions the table") {
    val out = SparkEntry.queries("q_ohlc_resample")(spark, sf).collect()
    val ev = events
    assert(out.map(_.getAs[Long]("volume")).sum === ev.length)
    val byBucket = ev.groupBy { case (_, ts, typ, _) =>
      (typ, ts.toInstant.getEpochSecond / 3600 * 3600)
    }
    out.foreach { r =>
      val key = (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("bucket").toInstant.getEpochSecond)
      val rows = byBucket(key).sortBy { case (id, ts, _, _) =>
        (ts.toInstant.getEpochSecond, id)
      }
      assert(r.getAs[Double]("open") === rows.head._4, s"open @ $key")
      assert(r.getAs[Double]("close") === rows.last._4, s"close @ $key")
      assert(r.getAs[Double]("high") === rows.map(_._4).max)
      assert(r.getAs[Double]("low") === rows.map(_._4).min)
      assert(r.getAs[Long]("volume") === rows.length)
    }
  }

  test("ohlc_resample: one aggregate, no join, no window") {
    val plan = SparkEntry.queries("q_ohlc_resample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "OHLC must be a single aggregation pass")
    assert(!plan.contains("Window"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1)
  }

  // ---------------------------------------------------------- regression

  test("group_regression: matches a Scala OLS recompute per group") {
    val out = SparkEntry.queries("q_group_regression")(spark, sf).collect()
    val base = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val byType = events.groupBy(_._3)
    assert(out.length === byType.size)
    out.foreach { r =>
      val rows = byType(r.getAs[String]("event_type"))
      val xs = rows.map { case (_, ts, _, _) =>
        (ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
          - base).toDouble
      }
      val ys = rows.map(_._4)
      val n = rows.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4,
        s"slope ${r.getAs[Double]("slope")} vs $slope")
      assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-3)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1)
    }
  }

  // ---------------------------------------------------------- kanon

  test("kanon_audit: reports exactly the sub-k quasi-identifier groups") {
    val out = SparkEntry.queries("q_kanon_audit")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
    val expected = docs.groupBy(identity).view.mapValues(_.length)
      .filter(_._2 < 5).keys.toSet
    assert(out.map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
      r.getAs[Long]("len_bucket"))).toSet === expected)
    assert(out.forall(r => r.getAs[Long]("k") < 5))
    assert(out.forall(r =>
      r.getAs[Double]("risk") ===
        math.rint(1e6 / r.getAs[Long]("k")) / 1e6))
  }

  // ---------------------------------------------------------- butterfly

  test("butterfly: equals the brute-force wedge count") {
    val e0 = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = e0.groupBy(_._1).values.flatMap { edges =>
      val ss = edges.map(_._2).sorted
      for (i <- ss.indices; j <- i + 1 until ss.length)
        yield (ss(i), ss(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
      .map { case ((s1, s2), c) => (s1, s2, c, c * (c - 1) / 2) }
      .toSeq.sortBy { case (s1, s2, _, b) => (-b, s1, s2) }.take(20)
    val got = SparkEntry.queries("q_butterfly")(spark, sf).collect()
      .map(r => (r.getAs[Long]("s1"), r.getAs[Long]("s2"),
        r.getAs[Long]("shared_parts"), r.getAs[Long]("butterflies"))).toSeq
    assert(got === expected)
  }

  // ---------------------------------------------------------- kl_drift

  test("kl_drift: KL is non-negative per slice and token mass partitions") {
    val out = SparkEntry.queries("q_kl_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    // Gibbs' inequality: KL(P‖Q) ≥ 0, = 0 iff P = Q (a slice never
    // exactly matches the blend unless it IS the corpus).
    assert(out.forall(_.getAs[Double]("kl") >= 0))
    val total = Tables.documents(spark, sf)
      .select(explode(expr(TextKit.toks)).as("t")).count()
    assert(out.map(_.getAs[Long]("n_tokens")).sum === total,
      "per-slice token counts must partition the corpus total")
  }

  // ---------------------------------------------------------- tfidf_pairs

  test("tfidf_pairs: matches a Scala inverted-index recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty))
    val nDocs = docs.length
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).view.mapValues(_.length).toMap
    }.toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val w = tf.map { case (id, cs) =>
      val len = cs.values.sum.toDouble
      id -> cs.collect {
        case (t, c) if dfm(t) * 10 <= nDocs =>
          t -> r9((c / len) * math.log(nDocs.toDouble / dfm(t)))
      }.toMap
    }
    val n2 = w.map { case (id, ws) =>
      id -> ws.values.map(x => x * x).sum
    }
    val expected = (for {
      (d1, w1) <- w.toSeq; (d2, w2) <- w.toSeq if d1 < d2
      shared = w1.keySet.intersect(w2.keySet) if shared.nonEmpty
      dp = shared.toSeq.map(t => w1(t) * w2(t)).sum
      cos = dp / (math.sqrt(n2(d1)) * math.sqrt(n2(d2)))
      // 0.2499995 is the exact half-up boundary of the query's
      // round(cos, 6) >= 0.25 keep rule.
      if cos >= 0.2499995
    } yield (d1, d2)).toSet
    val got = SparkEntry.queries("q_tfidf_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(got.length === got.toSet.size)
    assert(got.toSet === expected)
    val cs = SparkEntry.queries("q_tfidf_pairs")(spark, sf).collect()
      .map(_.getAs[Double]("cos"))
    assert(cs.forall(c => c >= 0.25 && c <= 1.000001))
  }

  test("tfidf_pairs: candidates come from the term-key join, not a cross join") {
    val plan = SparkEntry.queries("q_tfidf_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "posting-list pairing must be an equi-join on the term key")
  }

  // ---------------------------------------------------------- vector_pca

  test("vector_pca: unit axis whose Rayleigh quotient beats the start basis vector") {
    val out = SparkEntry.queries("q_vector_pca")(spark, sf).collect()
      .sortBy(_.getAs[Long]("pos"))
    val v = out.map(_.getAs[Double]("loading"))
    assert(v.length === 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3,
      "principal axis must be (approximately) unit norm")
    // Power iteration must not lose variance vs its start vector e0:
    // var(X·v3) ≥ var(X·e0) on the centered cloud (strictly greater
    // unless e0 already is the principal axis).
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val mean = Array.tabulate(64)(i => vecs.map(_(i)).sum / n)
    def variance(axis: Array[Double]): Double = {
      val proj = vecs.map(x =>
        x.zip(mean).map { case (a, m) => a - m }
          .zip(axis).map { case (c, w) => c * w }.sum)
      proj.map(p => p * p).sum / n
    }
    val e0 = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    assert(variance(v) > variance(e0),
      s"pca axis variance ${variance(v)} ≤ start-vector variance ${variance(e0)}")
  }

  test("vector_pca: per-iteration shuffle is dim-keyed, never row-keyed") {
    // The only hash exchanges in the whole query are the pos-keyed
    // (64-group) aggregations and the 1-row total folds — nothing
    // repartitions the n-row cloud by row key.
    val plan = SparkEntry.queries("q_vector_pca")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "all joins must be 1-row broadcasts")
  }

  // ---------------------------------------------------------- dp_counts

  test("dp_counts: noise is the exact hash-seeded Laplace draw on true counts") {
    val out = SparkEntry.queries("q_dp_counts")(spark, sf).collect()
    val truth = Tables.documents(spark, sf)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.length === truth.size)
    var nonzero = 0
    out.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val k = truth(key).toDouble
      val u = (h28(s"dp1#${key._1}/${key._2}") + 0.5) / 268435456.0
      val noise = (if (u < 0.5) 1.0 else -1.0) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val expected = math.rint((k + noise) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("k_noisy") - expected) < 1e-9, s"$key")
      if (math.abs(noise) > 1e-6) nonzero += 1
      assert(math.abs(noise) < 25, "Laplace(1) tail should be tiny")
    }
    assert(nonzero > out.length / 2, "noise must actually perturb the counts")
  }

  // ---------------------------------------------------------- rank_calibrate

  test("rank_calibrate: per-slice (rank-1)/(n-1), spanning [0,1], monotone") {
    val out = SparkEntry.queries("q_rank_calibrate")(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars"), r.getAs[Double]("calibrated")))
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length
      sorted.zipWithIndex.foreach { case ((_, _, _, c), i) =>
        // The op's definition: 6dp half-up-toward-+inf of i/(n-1),
        // computed in exact integer space (no double rounding).
        val expected = if (n == 1) 0.0
        else math.floor((2L * i * 1000000 + (n - 1)) /
          (2.0 * (n - 1))) / 1e6
        assert(c === expected, s"$lang rank $i")
      }
      assert(sorted.head._4 === 0.0 && (n == 1 || sorted.last._4 === 1.0))
    }
  }

  // ---------------------------------------------------------- knn_recall

  test("knn_recall: equals an end-to-end Scala recompute of both arms") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      r6(1.0 - dot / (na * nb))
    }
    val cents = vecs.filter(_._1 < 16)
    val qs = vecs.filter(_._1 < 4)
    val assign = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cos(v, cv), cid) }.min._2
    }.toMap
    val expected = qs.map { case (qid, qv) =>
      val exact = vecs.filter(_._1 != qid)
        .map { case (id, v) => (cos(v, qv), id) }.sorted.take(5).map(_._2)
      val probed = cents.map { case (cid, cv) => (cos(cv, qv), cid) }
        .sorted.take(4).map(_._2).toSet
      val ivf = vecs.filter { case (id, _) =>
        id != qid && probed(assign(id))
      }.map { case (id, v) => (cos(v, qv), id) }.sorted.take(5).map(_._2)
      val hits = exact.toSet.intersect(ivf.toSet).size
      (qid, hits.toLong, r6(hits / 5.0))
    }.toSeq
    val got = SparkEntry.queries("q_knn_recall")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("hits"),
        r.getAs[Double]("recall"))).toSeq
    assert(got === expected)
    assert(got.forall { case (_, h, r) => h <= 5 && r >= 0 && r <= 1 })
  }

  // ---------------------------------------------------------- encode_ids

  test("encode_ids: exact truncate/pad/hash-vocab tensor layout") {
    val out = SparkEntry.queries("q_encode_ids")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("id")))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty))
    assert(out.length === docs.length * 32, "every doc emits exactly 32 slots")
    val byDoc = out.groupBy(_._1)
    docs.foreach { case (id, toks) =>
      val row = byDoc(id).sortBy(_._2).map(_._3)
      assert(row.length === 32)
      val real = math.min(toks.length, 32)
      row.zipWithIndex.foreach { case (v, i) =>
        val expected =
          if (i < real) h28(s"tok#${toks(i)}") % 32767 + 1 else 0L
        assert(v === expected, s"doc $id pos $i")
      }
      // padding id 0 is reserved: no real token may collide into it
      assert(row.take(real).forall(_ > 0))
    }
  }

  test("encode_ids: scan-local — no key exchange in the plan") {
    val plan = SparkEntry.queries("q_encode_ids")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext,
      "tensor encoding must not shuffle on a key")
  }

  // ---------------------------------------------------------- maxsim

  test("maxsim: equals the Scala late-interaction recompute") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    def dist(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6(1.0 - dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    val qs = vecs.filter(_._1 < 4)
    val expected = vecs.filter(_._1 >= 10).groupBy(_._1 / 10)
      .map { case (gid, dvs) =>
        val mds = qs.map { case (_, qv) =>
          BigDecimal(dvs.map(dv => dist(dv._2, qv)).min)
        }
        gid -> (BigDecimal(4) - mds.sum).toDouble
      }.toSeq.sortBy { case (g, sc) => (-sc, g) }.take(10)
    val got = SparkEntry.queries("q_maxsim")(spark, sf).collect()
      .map(r => r.getAs[Long]("gid") -> r.getAs[Double]("score")).toSeq
    assert(got === expected)
    // A document containing a query vector verbatim would score 4.0;
    // disjoint groups must stay strictly below the ceiling.
    assert(got.forall(_._2 < 4.0))
  }

  // ---------------------------------------------------------- split_assign

  test("split_assign: exhaustive, disjoint, hash-stable, ~80/10/10") {
    val out = SparkEntry.queries("q_split_assign")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
    val total = Tables.documents(spark, sf).count()
    assert(out.length.toLong === total, "split must be exhaustive")
    assert(out.map(_._1).distinct.length === out.length, "and disjoint")
    out.foreach { case (id, split) =>
      val h = h28(s"split#$id")
      val expected =
        if (h < 214748365L) "train" else if (h < 241591910L) "val" else "test"
      assert(split === expected, s"doc $id")
    }
    val frac = out.groupBy(_._2).view.mapValues(_.length.toDouble / out.length)
    assert(math.abs(frac("train") - 0.8) < 0.06)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.04)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.04)
  }

  test("split_assign: scan-local — no exchange in the plan") {
    val plan = SparkEntry.queries("q_split_assign")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext)
  }

  // ---------------------------------------------------------- source_binary

  test("source_binary: byte-lossless round trip, one blob per document") {
    val out = SparkEntry.queries("q_source_binary")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
        r.getAs[String]("digest")))
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(col("text")).cast("long"),
        md5(col("text").cast("binary")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.sortBy(_._1) === expected.sortBy(_._1))
  }

  // ---------------------------------------------------------- stream_ohlc

  test("stream_ohlc: equals the batch twin bar for bar") {
    val stream = SparkEntry.queries("q_stream_ohlc")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("bucket"), r.getAs[Double]("open"),
        r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("volume"))).sorted
    val batch = SparkEntry.queries("q_ohlc_resample")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("bucket"), r.getAs[Double]("open"),
        r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("volume"))).sorted
    assert(stream.length === batch.length)
    assert(stream === batch)
  }
}
