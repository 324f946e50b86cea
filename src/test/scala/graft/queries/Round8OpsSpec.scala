package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape invariants for the round-7 snapshot wave,
  * documented and hardened in round 8 (PageRank / LM perplexity /
  * BPE merge iteration / weighted sampling / skyline / MAD outliers /
  * embedding outliers) at sf0.001. The oracle hash-compare proves
  * cross-engine equality; these pin what a hash can't see — mass
  * conservation, greedy-merge equivalence to a reference Scala BPE,
  * statistical bias direction, brute-force dominance equality — and
  * the exchange/window counts the 100 TB claims rest on. */
class Round8OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- pagerank

  test("pagerank: one step conserves rank mass (damped sum stays 1)") {
    val (ew, nn, r0, deg) = Graphs.frames(spark, sf)
    val s0 = r0.agg(sum("r")).head.getDouble(0)
    assert(math.abs(s0 - 1.0) < 1e-9, s"r0 sums to $s0")
    val r1 = Graphs.step(ew, nn, deg, r0)
    // Symmetric bipartite edges ⇒ every node has in-edges ⇒ the
    // damped update maps a unit distribution to a unit distribution
    // (up to the 12dp per-edge rounding).
    val s1 = r1.agg(sum("r")).head.getDouble(0)
    assert(math.abs(s1 - 1.0) < 1e-6, s"r1 sums to $s1")
  }

  test("pagerank: loop body joins edges broadcast-side, one exchange " +
    "total — under BOTH loop-storage routes") {
    // The fixture gate (Tables.loopPin) picks checkpoint at test
    // scale, so force each route explicitly: the exchange-free loop
    // claim must hold whether the edge frame is a LogicalRDD leaf
    // (small route) or an InMemoryTableScan (columnar route, whose
    // preserved outputPartitioning the claim rests on at 100×).
    for (mode <- Seq("off", "on")) {
      spark.conf.set("spark.graft.loop.columnar", mode)
      try {
        val (ew, nn, r0, deg) = Graphs.frames(spark, sf)
        assert(spark.conf.get("spark.graft.loop.lastStorage") ===
          (if (mode == "on") "columnar" else "checkpoint"))
        val plan =
          Graphs.step(ew, nn, deg, r0).queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"rank frame must broadcast onto the static edge frame:\n$plan")
        assert(!plan.contains("SortMergeJoin"),
          "loop body must not sort-merge the data-sized edge frame")
        // The ONLY hash exchange is the partial-aggregated
        // groupBy(dst); the edge side enters the join straight from
        // its pinned frame. On the columnar route the plan string
        // EMBEDS the InMemoryRelation's one-time build plan (which
        // legitimately contains its own exchanges but never
        // re-executes in the loop) — count only exchanges ABOVE it.
        val loopBody = plan.split("InMemoryRelation").head
        val exchanges =
          "Exchange hashpartitioning".r.findAllIn(loopBody).length
        assert(exchanges === 1,
          s"expected exactly 1 loop-body exchange (groupBy dst), " +
            s"got $exchanges:\n$plan")
      } finally {
        spark.conf.unset("spark.graft.loop.columnar")
        spark.catalog.clearCache()
      }
    }
  }

  test("pagerank: output is the descending top-100 and ranks are positive") {
    val out = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    assert(out.length === 100)
    val ranks = out.map(_.getAs[Double]("rank"))
    assert(ranks.forall(_ > 0))
    assert(ranks.sameElements(ranks.sortBy(-(_: Double))), "ranks not descending")
  }

  // ---------------------------------------------------------- lm_score

  test("lm_score: scores are negative log-probs and order tracks bigram frequency") {
    val out = SparkEntry.queries("q_lm_score")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_big") >= 1))
    val scores = out.map(_.getAs[Double]("lm_score"))
    assert(scores.forall(s => s < 0 && !s.isNaN && !s.isInfinite),
      "add-one-smoothed mean log-prob must be strictly negative and finite")
    // The spread must be real (a constant score would mean the model
    // collapsed): the synthetic corpus is template-generated, so the
    // fluent/unlikely gap is modest but must be clearly nonzero.
    assert(scores.distinct.length > 10)
    assert(scores.max > scores.min + 0.1,
      s"no separation between fluent and unlikely docs: [${scores.min}, ${scores.max}]")
  }

  // ---------------------------------------------------------- bpe_merges

  test("bpe_merges: equals a reference Scala BPE iteration (pick, apply, recount)") {
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    // Reference implementation, independent of the SQL: tokenize the
    // way TextKit.toks does, fold to vocab counts, pick the argmax
    // pair, apply it greedily left-to-right, recount adjacent pairs.
    val vocab = texts.iterator
      .flatMap(_.toLowerCase.split(" ").iterator.filter(_.nonEmpty))
      .foldLeft(Map.empty[String, Long]) { (m, t) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }.filter(_._1.length >= 2)
    def pairs(syms: Seq[String]): Seq[(String, String)] =
      syms.zip(syms.tail)
    val it1 = vocab.toSeq.flatMap { case (t, c) =>
      pairs(t.map(_.toString)).map(p => (p, c))
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val (mx, my) = it1.toSeq.minBy { case ((x, y), w) => (-w, x, y) }._1
    def applyMerge(syms: List[String]): List[String] = syms match {
      case a :: b :: rest if a == mx && b == my =>
        (a + b) :: applyMerge(rest)
      case a :: rest => a :: applyMerge(rest)
      case Nil => Nil
    }
    val it2 = vocab.toSeq.flatMap { case (t, c) =>
      pairs(applyMerge(t.map(_.toString).toList)).map(p => (p, c))
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val expected = it2.toSeq
      .map { case ((x, y), w) => (s"$x $y", w) }
      .sortBy { case (p, w) => (-w, p) }.take(50)
    val got = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("weight"))).toSeq
    assert(got === expected)
    // The applied rule changed the statistics: iteration 2 must not
    // be iteration 1 re-ranked (the round-7 duplicate-registry trap).
    val merged = mx + my
    assert(got.exists { case (p, _) =>
      p.split(' ').contains(merged)
    }, s"merged symbol '$merged' never appears in the recounted pairs")
  }

  test("bpe_merges: differs from q_bpe_pairs (it is a later training step)") {
    val a = SparkEntry.queries("q_bpe_pairs")(spark, sf).collect()
      .map(_.getString(0)).toSeq
    val b = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
      .map(_.getString(0)).toSeq
    assert(a !== b, "iteration-2 pair table must differ from iteration-1's")
  }

  // ---------------------------------------------------------- sample_weighted

  test("sample_weighted: Efraimidis-Spirakis keys bias the sample toward mass") {
    val out = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
    assert(out.length === 50)
    val skeys = out.map(_.getAs[Double]("skey"))
    assert(skeys.sameElements(skeys.sortBy(-(_: Double))), "keys not descending")
    // Weight ∝ n_chars ⇒ the winning keys are length-biased: the
    // sample's mean length must exceed the corpus mean (at this seed
    // the gap is large; any correct ES implementation shows it).
    val sampleMean = out.map(_.getAs[Number]("n_chars").doubleValue).sum / out.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean ≤ corpus mean $corpusMean")
  }

  test("sample_weighted: scan-local — no exchange before the top-k") {
    val plan = SparkEntry.queries("q_sample_weighted")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext,
      "weighted sampling must not shuffle on a key")
  }

  // ---------------------------------------------------------- skyline

  test("skyline: equals the brute-force dominance NOT EXISTS") {
    val part = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getAs[Number](2).intValue))
    val expected = part.filter { case (_, pr, sz) =>
      !part.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q_skyline")(spark, sf).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got === expected)
  }

  test("skyline: no partition-less window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("q_skyline")(spark, sf)
    val global = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"q_skyline has a partition-less window:\n${df.queryExecution.optimizedPlan}")
  }

  // ---------------------------------------------------------- anomaly_mad

  test("anomaly_mad: flags exactly the >3 robust-z rows of a Scala recompute") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val med = median(rows.map(_._3).toSeq)
      val devs = rows.map(r => (r._1, math.abs(r._3 - med)))
      val mad = median(devs.map(_._2).toSeq)
      devs.filter(_._2 > 4.4478 * mad).map(_._1).toSeq
    }.toSet
    val out = SparkEntry.queries("q_anomaly_mad")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSet === expected)
    assert(out.forall { r =>
      r.isNullAt(r.fieldIndex("robust_z")) || r.getAs[Double]("robust_z") > 3.0
    }, "every non-null robust z must clear the 3σ-equivalent gate")
  }

  test("anomaly_mad: spark.graft.mad.approx=true keeps the same shape") {
    // Build + collect the approx plan INSIDE the conf window, then
    // unset BEFORE building the exact plan — the builder reads the
    // conf at build time, so ordering is what keeps this comparison
    // approx-vs-exact rather than approx-vs-itself.
    spark.conf.set("spark.graft.mad.approx", "true")
    val approx = try {
      val out = SparkEntry.queries("q_anomaly_mad")(spark, sf)
      assert(out.columns.toSeq ===
        Seq("event_id", "event_type", "value", "robust_z"))
      assert(out.queryExecution.analyzed.toString
        .contains("approx_percentile"), "conf did not switch the aggregate")
      out.collect().map(_.getLong(0)).toSet
    } finally spark.conf.unset("spark.graft.mad.approx")
    val exact = SparkEntry.queries("q_anomaly_mad")(spark, sf)
    assert(!exact.queryExecution.analyzed.toString.contains("approx_percentile"))
    // approx_percentile returns an order statistic where the exact
    // percentile INTERPOLATES between the two middle values on
    // even-count groups, so a borderline event can flip across the
    // MAD gate — the sketch path must agree up to that boundary
    // effect, not bit-for-bit.
    val exactIds = exact.collect().map(_.getLong(0)).toSet
    val symDiff = (approx diff exactIds) ++ (exactIds diff approx)
    assert(symDiff.size <= math.max(2, exactIds.size / 20),
      s"approx path diverges beyond boundary effects: $symDiff")
  }

  // ---------------------------------------------------------- embed_outlier

  test("embed_outlier: flags exactly the mean+2σ tail of a Scala recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue,
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val expected = vecs.groupBy(_._2).flatMap { case (_, rows) =>
      val dim = rows.head._3.length
      val cent = Array.tabulate(dim) { i =>
        r6(rows.map(_._3(i)).sum / rows.length)
      }
      val dists = rows.map { case (id, _, v) =>
        id -> r6(math.sqrt(v.zip(cent).map { case (x, c) =>
          math.pow(x - c, 2)
        }.sum))
      }
      val n = dists.length
      val mean = dists.map(_._2).sum / n
      val sd = math.sqrt(math.max(
        dists.map(d => d._2 * d._2).sum / n - mean * mean, 0.0))
      dists.filter(_._2 > mean + 2 * sd).map(_._1).toSeq
    }.toSet
    val out = SparkEntry.queries("q_embed_outlier")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet === expected)
    assert(out.forall { r =>
      r.isNullAt(r.fieldIndex("z")) || r.getAs[Double]("z") > 2.0
    })
  }
}
