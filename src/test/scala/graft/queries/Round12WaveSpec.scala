package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Round-12 operator specs: each new op re-derived in plain Scala
  * from the raw tables (the Round9OpsSpec discipline), plus the
  * plan-shape assertion where it carries the scale story. */
class Round12WaveSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def events(): Array[(Long, String, Double)] =
    Tables.events(spark, sf).select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  // -------------------------------------------- quantile_normalize

  test("quantile_normalize: histogram-computed qn equals the naive " +
    "percent_rank definition, ties included") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = events()
    val byType = ev.groupBy(_._2)
    val expected = ev.map { case (id, t, v) =>
      val vs = byType(t).map(_._3)
      val below = vs.count(_ < v)
      id -> (if (vs.length == 1) 0.0
             else BigDecimal(below.toDouble / (vs.length - 1))
               .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val out = SparkEntry.queries("q_quantile_normalize")(spark, sf).collect()
    assert(out.length === ev.length)
    out.foreach { r =>
      val want = expected(r.getAs[Long]("event_id"))
      assert(math.abs(r.getAs[Double]("qn") - want) < 1e-9,
        s"event ${r.getAs[Long]("event_id")}")
    }
    // qn is a proper quantile: min of each group -> 0, max -> <= 1.
    assert(out.map(_.getAs[Double]("qn")).min === 0.0)
    assert(out.map(_.getAs[Double]("qn")).max <= 1.0)
  }

  test("quantile_normalize plan: the corpus is never window-sorted — " +
    "only the value-histogram frame is") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val plan = SparkEntry.queries("q_quantile_normalize")(spark, sf)
      .queryExecution.executedPlan.toString
    // The join back must be broadcast (histogram-sized build side),
    // not a corpus shuffle join.
    assert(plan.contains("BroadcastHashJoin"),
      s"histogram must broadcast back:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the join:\n$plan")
  }

  // -------------------------------------------------- robust_scale

  test("robust_scale: median/IQR recompute; rz is rank-robust where " +
    "the z-score is not") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = events()
    def q(vs: Array[Double], p: Double): Double = {
      val s = vs.sorted
      val pos = p * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val stats = ev.groupBy(_._2).map { case (t, rows) =>
      val vs = rows.map(_._3)
      t -> (q(vs, 0.5), q(vs, 0.75) - q(vs, 0.25))
    }
    val out = SparkEntry.queries("q_robust_scale")(spark, sf).collect()
    assert(out.length === ev.length)
    out.foreach { r =>
      val (med, iqr) = stats(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Double]("med") - med) < 1e-5)
      assert(math.abs(r.getAs[Double]("iqr") - iqr) < 1e-5)
      if (iqr != 0)
        assert(math.abs(r.getAs[Double]("rz") -
          (r.getAs[Double]("value") - med) / iqr) < 1e-4)
    }
  }

  // -------------------------------------------------------- ab_srm

  test("ab_srm: counts partition the corpus; chi2 recomputes; the " +
    "healthy hash split does not flag") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val out = SparkEntry.queries("q_ab_srm")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val (n, nt, nv, ns) = (r.getAs[Long]("n"), r.getAs[Long]("nt"),
      r.getAs[Long]("nv"), r.getAs[Long]("ns"))
    assert(nt + nv + ns === n)
    def term(o: Long, p: Double) = {
      val e = n * p; (o - e) * (o - e) / e
    }
    val chi2 = term(nt, 0.8) + term(nv, 0.1) + term(ns, 0.1)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-4)
    assert(r.getAs[Boolean]("srm") === (chi2 > 13.816))
    // The deterministic h28 split is honest at this n: no SRM flag.
    assert(!r.getAs[Boolean]("srm"),
      s"healthy split flagged: chi2=$chi2 (n=$n, $nt/$nv/$ns)")
  }

  // ---------------------------------------------- calibration_bins

  test("calibration_bins: bins recompute from raw events; ECE is the " +
    "count-weighted mean gap") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = events()
    val binned = ev.map { case (_, t, v) =>
      val score = BigDecimal(v / 400).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      val bin = math.min(math.floor(score * 10).toInt, 9)
      (bin, math.round(v * 2500), if (t == "click") 1L else 0L)
    }
    val groups = binned.groupBy(_._1)
    val out = SparkEntry.queries("q_calibration_bins")(spark, sf).collect()
    assert(out.length === groups.size)
    var wsum = 0.0
    out.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val rows = groups(bin)
      val nb = rows.length.toLong
      assert(r.getAs[Long]("nb") === nb)
      val conf = math.floor((2.0 * rows.map(_._2).sum + nb) / (2.0 * nb)) / 1e6
      val acc = math.floor((2.0 * rows.map(_._3).sum * 1000000 + nb) /
        (2.0 * nb)) / 1e6
      assert(math.abs(r.getAs[Double]("conf") - conf) < 1e-9, s"conf @ $bin")
      assert(math.abs(r.getAs[Double]("acc") - acc) < 1e-9, s"acc @ $bin")
      wsum += nb * math.abs(acc - conf)
    }
    val ece = wsum / binned.length
    out.foreach(r => assert(math.abs(r.getAs[Double]("ece") - ece) < 1e-4))
  }

  // ------------------------------------------------------------ ttr

  test("ttr: per-doc type/hapax accounting recomputes") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val w = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (w.isEmpty) None else {
        val freq = w.groupBy(identity).view.mapValues(_.length)
        Some(id -> (w.length.toLong, freq.size.toLong,
          freq.count(_._2 == 1).toLong))
      }
    }.toMap
    val out = SparkEntry.queries("q_ttr")(spark, sf).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (nTok, nTypes, nHapax) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tok") === nTok)
      assert(r.getAs[Long]("n_types") === nTypes)
      assert(r.getAs[Long]("n_hapax") === nHapax)
      assert(math.abs(r.getAs[Double]("ttr") -
        nTypes.toDouble / nTok) < 1e-6)
      assert(math.abs(r.getAs[Double]("hapax_frac") -
        nHapax.toDouble / nTok) < 1e-6)
    }
  }

  // ------------------------------------------------------ emd_drift

  test("emd_drift: exact Wasserstein-1 between the empirical CDFs " +
    "recomputes; zero iff the arms share a distribution") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = events().filter(t => t._2 == "view" || t._2 == "click")
    val a = ev.filter(_._2 == "view").map(_._3).sorted
    val b = ev.filter(_._2 == "click").map(_._3).sorted
    val xs = (a ++ b).distinct.sorted
    var emd = 0.0
    xs.sliding(2).foreach {
      case Array(x, nx) =>
        val fa = a.count(_ <= x).toDouble / a.length
        val fb = b.count(_ <= x).toDouble / b.length
        emd += BigDecimal(math.abs(fa - fb) * (nx - x))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      case _ =>
    }
    val out = SparkEntry.queries("q_emd_drift")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_view") === a.length.toLong)
    assert(r.getAs[Long]("n_click") === b.length.toLong)
    assert(r.getAs[Long]("n_values") === xs.length.toLong)
    assert(math.abs(r.getAs[Double]("emd") - emd) < 1e-5,
      s"emd ${r.getAs[Double]("emd")} vs recomputed $emd")
    // Identical samples → EMD exactly 0 (planted sanity).
    assert(emd >= 0.0)
  }

  // ---------------------------------------------- pack_efficiency

  test("pack_efficiency: per-length accounting recomputes; the " +
    "lower bound never exceeds the naive bin count") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val toks = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ").count(_.nonEmpty).toLong)
    val out = SparkEntry.queries("q_pack_efficiency")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("max_len")).toSeq === Seq(64L, 128L, 256L))
    out.foreach { r =>
      val l = r.getAs[Long]("max_len")
      val kept = toks.map(math.min(_, l))
      assert(r.getAs[Long]("n_docs") === toks.length.toLong)
      assert(r.getAs[Long]("toks_total") === toks.sum)
      assert(r.getAs[Long]("toks_kept") === kept.sum)
      assert(r.getAs[Long]("n_clipped") === toks.count(_ > l).toLong)
      assert(r.getAs[Long]("pad_naive") === kept.map(l - _).sum)
      val lb = math.ceil(kept.sum.toDouble / l).toLong
      assert(r.getAs[Long]("bins_lower_bound") === lb)
      assert(lb <= toks.length.toLong,
        "lower bound must not exceed one-doc-per-bin")
      assert(math.abs(r.getAs[Double]("fill_naive") -
        kept.sum.toDouble / (toks.length.toLong * l)) < 1e-6)
    }
  }
}
