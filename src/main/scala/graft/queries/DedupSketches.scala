package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextKit._

/** Candidate-generation stages of the dedup operators, factored out
  * so the scale stress tests (ScalePathSpec) drive the SAME pipeline
  * the declared queries run — on adversarial corpora (hot shingles,
  * duplicate-heavy) where the 100 TB claims must hold: band-key
  * candidates ~linear in corpus size, prefix filtering pruning the
  * shared-shingle blowup. Inputs are any (doc_id, text) frame. */
object DedupStages {
  val P = 2147483647L // 2^31 - 1; (29-bit a)·(28-bit h) + b < 2^58

  /** The 32 universal-family permutation coefficients, shared by
    * bandKeys, MinHashUnionAggregator, and every oracle twin (one
    * definition → one hash family across engines). */
  def aCoef(i: Int): Long = graft.ml.Embedders.h28("a#" + i) * 2 + 1
  def bCoef(i: Int): Long = graft.ml.Embedders.h28("b#" + i)

  /** (doc_id, s): distinct word-trigram shingle sets — via the
    * compiled [[graft.functions.WordShingles]] kernel. The HOF chain
    * it replaces (filter(split) → transform(sequence) → concat_ws →
    * array_distinct) runs in the interpreted expression evaluator,
    * whose lambda call sites go megamorphic once other queries have
    * run in the JVM: the same shingle stage measured ~0.7 s in a
    * fresh JVM and 5–6 s mid-sweep (the sq_l2_distance pathology).
    * The kernel's output is string-identical (spec-pinned against
    * the HOF form), so every downstream md5 hash and the oracle
    * compare are unchanged. One barrier keeps scan parallelism. */
  def shingleSets(docs: DataFrame): DataFrame =
    barrier(docs.select(col("doc_id"),
      expr("word_shingles(lower(text), 3, true)").as("s")))

  /** (doc_id, band, bk): 8 bands × 4 rows of 32 minhash permutations,
    * computed scan-locally (one md5 per shingle + arithmetic rehash,
    * see q_dedup_minhash's notes). */
  def bandKeys(sh: DataFrame): DataFrame = {
    val aArr = "array(" + (0 until 32).map(aCoef).mkString(",") + ")"
    val bArr = "array(" + (0 until 32).map(bCoef).mkString(",") + ")"
    val hashed = barrier(sh.select(col("doc_id"),
      expr(s"transform(s, x -> ${h28("x")})").as("hs")))
    val sig = barrier(hashed.select(col("doc_id"), expr(
      s"""transform(sequence(0, 31), i ->
         |  array_min(transform(hs, h ->
         |    (element_at($aArr, i + 1) * h + element_at($bArr, i + 1)) % $P)))""".stripMargin)
      .as("sig")))
    sig.select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, 7), b -> md5(concat_ws(','," +
        " transform(slice(sig, b * 4 + 1, 4), x -> CAST(x AS STRING)))))"))
      .as(Seq("band", "bk")))
  }

  /** Distinct (id1, id2) band-collision candidates: the equi-join
    * that replaces the all-pairs scan. */
  def bandCandidates(bd: DataFrame): DataFrame =
    bd.as("x")
      .join(bd.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()

  /** PPJoin-style prefix-filtered candidates with size-compat
    * pruning — exact for Jaccard ≥ tau (prefix lemma, property-tested
    * in ScalePathSpec). */
  def prefixCandidates(shRaw: DataFrame, tau: Double = 0.6): DataFrame = {
    val sh = shRaw.withColumn("n", size(col("s")))
    val ex = sh.select(col("doc_id"), col("n"), explode(col("s")).as("sh"))
    val freq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = ex.join(broadcast(freq), "sh")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n") - ceil(col("n") * tau) + 1)
      .select("doc_id", "n", "sh")
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * tau <= col("b.n") && col("b.n") * tau <= col("a.n"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Verified near-dup pairs (id1, id2, jac): prefix-filtered
    * candidates + exact Jaccard over 60-bit shingle hashes, jac ≥
    * tau. The full q_dedup_near pipeline minus presentation —
    * shared by q_dup_clusters. See q_dedup_near's notes for the
    * hash-intersection and barrier rationale. */
  def nearDupPairs(docs: DataFrame, tau: Double): DataFrame =
    nearDupPairsFromShingles(shingleSets(docs), tau)

  /** Same exact pipeline over an already-shingled (doc_id, s) frame —
    * lets an audit pin ONE shingle materialization for several arms
    * (q_minhash_recall). */
  def nearDupPairsFromShingles(sh: DataFrame, tau: Double): DataFrame = {
    val cand = prefixCandidates(sh, tau)
    val hsets = sh.select(col("doc_id"),
      expr(s"array_sort(transform(s, x -> ${TextKit.h60("x")}))").as("hs"))
    // sorted_intersect_count: allocation-free merge walk over the
    // array_sort'ed distinct hash sets — exactly size(array_intersect)
    // on these inputs, without the per-pair OpenHashSet+array the
    // built-in allocates (the hot expression of the whole dedup
    // family at bucket volume).
    val pairs = barrier(cand
      .join(hsets.select(col("doc_id").as("id1"), col("hs").as("h1")), "id1")
      .join(hsets.select(col("doc_id").as("id2"), col("hs").as("h2")), "id2")
      .select(col("id1"), col("id2"),
        expr("CAST(sorted_intersect_count(h1, h2) AS DOUBLE)").as("ix"),
        size(col("h1")).as("na"), size(col("h2")).as("nb")))
    pairs
      .withColumn("jac", round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
      .filter(col("jac") >= tau)
      .select("id1", "id2", "jac")
  }

  /** CONVERGENCE-BOUNDED iterative MIN-LABEL PROPAGATION with
    * pointer jumping — connected components over a near-dup pair
    * list. Each round: (1) propagate: lab(v) ← min(lab(v), min over
    * neighbors u of lab(u)) — one edge join + one min-groupBy;
    * (2) jump: lab(v) ← lab(lab(v)) — one self-join (every label IS
    * a node id, so the join is total). Propagate extends reach by
    * one hop and jump doubles it, so covered component diameter
    * grows ≥ 2^r — but instead of a fixed round budget the loop
    * STOPS at the fixpoint (round-10 verdict #2: q_dbscan's core
    * graph converges in 5 rounds at sf0.1 while the old 16-round
    * budget spent ~⅔ of its cost idle, 211 s at 10×). Detection is
    * O(labels) per round: labels only DECREASE (every assignment is
    * a min), so Σlab — summed in DECIMAL(38,0), no wraparound —
    * strictly decreases until the fixpoint; an unchanged sum IS
    * convergence. The fixpoint equals the full RECURSIVE oracle by
    * construction, so the budget-outgrown failure mode of the fixed
    * unroll is gone; `maxRounds` (default 64 ⇒ diameter ≥ 2^64)
    * only guards a cyclic-update impossibility. Each round's
    * n_docs-row label frame is localCheckpoint'ed: without lineage
    * truncation the jump self-join DOUBLES the logical plan per
    * round (the analyzed-plan string hit the 2 GiB cap at 4 rounds)
    * and every round would re-derive the pair list; with it, a
    * round's plan is two joins over materialized partitions. Total
    * work is fixpointRounds × O(|V| + |E|) shuffles of tiny frames —
    * the MapReduce CC recipe that holds at any corpus size (cf.
    * Kiveris et al., "Connected Components in MapReduce and
    * Beyond").
    */
  def minLabelPropagate(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 64): DataFrame =
    minLabelPropagateCounted(nodes, pairs, maxRounds)._1

  /** [[minLabelPropagate]] plus the number of rounds executed —
    * which is the fixpoint round count + 1 (the final round proves
    * convergence by reproducing the previous sum). Exposed so specs
    * can pin the measured convergence instead of trusting a budget. */
  def minLabelPropagateCounted(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int) = {
    // Self-loops fold "min over self AND neighbors" into ONE
    // edge join + groupBy per round (no union with the label frame —
    // a union whose second child joins through the first trips
    // UnionBase.rewriteConstraints' attribute mapping).
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .unionByName(nodes.select(col("node").as("a"), col("node").as("b")))
      .localCheckpoint()
    def labSum(l: DataFrame): Option[java.math.BigDecimal] =
      Option(l.agg(sum(col("lab")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0))
    val init = nodes.select(col("node"), col("node").as("lab"))
    var l = init
    var prevSum = labSum(init)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // prop is checkpointed BEFORE the jump self-join references it
      // twice — otherwise both join sides recompute the propagate
      // stage (measured ~2× the per-round cost).
      val prop = edges.join(l, col("a") === col("node"))
        .groupBy("b").agg(min("lab").as("lab"))
        .select(col("b").as("node"), col("lab"))
        .localCheckpoint()
      l = prop.as("x")
        .join(prop.select(col("node").as("ln"), col("lab").as("lab2")).as("y"),
          col("x.lab") === col("y.ln"))
        .select(col("x.node").as("node"), col("y.lab2").as("lab"))
        .localCheckpoint()
      round += 1
      val s = labSum(l)
      converged = (s, prevSum) match {
        case (Some(a), Some(b)) => a.compareTo(b) == 0
        case (None, None) => true
        case _ => false
      }
      prevSum = s
    }
    if (!converged)
      System.err.println(s"[graft] minLabelPropagate: label sum still " +
        s"moving after maxRounds=$maxRounds — result may be a partial " +
        "fixpoint (the oracle hash-compare will fail loudly if so)")
    (l, round)
  }

  /** BOUNDED banded scored candidates — the pair-output dedup
    * family's scale route (round-15 verdict #1: the PPJoin prefix
    * candidate stage is clique-quadratic under replica mass — at the
    * 100× fixture's 100-member cliques q_jaccard_containment
    * exhausted the box's spill disk in the candidate DISTINCT, the
    * exact regime that CUT the old tf-idf route). Discipline copied
    * from tfidfTopkClustered:
    *
    *  1. CANDIDATES FROM r=1 MINHASH BANDS, not shingle postings:
    *     16 single-row bands (the first 16 permutations of the
    *     shared universal family), so a pair is tested at most 16
    *     times instead of once per shared prefix shingle (~50× at
    *     trigram scale). r=1 maximizes recall at the family's LOW-J
    *     operating points — P(pair bucketed) = 1-(1-J)^16: 0.9999 at
    *     J=0.6 (q_dedup_near's τ), 0.97 at J=1/3 (containment τ=0.5
    *     at equal sizes), 0.81 at J=0.1 (C=1 with |B|=10|A|) — where
    *     the deployed 8×4 sketch's J^4 row-AND would see ~0.67/0.09/
    *     ~0. Coarser buckets are the price; the cap bounds them.
    *  2. BUCKET CAP: the b-side of the candidate join keeps each
    *     bucket's `cap` smallest doc_ids. EXACT in the replica-clique
    *     regime that creates oversized buckets (members tie on
    *     jac/cont, ties break id ASC — the round-15 tie-clique
    *     argument), a recall trade on genuinely-mixed big buckets,
    *     which the band key already makes rare.
    *  3. SCORE INSIDE THE JOIN: ix via the sorted_intersect_count
    *     merge walk over the same 60-bit hash sets the exact arm
    *     verifies with — identical jac/cont values to the exact
    *     pipeline (same arrays, same rounding), so routed rows are
    *     bit-identical members of the exact answer. Consumers fold
    *     or screen in the SAME stage; pair rows never cross an
    *     exchange un-reduced.
    *
    * Returns DIRECTED scored candidates (id1, id2, ix, na, nb),
    * ix ≥ 1, id1 ≠ id2; duplicates across bands NOT deduped (heap
    * folds dedup by id2; CC edge consumers distinct() after their
    * τ screen, at post-screen volume). */
  /** The checkpointed (doc_id, hs, mhs, band, mh) banded frame
    * feeding [[bandedScoredPairs]]'s self-join — factored out so the
    * round-18 stage profile can time the band build separately from
    * the bucket join (verdict #3).
    *
    * ONE bucket-key exchange, MATERIALIZED: the capped build side
    * and the probe side both consume this frame — without the
    * checkpoint each re-derives the whole scan→shingle→md5→minhash
    * pipeline through its OWN exchange (round-16 plan audit: two
    * identical 9-node subtrees; ReuseExchange can't fire because
    * the sides' null filters differ), doubling the corpus hash work
    * and the shuffle. LogicalRDD preserves the (band, mh)
    * partitioning, so the window and the join add no exchange —
    * the tfidf cluster route's checkpointed-posting discipline. */
  def bandedFrame(docs: DataFrame): DataFrame = {
    val sh = shingleSets(docs)
    val aArr = "array(" + (0 until 16).map(aCoef).mkString(",") + ")"
    val bArr = "array(" + (0 until 16).map(bCoef).mkString(",") + ")"
    val hs = barrier(sh.filter(size(col("s")) >= 1).select(col("doc_id"),
      expr(s"array_sort(transform(s, x -> ${TextKit.h60("x")}))").as("hs"),
      expr(
        s"""transform(sequence(0, 15), i ->
           |  array_min(transform(transform(s, x -> ${h28("x")}), h ->
           |    (element_at($aArr, i + 1) * h + element_at($bArr, i + 1)) % $P)))""".stripMargin)
        .as("mhs")))
    val banded = hs.select(col("doc_id"), col("hs"), col("mhs"),
      posexplode(col("mhs")).as(Seq("band", "mh")))
    // Loop-frame storage route (Tables.loopPin, round 18) — above
    // the fixture gate this is a columnar persist: the frame is
    // ~8 M rows each dragging a full h60 array — deserialized
    // checkpoint blocks held one UnsafeRow + byte[] PER ROW in
    // old-gen (the sweep-variance GC mechanism, BENCH.md round 18);
    // the columnar cache stores compressed batches at a fraction of
    // the bytes and both consumers (cap window + probe side) scan it
    // vectorized. InMemoryTableScan preserves the (band, mh)
    // partitioning exactly as LogicalRDD did.
    banded.repartition(col("band"), col("mh"))
      .transform(graft.Tables.loopPin)
  }

  def bandedScoredPairs(docs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 6 && cap <= 100000,
      s"dedup bucket cap must be in [6,100000], got $cap")
    val f = bandedFrame(docs)
    val win = Window.partitionBy("band", "mh").orderBy("doc_id")
    val capped = f.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= cap)
      .drop("rn")
    f.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.mh") === col("b.mh") &&
          col("a.doc_id") =!= col("b.doc_id"))
      // SCORE EXACTLY ONCE PER PAIR: a replica-clique pair collides
      // in ~all 16 bands and would pay the merge walk 16× (measured
      // ~3 min/query at 100×); both sides carry their full signature,
      // so keep only the pair's MINIMAL colliding band — ≤16 long
      // compares replace 15 redundant O(|hs|) walks. Under-cap
      // buckets lose nothing (the minimal band's bucket contains the
      // pair by definition); in a CAPPED bucket a partner capped out
      // of the minimal band but present in a later one is dropped —
      // within the tie-clique regime ranks are id-determined and
      // IDENTICAL across bands (members share every bucket), so
      // clique exactness is unaffected; genuinely-mixed oversized
      // buckets were already the declared recall-contract territory.
      .filter(expr("first_eq_index(a.mhs, b.mhs) = a.band"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        expr("CAST(sorted_intersect_count(a.hs, b.hs) AS DOUBLE)").as("ix"),
        size(col("a.hs")).as("na"), size(col("b.hs")).as("nb"))
      .filter(col("ix") >= 1)
  }

  /** Mode dispatch for the pair-output dedup family (q_dedup_near /
    * q_dup_clusters / q_jaccard_containment) — the tfidfRoute
    * protocol: `spark.graft.dedup.pair.mode` ∈ exact|banded|auto
    * (default auto: exact below `spark.graft.dedup.pairGateDocs`
    * [20 000] docs — every oracled sf — banded at/past it), the
    * taken route surfaced on stderr AND the conf-readable
    * `spark.graft.dedup.pair.lastRoute`. */
  def pairRoute(s: org.apache.spark.sql.SparkSession, d: String)
      : String = {
    val gate = s.conf.get("spark.graft.dedup.pairGateDocs", "20000").toLong
    require(gate >= 1,
      s"spark.graft.dedup.pairGateDocs must be >= 1, got $gate")
    val mode = s.conf.get("spark.graft.dedup.pair.mode", "auto") match {
      case "auto" =>
        if (Tables.docCount(s, d) >= gate) "banded" else "exact"
      case m @ ("exact" | "banded") => m
      case other => throw new IllegalArgumentException(
        "spark.graft.dedup.pair.mode must be exact|banded|auto, " +
          s"got '$other'")
    }
    if (mode == "banded")
      System.err.println(
        "[graft] pair dedup: routing to the banded bucket-capped " +
          "route (recall contract 1-(1-J)^16, capped buckets exact " +
          "on replica cliques; set spark.graft.dedup.pair.mode=exact " +
          "to force the complete prefix-filtered form)")
    s.conf.set("spark.graft.dedup.pair.lastRoute", mode)
    mode
  }

  /** The shared bucket cap conf (default aligned with the tf-idf
    * route's 64 — proven to preserve tie-clique top-k / clique
    * connectivity at any clique size). */
  def pairBucketCap(s: org.apache.spark.sql.SparkSession): Int = {
    val c = s.conf.get("spark.graft.dedup.pair.bucketCap", "64").toInt
    require(c >= 6 && c <= 100000,
      s"spark.graft.dedup.pair.bucketCap must be in [6,100000], got $c")
    c
  }

  /** q_dedup_near's BANDED form: the ≥τ pair contract RESTRICTED to
    * each document's top-5 neighborhood under (jac DESC, id ASC) —
    * the q_tfidf_pairs routed-form precedent: ≤ n·k rows at any
    * clique structure, DECLARED columns (id1 < id2, jac) kept, jac
    * values bit-identical to the exact pipeline's. */
  def nearDupPairsBanded(docs: DataFrame, tau: Double, cap: Int)
      : DataFrame = {
    val scored = bandedScoredPairs(docs, cap)
      .withColumn("jac",
        round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
      .filter(col("jac") >= tau)
    topNeighborsFold(scored, "jac")
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"), col("jac"))
      .distinct()
  }

  /** q_dup_clusters' BANDED edge set: ALL verified ≥τ capped-bucket
    * pairs (no top-k restriction — CC needs a SPANNING subgraph, not
    * a neighborhood sample; within a replica clique every member
    * pairs with the bucket's smallest ids, a star that connects the
    * clique exactly — the round-15 connectivity argument). Distinct
    * undirected pairs, post-screen volume ≤ n·16·cap. */
  def nearDupEdgesBanded(docs: DataFrame, tau: Double, cap: Int)
      : DataFrame =
    bandedScoredPairs(docs, cap)
      .withColumn("jac",
        round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
      .filter(col("jac") >= tau)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
      .distinct()

  /** q_jaccard_containment's BANDED form: directed containment
    * (cont = |A∩B| / |A| ≥ τ) restricted to each id1's top-5 under
    * (cont DESC, id2 ASC). The asymmetric small-in-big pair sits at
    * J = C·|A| / (|A|+|B|−C·|A|) — the r=1 band's 1-(1-J)^16 holds
    * usable recall down to ~10× size skew (0.81 at J=0.1), the
    * declared contract of the route. */
  def containmentBanded(docs: DataFrame, tau: Double, cap: Int)
      : DataFrame = {
    val scored = bandedScoredPairs(docs, cap)
      .withColumn("cont", round(col("ix") / col("na"), 6))
      .filter(col("cont") >= tau)
    topNeighborsFold(scored, "cont")
  }

  /** Per-id1 top-5 heap fold under (score DESC, id2 ASC) — the
    * TopKNeighborsAggregator map-side reduction (pair rows never
    * cross an exchange; band duplicates dedup by id2 inside the
    * heap). Returns (id1, id2, `scoreCol`). */
  private def topNeighborsFold(scored: DataFrame, scoreCol: String)
      : DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKNeighborsAggregator(5),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
    scored
      .groupBy("id1")
      .agg(topk(col("id2"), col("ix").cast("long"), col(scoreCol)).as("tk"))
      .select(col("id1"), explode(col("tk")).as("e"))
      .select(col("id1"), col("e._1").as("id2"), col("e._3").as(scoreCol))
  }

  /** Naive share-any-shingle candidates — the baseline the prefix
    * filter prunes. Test-only: a production plan never runs this. */
  def naiveCandidates(shRaw: DataFrame): DataFrame = {
    val ex = shRaw.select(col("doc_id"), explode(col("s")).as("sh"))
    ex.as("a")
      .join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }
}

/** Sketch-based near-dup detection — the 100 TB dedup paths.
  *
  * All three sketches are fully deterministic (md5-derived hash
  * families, TextKit) so the DuckDB oracle runs the SAME algorithm
  * and the hash compare is exact — no "sketches are approximate"
  * escape hatch. Approximation here is in RECALL (which pairs become
  * candidates), never in the computed values.
  *
  *  - MinHash + LSH banding: 32 permutations from one base hash via a
  *    universal family h_i(x) = (a_i·x + b_i) mod p (one md5 per
  *    shingle, 32 cheap arithmetic ops — NOT 32 md5s); 8 bands × 4
  *    rows; candidates = band-key equi-join; exact Jaccard verify.
  *    This is the plan q_dedup_near grows into when shared-shingle
  *    candidates stop fitting: band keys bound candidate volume
  *    regardless of shingle frequency skew.
  *  - SimHash: 60-bit signed-sum signature over token hashes weighted
  *    by term frequency; Hamming-distance pairs found by the 4-chunk
  *    pigeonhole join (distance ≤ 3 ⟹ one 15-bit chunk equal) —
  *    complete, not probabilistic.
  *  - Fingerprinting: 8-char rolling shingle hashes, min/count/sum
  *    per document — entirely scan-local (no shuffle at all).
  */
object DedupSketches {

  private val P = 2147483647L // 2^31 - 1; (29-bit a)·(28-bit h) + b < 2^58

  val qs: Seq[Q] = Seq(

    Q("q_dedup_minhash",
      s"""WITH tok AS (SELECT doc_id, $toksDuck AS w FROM documents),
         |sh AS (SELECT doc_id, ${shingles3Duck("w")} AS s FROM tok WHERE len(w) >= 3),
         |ex AS (SELECT doc_id, ${h28Duck("sh")} AS h0
         |       FROM (SELECT doc_id, unnest(s) AS sh FROM sh) u),
         |sd AS (SELECT i AS seed,
         |         ${h28Duck("'a#' || i")} * 2 + 1 AS a,
         |         ${h28Duck("'b#' || i")} AS b
         |       FROM range(32) t(i)),
         |mh AS (SELECT doc_id, seed, min((a * h0 + b) % $P) AS mh
         |       FROM ex CROSS JOIN sd GROUP BY doc_id, seed),
         |bd AS (SELECT doc_id, seed // 4 AS band,
         |         md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bk
         |       FROM mh GROUP BY doc_id, seed // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |         FROM bd x JOIN bd y
         |           ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |v AS (SELECT c.id1, c.id2, round(${jaccardDuck("a.s", "b.s")}, 6) AS jac
         |      FROM cand c JOIN sh a ON a.doc_id = c.id1
         |                  JOIN sh b ON b.doc_id = c.id2)
         |SELECT id1, id2, jac FROM v WHERE jac >= 0.6
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      // Stages shared with the scale stress tests (DedupStages):
      // barriers between the computed array columns (tokens →
      // shingles → shingle hashes → signature) stop Catalyst from
      // inlining each array expression into the next stage's lambdas
      // (the interpreted HOF evaluator would recompute it per
      // element — one md5 per shingle would become 32 md5s per
      // shingle). The whole signature is computed SCAN-LOCALLY: one
      // md5 per shingle, then 32 arithmetic rehashes folded by
      // array_min inside a single projection — no seed cross-join,
      // no (doc, seed) shuffle. Hash family parameters are
      // driver-computed constants (bit-equal to the oracle's in-SQL
      // derivation; parity is unit-tested). No size filter: pushdown
      // would inline the shingle chain into a per-row interpreted
      // Filter (see q_dedup_near); empty arrays hash to no band rows
      // and are dropped by explode/join anyway.
      val sh = DedupStages.shingleSets(Tables.documents(s, d))
      val cand = DedupStages.bandCandidates(DedupStages.bandKeys(sh))
      // Verify join: NO broadcast hint — the full shingle-set table
      // must never be forced onto every executor (8 GB ceiling at
      // scale). At this sf Catalyst's size estimate picks broadcast
      // by itself; at 100 TB it degrades to sort-merge on doc_id,
      // which is the right plan there. Verification runs on sorted
      // 60-bit shingle hashes through the allocation-free
      // sorted_intersect_count merge walk (the q_dedup_near verify
      // representation — same counts as raw-string array_intersect,
      // oracle-checked) instead of two string-set intersections.
      val hsets = sh.select(col("doc_id"),
        expr(s"array_sort(transform(s, x -> ${TextKit.h60("x")}))").as("hs"))
      cand
        .join(hsets.select(col("doc_id").as("id1"), col("hs").as("h1")), "id1")
        .join(hsets.select(col("doc_id").as("id2"), col("hs").as("h2")), "id2")
        .select(col("id1"), col("id2"),
          expr("CAST(sorted_intersect_count(h1, h2) AS DOUBLE)").as("ix"),
          size(col("h1")).as("na"), size(col("h2")).as("nb"))
        .withColumn("jac",
          round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
        .filter(col("jac") >= 0.6)
        .select("id1", "id2", "jac")
        .orderBy("id1", "id2")
    },

    Q("q_dedup_simhash",
      s"""WITH tok AS (SELECT doc_id, unnest($toksDuck) AS t FROM documents),
         |tf AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |th AS (SELECT doc_id, cnt, ${h60Duck("t")} AS h FROM tf),
         |bits AS (SELECT doc_id, j,
         |           sum((((h >> j) & 1) * 2 - 1) * cnt) AS sgn
         |         FROM th CROSS JOIN range(60) r(j) GROUP BY doc_id, j),
         |sig AS (SELECT doc_id,
         |          sum(CASE WHEN sgn > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
         |        FROM bits GROUP BY doc_id),
         |ch AS (SELECT doc_id, simhash, c, (simhash >> (15 * c)) & 32767 AS chunk
         |       FROM sig CROSS JOIN range(4) t(c)),
         |cand AS (SELECT DISTINCT x.doc_id AS id1, x.simhash AS s1,
         |                y.doc_id AS id2, y.simhash AS s2
         |         FROM ch x JOIN ch y
         |           ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
         |SELECT id1, id2, bit_count(xor(s1, s2)) AS hamming
         |FROM cand WHERE bit_count(xor(s1, s2)) <= 3
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      // ONE hash exchange on doc_id, reused by BOTH aggregates
      // (HashPartitioning(doc_id) satisfies the (doc_id, t)
      // clustering too), and the 60 per-bit signed sums run as 60
      // aggregate expressions of ONE groupBy over the (doc, token)
      // frame — the oracle's `CROSS JOIN range(60)` explode never
      // materializes. The old shape built the ×60 row blowup and
      // paid a doomed map-side partial aggregate on (doc_id, j):
      // ~30 M keys per task against per-task multiplicity ~3 — the
      // 60 GB spill the round-17 spill columns flagged (the
      // q_butterfly partial-agg multiplicity lesson, applied to an
      // explode instead of a wedge stream). h materializes through
      // the aggregate's child projection — computed once per token
      // row, never per bit. The inner fanout is parallelism-only
      // (gated); explode parallelism comes from the doc_id exchange.
      val tf = fanout(Tables.documents(s, d))
        .select(col("doc_id"), explode(expr(toks)).as("t"))
        .repartition(col("doc_id"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
        .withColumn("h", expr(h60("t")))
      val sgns = (0 to 59).map(j =>
        sum(expr(s"((shiftright(h, $j) & 1) * 2 - 1) * cnt")).as(s"s$j"))
      val sig = tf.groupBy("doc_id").agg(sgns.head, sgns.tail: _*)
        .select(col("doc_id"), expr((0 to 59).map(j =>
            s"IF(s$j > 0, CAST(${1L << j} AS BIGINT), CAST(0 AS BIGINT))")
          .mkString(" + ")).as("simhash"))
      val ch = sig.select(col("doc_id"), col("simhash"),
          explode(expr("sequence(0, 3)")).as("c"))
        .withColumn("chunk",
          expr("shiftright(simhash, CAST(15 * c AS INT)) & 32767"))
      val cand = ch.as("x")
        .join(ch.as("y"),
          col("x.c") === col("y.c") && col("x.chunk") === col("y.chunk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("x.simhash").as("s1"),
          col("y.doc_id").as("id2"), col("y.simhash").as("s2"))
        .distinct()
      cand
        .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
        .filter(col("hamming") <= 3)
        .select("id1", "id2", "hamming")
        .orderBy("id1", "id2")
    },

    // Rolling 8-char shingle fingerprint — min-hash, distinct count,
    // and (exact, order-free) sum of distinct shingle hashes per doc.
    // Zero shuffles: every column is computed inside the scan stage.
    Q("q_fingerprint",
      s"""WITH g AS (SELECT doc_id,
         |    list_distinct([${h28Duck("substr(lower(text), i, 8)")}
         |                   for i in range(1, length(text) - 6)]) AS hs
         |  FROM documents WHERE length(text) >= 8)
         |SELECT doc_id,
         |  list_aggregate(hs, 'min') AS fp_min,
         |  len(hs) AS n_shingles,
         |  CAST(list_aggregate(hs, 'sum') AS BIGINT) AS fp_sum
         |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
      barrier(Tables.documents(s, d)
        .filter(length(col("text")) >= 8)
        .withColumn("lt", lower(col("text"))))
        .withColumn("hs",
          expr(s"array_distinct(transform(sequence(1, length(lt) - 7), i -> ${h28("substr(lt, i, 8)")}))"))
        .select(col("doc_id"),
          expr("array_min(hs)").as("fp_min"),
          size(col("hs")).as("n_shingles"),
          expr("aggregate(hs, CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("fp_sum"))
        .orderBy("doc_id")
    },

    // Corpus sketch profile via the custom MinHash-UNION UDAF: one
    // 32-perm signature per language, built by folding raw shingle
    // hashes inside the aggregation (no per-doc signature arrays
    // materialize; the shuffle carries one 32-long buffer per lang —
    // map-side combined, associative). The oracle replays the union
    // as explode + per-perm min: same family (DedupStages.aCoef/
    // bCoef), same values, exact hash match. Output is one SCALAR
    // row per (lang, perm) — the signature is posexploded after the
    // aggregation (cost: 32 rows per group) so every cell the
    // harness hashes is a scalar; the aggregation itself still
    // carries exactly one 32-long buffer per lang on the shuffle.
    Q("q_minhash_profile", {
      val aList = "[" + (0 until 32).map(DedupStages.aCoef).mkString(",") + "]"
      val bList = "[" + (0 until 32).map(DedupStages.bCoef).mkString(",") + "]"
      s"""WITH w AS (SELECT doc_id, lang, $toksDuck AS w FROM documents),
         |s AS (SELECT doc_id, lang, ${shinglesNDuck("w", 3, distinct = true)} AS s FROM w),
         |h AS (SELECT lang, ${h28Duck("x")} AS h
         |      FROM (SELECT lang, unnest(s) AS x FROM s)),
         |p AS (SELECT lang, i,
         |        min(($aList[i + 1] * h + $bList[i + 1]) % ${DedupStages.P}) AS mh
         |      FROM h CROSS JOIN range(0, 32) t(i)
         |      GROUP BY lang, i),
         |d AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
         |SELECT p.lang, d.n_docs, p.i AS perm_i, p.mh AS mh
         |FROM p JOIN d ON p.lang = d.lang
         |ORDER BY p.lang, p.i""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val mhUnion = udaf(new graft.functions.MinHashUnionAggregator())
      val docs = Tables.documents(s, d)
      val hs = barrier(barrier(docs.withColumn("w", expr(toks)))
        .withColumn("sset", expr(shinglesN("w", 3, distinct = true)))
        .select(col("doc_id"), col("lang"),
          expr(s"transform(sset, x -> ${h28("x")})").as("hs")))
      val sigs = hs.groupBy("lang").agg(mhUnion(col("hs")).as("sig"))
      val nd = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      sigs.join(nd, "lang")
        .select(col("lang"), col("n_docs"), posexplode(col("sig")))
        .select(col("lang"), col("n_docs"),
          col("pos").cast("long").as("perm_i"), col("col").as("mh"))
        .orderBy("lang", "perm_i")
    },

    // SUBSTRING-SPAN DEDUP: documents can share long verbatim spans
    // (boilerplate, licenses, quoted passages) without being
    // near-dups as WHOLE documents — the case doc-level Jaccard
    // misses and suffix-array dedup (Lee et al., "Deduplicating
    // Training Data Makes Language Models Better") targets. The
    // scalable approximation: stride-16 character 64-grams per doc,
    // a span is DUPLICATED when its hash occurs in ≥2 distinct docs;
    // report each doc's duplicated-span fraction (the strided grid
    // detects any shared run ≥ 79 chars — window + stride − 1 —
    // wherever it starts; a true suffix array is exact but needs a
    // global sort of every suffix, ~20× the data in intermediate
    // state). Plan: scan-local explode (≤ len/16 spans/doc), one
    // hash-keyed count for span doc-frequency, one join back on the
    // span hash, one per-doc aggregation — all partial-aggregated
    // equi-shuffles on high-cardinality keys; nothing quadratic,
    // nothing broadcast-unbounded.
    Q("q_span_dedup",
      s"""WITH sp AS (SELECT doc_id,
         |    ${TextKit.h60Duck("substr(text, CAST(i AS INT), 64)")} AS h
         |  FROM documents,
         |    unnest(range(1, greatest(length(text) - 63, 1) + 1, 16)) AS t(i)),
         |dfh AS (SELECT h, count(*) AS df
         |        FROM (SELECT DISTINCT doc_id, h FROM sp) GROUP BY h)
         |SELECT sp.doc_id, count(*) AS n_spans,
         |  CAST(sum(CASE WHEN dfh.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
         |  round(sum(CASE WHEN dfh.df >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         |    AS dup_frac
         |FROM sp JOIN dfh USING (h)
         |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin) { (s, d) =>
      val sp = fanout(Tables.documents(s, d))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, greatest(length(text) - 63, 1), 16)," +
            " i -> substring(text, CAST(i AS INT), 64))")).as("w"))
        .select(col("doc_id"), expr(TextKit.h60("w")).as("h"))
      val dfh = sp.select("doc_id", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("df"))
      sp.join(dfh, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum((col("df") >= 2).cast("int")).cast("long").as("n_dup_spans"),
          round(sum((col("df") >= 2).cast("int")).cast("double") / count(lit(1)), 6)
            .as("dup_frac"))
        .orderBy("doc_id")
    },

    // MINHASH LSH RECALL AUDIT — candidate-generation quality of the
    // deployed 8-band × 4-row sketch against the EXACT ≥0.6 Jaccard
    // pair set: the number every LSH dedup config must publish next
    // to its speedup (the S-curve says 32 permutations at τ=0.6
    // catch most-but-not-all true pairs — this MEASURES the miss
    // rate instead of trusting the formula; q_knn_recall's
    // discipline applied to the dedup family). precision = verified
    // fraction of candidates (the wasted-verification cost), recall
    // = caught fraction of true pairs (the silent-duplicate risk).
    // Both are small-denominator rationals → exact-integer-space
    // rounding; NULL-guarded for degenerate corpora. Scale: both
    // arms are the SAME shared stages the declared dedup operators
    // run (band equi-join / prefix-filtered exact join — nothing
    // all-pairs); the three count frames are 1-row broadcasts.
    Q("q_minhash_recall",
      s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksDuck AS w FROM documents),
         |sh AS MATERIALIZED (SELECT doc_id, ${shingles3Duck("w")} AS s FROM tok
         |       WHERE len(w) >= 3),
         |${prefixCandDuck(0.6, ordered = true, name = "tc")},
         |${jaccardPairsDuck(name = "tc", out = "tv")},
         |tr AS (SELECT id1, id2 FROM tv WHERE jac >= 0.6),
         |ex AS (SELECT doc_id, ${h28Duck("sh")} AS h0
         |       FROM (SELECT doc_id, unnest(s) AS sh FROM sh) u),
         |sd AS (SELECT i AS seed,
         |         ${h28Duck("'a#' || i")} * 2 + 1 AS a,
         |         ${h28Duck("'b#' || i")} AS b
         |       FROM range(32) t(i)),
         |mh AS (SELECT doc_id, seed, min((a * h0 + b) % ${DedupStages.P}) AS mh
         |       FROM ex CROSS JOIN sd GROUP BY doc_id, seed),
         |bd AS (SELECT doc_id, seed // 4 AS band,
         |         md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bk
         |       FROM mh GROUP BY doc_id, seed // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |         FROM bd x JOIN bd y
         |           ON x.band = y.band AND x.bk = y.bk
         |           AND x.doc_id < y.doc_id),
         |nt AS (SELECT count(*) AS n_true FROM tr),
         |nc AS (SELECT count(*) AS n_cand FROM cand),
         |nh AS (SELECT count(*) AS hits FROM tr JOIN cand USING (id1, id2))
         |SELECT n_true, n_cand, hits,
         |  CASE WHEN n_true = 0 THEN NULL ELSE
         |    CAST(floor((2 * hits * 1000000 + n_true) / (2.0 * n_true))
         |      / 1000000.0 AS DOUBLE) END AS recall,
         |  CASE WHEN n_cand = 0 THEN NULL ELSE
         |    CAST(floor((2 * hits * 1000000 + n_cand) / (2.0 * n_cand))
         |      / 1000000.0 AS DOUBLE) END AS precision
         |FROM nt CROSS JOIN nc CROSS JOIN nh""".stripMargin) { (s, d) =>
      // Truth arm = the exact prefix-filtered pipeline (PPJoin lemma
      // — exact for Jaccard ≥ τ, property-tested in ScalePathSpec);
      // the O(n²) brute force lives only in the small-sf oracle.
      // Candidate arm = the deployed band join. Shingle sets are
      // pinned once for both arms.
      // PANEL GATE (round 16): past spark.graft.dedup.pairGateDocs
      // the truth arm's exact pair enumeration is clique-quadratic —
      // the 100× sweep died ENOSPC inside it. No exact τ-pair method
      // survives that regime (that is WHY the deployed operators
      // route); an audit at scale must therefore measure on a
      // bounded sample: both arms restrict to the deterministic
      // doc_id % stride == 0 panel (~gate docs). Per-pair band
      // collision is pair-local and deterministic, so panel recall
      // is an unbiased estimate of corpus recall over the panel's
      // pair population. Below the gate (every oracled sf) the full
      // corpus runs — CORRECTNESS unchanged.
      val docsAll = Tables.documents(s, d)
      val docs = {
        val gate =
          s.conf.get("spark.graft.dedup.pairGateDocs", "20000").toLong
        require(gate >= 1,
          s"spark.graft.dedup.pairGateDocs must be >= 1, got $gate")
        val nDocs = Tables.docCount(s, d)
        if (auditOn(s) && nDocs >= gate) {
          val stride = (nDocs + gate - 1) / gate
          System.err.println(
            s"[graft] minhash recall audit: corpus $nDocs >= gate " +
              s"$gate — auditing on the deterministic 1/$stride panel " +
              "(the exact truth arm is clique-quadratic past the gate)")
          // Sample on a HASH of the id, not the raw id (round-16
          // advice): replica cliques are laid out as base*k+i, so a
          // raw doc_id % stride sharing a factor with the clique
          // period keeps at most one replica per clique — a panel
          // with near-zero true pairs and a degenerate recall
          // estimate. murmur3 breaks the alignment; still
          // deterministic per corpus.
          docsAll.filter(pmod(hash(col("doc_id")), lit(stride)) === 0)
        } else docsAll
      }
      val sh = DedupStages.shingleSets(docs)
        .localCheckpoint(eager = false)
      val cand = DedupStages.bandCandidates(DedupStages.bandKeys(sh))
      val nc = cand.agg(count(lit(1)).as("n_cand"))
      // Truth arm under spark.graft.audit=false: never built — n_true
      // and hits come back NULL and recall/precision NULL out through
      // the CASE arithmetic; the candidate arm (the deployed sketch)
      // is all that runs.
      val (nt, nh) =
        if (auditOn(s)) {
          val truth = DedupStages.nearDupPairsFromShingles(sh, tau = 0.6)
            .select("id1", "id2")
          (truth.agg(count(lit(1)).as("n_true")),
            truth.join(cand, Seq("id1", "id2"))
              .agg(count(lit(1)).as("hits")))
        } else (
          s.sql("SELECT CAST(NULL AS BIGINT) AS n_true"),
          s.sql("SELECT CAST(NULL AS BIGINT) AS hits"))
      nt.crossJoin(nc).crossJoin(nh)
        .selectExpr("n_true", "n_cand", "hits",
          "CASE WHEN n_true = 0 THEN NULL ELSE " +
            "CAST(floor((2 * hits * 1000000 + n_true) / (2.0 * n_true))" +
            " / 1000000.0 AS DOUBLE) END AS recall",
          "CASE WHEN n_cand = 0 THEN NULL ELSE " +
            "CAST(floor((2 * hits * 1000000 + n_cand) / (2.0 * n_cand))" +
            " / 1000000.0 AS DOUBLE) END AS precision")
    },

    // EXPLICIT BLOOM FILTER — build an m=4096-bit, k=3 Bloom filter
    // over the distinct custkeys holding an 'F'-status order, probe
    // it with EVERY customer, and audit: bits set, observed vs
    // predicted (fill^k) false-positive rate, and the no-false-
    // negative invariant (every in-set key probes positive — the
    // membership contract). This is the EXPOSED-state twin of
    // Spark's opaque runtime BloomFilterAggregate (q_join_runtime_
    // bloom USES one inside a join; this MATERIALIZES the bit set as
    // a portable frame — the cross-system/cross-day pre-filter
    // contract, mergeable by union like q_hll_registers' registers).
    // Scale: the build folds to the ≤m-row distinct-bit frame in ONE
    // partial-aggregated groupBy and BROADCASTS onto the probe side
    // (the probe scan never shuffles — the whole point of a Bloom
    // pre-filter); per-key hit counts fold in one partial-aggregated
    // groupBy over 3n seed rows. The exact in-set audit join is the
    // full shuffle the filter exists to avoid — the AUDIT arm,
    // dropped at 100 TB (q_hll_registers discipline). Determinism:
    // positions are md5-derived h60 mod 4096 (engine-portable, no
    // rand()); every output is exact-integer except two divisions of
    // exact operands rounded 9dp.
    Q("q_bloom_probe", {
      val posB = s"${h60Duck("'bloom#' || i::VARCHAR || '#' || k::VARCHAR")} % 4096"
      s"""WITH b AS (SELECT DISTINCT o_custkey AS k FROM orders
         |       WHERE o_orderstatus = 'F'),
         |seeds AS (SELECT unnest([0, 1, 2]) AS i),
         |bits AS (SELECT DISTINCT $posB AS pos FROM b CROSS JOIN seeds),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_build FROM b),
         |bs AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits),
         |p AS (SELECT c_custkey AS k FROM customer),
         |ph AS (SELECT p.k, CAST(count(*) AS BIGINT) AS hits
         |   FROM p CROSS JOIN seeds
         |   JOIN bits ON $posB = bits.pos GROUP BY p.k),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probe FROM p),
         |po AS (SELECT CAST(count(*) AS BIGINT) AS n_positive
         |   FROM ph WHERE hits = 3),
         |ins AS (SELECT CAST(count(*) AS BIGINT) AS n_in_set
         |   FROM p WHERE k IN (SELECT k FROM b))
         |SELECT 4096 AS m, 3 AS k, n_build, bits_set,
         |  round(CAST(bits_set AS DOUBLE) / 4096, 9) AS fill_ratio,
         |  n_probe, n_in_set, n_positive,
         |  n_positive - n_in_set AS n_false_pos,
         |  round(CAST(n_positive - n_in_set AS DOUBLE)
         |    / (n_probe - n_in_set), 9) AS fpr_observed,
         |  round((CAST(bits_set AS DOUBLE) / 4096)
         |    * (CAST(bits_set AS DOUBLE) / 4096)
         |    * (CAST(bits_set AS DOUBLE) / 4096), 9) AS fpr_predicted
         |FROM nb CROSS JOIN bs CROSS JOIN np
         |  CROSS JOIN po CROSS JOIN ins""".stripMargin
    }) { (s, d) =>
      val pos = h60("concat('bloom#', CAST(i AS STRING), '#'," +
        " CAST(k AS STRING))") + " % 4096"
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k")).distinct()
        .localCheckpoint(eager = false)
      val seeds = expr("explode(array(0, 1, 2))").as("i")
      val bits = b.select(col("k"), seeds)
        .select(expr(pos).as("pos")).distinct()
        .localCheckpoint(eager = false)
      val p = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val ph = p.select(col("k"), seeds)
        .join(broadcast(bits), expr(pos) === bits("pos"))
        .groupBy("k").agg(count(lit(1)).cast("long").as("hits"))
      val nb = b.agg(count(lit(1)).cast("long").as("n_build"))
      val bs = bits.agg(count(lit(1)).cast("long").as("bits_set"))
      val np = p.agg(count(lit(1)).cast("long").as("n_probe"))
      val po = ph.filter(col("hits") === 3)
        .agg(count(lit(1)).cast("long").as("n_positive"))
      val ins =
        if (auditOn(s)) p.join(b, "k")
          .agg(count(lit(1)).cast("long").as("n_in_set"))
        else s.sql("SELECT CAST(NULL AS BIGINT) AS n_in_set")
      nb.crossJoin(broadcast(bs)).crossJoin(broadcast(np))
        .crossJoin(broadcast(po)).crossJoin(broadcast(ins))
        .selectExpr("4096 AS m", "3 AS k", "n_build", "bits_set",
          "round(CAST(bits_set AS DOUBLE) / 4096, 9) AS fill_ratio",
          "n_probe", "n_in_set", "n_positive",
          "n_positive - n_in_set AS n_false_pos",
          "round(CAST(n_positive - n_in_set AS DOUBLE)" +
            " / (n_probe - n_in_set), 9) AS fpr_observed",
          "round((CAST(bits_set AS DOUBLE) / 4096)" +
            " * (CAST(bits_set AS DOUBLE) / 4096)" +
            " * (CAST(bits_set AS DOUBLE) / 4096), 9) AS fpr_predicted")
    },
  )
}
