package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import TextKit._

/** Language-model-flavoured corpus operators — the statistical
  * fluency/tokenizer tooling a pretraining pipeline runs between raw
  * text and training shards (reference analog: the description corpus
  * the store keeps per photo, photo_vector_search.py:128-140; these
  * operators are the LLM-data-pipeline extension the survey calls
  * for).
  *
  * Scale design notes (100 TB posture):
  *  - Both operators reduce the corpus to VOCABULARY-sized frames
  *    (unigram/bigram counts) via partial-aggregated groupBys before
  *    any join; nothing corpus-sized is ever joined to anything
  *    corpus-sized except by token key.
  *  - All log/ratio math runs on identical exact-integer operands in
  *    both engines and is rounded per-term BEFORE the cross-row sum,
  *    which accumulates in DECIMAL(38,6) — so even the per-document
  *    double scores hash-match (the dsum discipline, package.scala).
  */
object Language {

  /** Shared NB prediction chain (fit on the 80% hash-split train
    * docs, score the held-out 20%, argmax per doc) ending in a
    * `conf(actual, predicted, n)` confusion CTE — written once so
    * q_naive_bayes (the confusion report) and q_confusion_metrics
    * (the per-class P/R/F1 readout over the SAME predictions) stay
    * one definition. See q_naive_bayes's scaladoc for the fit/score
    * scale design. */
  private val nbPredDuck: String =
    s"""s AS (SELECT doc_id, lang, $toksDuck AS w,
       |    CASE WHEN ${h28Duck("'split#' || doc_id")} < 214748365
       |         THEN 'train' ELSE 'test' END AS split
       |  FROM documents),
       |trtok AS (SELECT lang, unnest(w) AS tok FROM s
       |          WHERE split = 'train'),
       |ct AS (SELECT lang, tok, count(*) AS cnt FROM trtok
       |       GROUP BY 1, 2),
       |tokc AS (SELECT lang, count(*) AS ntok FROM trtok GROUP BY 1),
       |vocab AS (SELECT DISTINCT tok FROM trtok),
       |vsz AS (SELECT count(*) AS v FROM vocab),
       |prior AS (SELECT lang, round(ln(CAST(count(*) AS DOUBLE) /
       |      (SELECT count(*) FROM s WHERE split = 'train')), 9)
       |      AS lnprior
       |  FROM s WHERE split = 'train' GROUP BY 1),
       |dense AS (SELECT vocab.tok, tokc.lang,
       |    round(ln(CAST(coalesce(ct.cnt, 0) + 1 AS DOUBLE)
       |             / (tokc.ntok + vsz.v)), 9) AS lnp
       |  FROM vocab CROSS JOIN tokc CROSS JOIN vsz
       |  LEFT JOIN ct ON ct.tok = vocab.tok AND ct.lang = tokc.lang),
       |tetok AS (SELECT doc_id, unnest(w) AS tok FROM s
       |          WHERE split = 'test'),
       |tscore AS (SELECT t.doc_id, de.lang,
       |    CAST(sum(CAST(de.lnp AS DECIMAL(38,9))) AS DOUBLE) AS tsum
       |  FROM tetok t JOIN dense de ON t.tok = de.tok GROUP BY 1, 2),
       |score AS (SELECT s.doc_id, s.lang AS actual, p.lang AS cand,
       |    round(p.lnprior + coalesce(t.tsum, 0), 9) AS score
       |  FROM s CROSS JOIN prior p
       |  LEFT JOIN tscore t ON t.doc_id = s.doc_id AND t.lang = p.lang
       |  WHERE s.split = 'test'),
       |pred AS (SELECT doc_id, actual, cand AS predicted,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, cand) AS rk
       |  FROM score)""".stripMargin

  private val nbConfDuck: String =
    s"""$nbPredDuck,
       |conf AS (SELECT actual, predicted, count(*) AS n
       |  FROM pred WHERE rk = 1 GROUP BY 1, 2)""".stripMargin

  /** Spark twin of [[nbPredDuck]]'s rk = 1 rows: one
    * (doc_id, actual, predicted) row per held-out document — the
    * per-document prediction surface q_mcnemar consumes; nbConfusion
    * folds it to the confusion frame. */
  private def nbPredictions(s: SparkSession, d: String): DataFrame = {
    val base = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
      .withColumn("split",
        when(expr(h28("concat('split#', CAST(doc_id AS STRING))"))
          < 214748365L, "train").otherwise("test"))
      .select("doc_id", "lang", "w", "split")
      .localCheckpoint(eager = false)
    val trtok = base.filter(col("split") === "train")
      .select(col("lang"), explode(col("w")).as("tok"))
    val ct = trtok.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    val tokc = trtok.groupBy("lang").agg(count(lit(1)).as("ntok"))
    val vocab = trtok.select("tok").distinct()
    val vsz = vocab.agg(count(lit(1)).as("v"))
    val ntr = base.filter(col("split") === "train")
      .agg(count(lit(1)).as("nd"))
    val prior = base.filter(col("split") === "train")
      .groupBy("lang").agg(count(lit(1)).as("ndl"))
      .crossJoin(broadcast(ntr))
      .select(col("lang"),
        round(log(col("ndl").cast("double") / col("nd")), 9)
          .as("lnprior"))
      .localCheckpoint(eager = false)
    val dense = vocab.crossJoin(broadcast(tokc))
      .crossJoin(broadcast(vsz))
      .join(broadcast(ct), Seq("tok", "lang"), "left")
      .select(col("tok"), col("lang"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("ntok") + col("v"))), 9).as("lnp"))
    val tscore = base.filter(col("split") === "test")
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .join(broadcast(dense), "tok")
      .groupBy(col("doc_id"), col("lang").as("cand"))
      .agg(sum(col("lnp").cast(DecimalType(38, 9))).cast("double")
        .as("tsum"))
    val scored = base.filter(col("split") === "test")
      .select(col("doc_id"), col("lang").as("actual"))
      .crossJoin(broadcast(prior.withColumnRenamed("lang", "cand")))
      .join(tscore, Seq("doc_id", "cand"), "left")
      .select(col("doc_id"), col("actual"), col("cand"),
        round(col("lnprior") + coalesce(col("tsum"), lit(0.0)), 9)
          .as("score"))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("cand"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("actual"), col("cand").as("predicted"))
  }

  /** Spark twin of [[nbConfDuck]]: the unordered confusion frame. */
  private def nbConfusion(s: SparkSession, d: String): DataFrame =
    nbPredictions(s, d)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  val qs: Seq[Q] = Seq(

    // LM FLUENCY SCORE — per-document mean log-probability under an
    // add-one-smoothed bigram model trained on the corpus itself:
    // score(d) = mean over bigrams (x,y) of ln((c(x,y)+1)/(c(x)+V)).
    // This is the CCNet/Gopher-style "perplexity filter" signal: a
    // document whose word transitions are improbable under the
    // corpus model is boilerplate, gibberish, or the wrong language,
    // and scores far below the corpus mode. Scale: the bigram and
    // unigram count frames are vocabulary-sized partial aggregates;
    // the per-document bigram stream joins them BY TOKEN KEY (two
    // shuffle joins that co-partition with the count frames); the
    // 1-row vocab size broadcasts. Per-term ln() runs on exact
    // BIGINT-ratio operands and is rounded to 6dp before the
    // DECIMAL(38,6) per-doc sum, so accumulation order cannot drift
    // the score. The per-doc MEAN is then rounded in EXACT INTEGER
    // arithmetic — micro = floor((2·S + n) / (2n)) over the micro-
    // unit sum S — because round(S/n, 6) of a small-denominator
    // rational can land exactly on a decimal half, where Spark's
    // HALF_UP and DuckDB's float round disagree (one doc in 5000 hit
    // this at sf0.1; ties here round toward +inf by definition, in
    // both engines, always).
    Q("q_lm_score",
      s"""WITH w AS (SELECT doc_id, $toksDuck AS w FROM documents),
         |inst AS (SELECT doc_id, unnest([{'x': w[i], 'y': w[i+1]}
         |           for i in range(1, len(w))]) AS b
         |         FROM w WHERE len(w) >= 2),
         |bi AS (SELECT doc_id, b.x AS x, b.y AS y FROM inst),
         |bc AS (SELECT x, y, count(*) AS cxy FROM bi GROUP BY x, y),
         |uni AS (SELECT unnest(w) AS t FROM w),
         |uc AS (SELECT t, count(*) AS cx FROM uni GROUP BY t),
         |vs AS (SELECT count(*) AS v FROM uc)
         |SELECT bi.doc_id,
         |  count(*) AS n_big,
         |  floor((2 * CAST(sum(CAST(round(ln((CAST(cxy AS DOUBLE) + 1) /
         |        (CAST(cx AS DOUBLE) + v)), 6) AS DECIMAL(38,6)))
         |      * 1000000 AS BIGINT) + count(*))
         |    / (2.0 * count(*))) / 1000000.0 AS lm_score
         |FROM bi, vs, bc, uc
         |WHERE bc.x = bi.x AND bc.y = bi.y AND uc.t = bi.x
         |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin) { (s, d) =>
      val w = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select("doc_id", "w")
      val bi = w.filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(w) - 1),
            |i -> struct(element_at(w, i) AS x, element_at(w, i + 1) AS y))"""
            .stripMargin)).as("b"))
        .select(col("doc_id"), col("b.x").as("x"), col("b.y").as("y"))
      val bc = bi.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      val uc = w.select(explode(col("w")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("cx"))
      val vs = uc.agg(count(lit(1)).as("v"))
      bi.join(bc, Seq("x", "y"))
        .join(uc.withColumnRenamed("t", "x"), "x")
        .crossJoin(broadcast(vs))
        .withColumn("lp",
          round(log((col("cxy").cast("double") + 1) /
            (col("cx").cast("double") + col("v"))), 6)
            .cast(DecimalType(38, 6)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_big"),
          (floor(((sum(col("lp")) * 1000000).cast("long") * 2 +
            count(lit(1))) / (count(lit(1)).cast("double") * 2))
            / 1000000.0).as("lm_score"))
        .orderBy("doc_id")
    },

    // BPE MERGE ITERATION — tokenizer-training step 2: pick the #1
    // merge rule (the argmax adjacent symbol pair q_bpe_pairs only
    // RANKS), APPLY it left-to-right non-overlapping across every
    // word's symbol sequence, and recount pairs over the merged
    // sequences — the post-merge statistics that select merge rule
    // #2. Symbol sequences are materialized as US-separated strings
    // (chr(31) never appears in tokens), so "apply the merge" is one
    // scan-local replace(): string replace is left-to-right
    // non-overlapping in both engines, which is exactly BPE's greedy
    // application order (e.g. merging (a,a) over "aaa" yields
    // [aa, a], not two overlapping pairs). Scale: the corpus folds
    // ONCE to its zipf-bounded word vocabulary (localCheckpoint
    // reuses that fold for both the rule pick and the apply pass);
    // the 1-row merge rule is a TakeOrderedAndProject broadcast; the
    // merge application and the pair recount are vocabulary-sized
    // scan-local string ops. Weights are exact BIGINT sums, so both
    // engines hash-match. Output pairs are space-joined symbols
    // (tokens are whitespace-split, so ' ' is boundary-safe).
    Q("q_bpe_merges",
      s"""WITH uni AS (SELECT unnest($toksDuck) AS t FROM documents),
         |uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
         |p1 AS (SELECT unnest([substr(t, i, 1) || chr(31) ||
         |            substr(t, i + 1, 1) for i in range(1, len(t))]) AS pr, c
         |       FROM uc WHERE len(t) >= 2),
         |r1 AS (SELECT pr FROM p1 GROUP BY pr
         |       ORDER BY sum(c) DESC, pr LIMIT 1),
         |m AS (SELECT string_split(replace(
         |          array_to_string(string_split(t, ''), chr(31)),
         |          (SELECT pr FROM r1),
         |          replace((SELECT pr FROM r1), chr(31), '')),
         |        chr(31)) AS a, c
         |      FROM uc WHERE len(t) >= 2),
         |p2 AS (SELECT unnest([a[i] || ' ' || a[i + 1]
         |            for i in range(1, len(a))]) AS pair, c
         |       FROM m WHERE len(a) >= 2)
         |SELECT pair, CAST(sum(c) AS BIGINT) AS weight
         |FROM p2 GROUP BY pair
         |ORDER BY weight DESC, pair LIMIT 50""".stripMargin) { (s, d) =>
      val sep = "\u001f"
      val uc = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(explode(col("w")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
        .filter(length(col("t")) >= 2)
        .localCheckpoint()
      val rule = uc
        .select(explode(expr(
          s"""transform(sequence(1, length(t) - 1),
             |i -> concat(substr(t, i, 1), '$sep', substr(t, i + 1, 1)))"""
            .stripMargin)).as("pr"), col("c"))
        .groupBy("pr").agg(sum("c").as("w"))
        .orderBy(col("w").desc, col("pr")).limit(1)
        .select(col("pr"))
      uc.crossJoin(broadcast(rule))
        .withColumn("a", split(expr(
          s"""replace(concat_ws('$sep', split(t, '')), pr,
             |replace(pr, '$sep', ''))""".stripMargin), sep))
        .filter(size(col("a")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(a) - 1),
            |i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"""
            .stripMargin)).as("pair"), col("c"))
        .groupBy("pair").agg(sum("c").as("weight"))
        .orderBy(col("weight").desc, col("pair"))
        .limit(50)
    },

    // KL DISTRIBUTION DRIFT — per-language KL divergence between
    // that slice's token distribution P and the corpus-wide
    // distribution Q: KL(P‖Q) = Σ_t P(t)·ln(P(t)/Q(t)). The domain-
    // shift detector a mixture pipeline runs per source/slice before
    // reweighting (a slice whose KL spikes is off-distribution —
    // wrong language tag, templated spam, domain drift). Every term
    // derives from exact BIGINT counts: P = c_lt/n_l, Q = c_t/n, so
    // the log ratio is ln((c_lt·n)/(n_l·c_t)) on double-cast exact
    // operands. Scale: the corpus folds once to the (lang, token)
    // count frame (partial-aggregated; checkpointed so the three
    // marginals don't re-scan); marginals join back BY TOKEN KEY
    // (vocab-sized) and BY LANG (broadcast); the 1-row total
    // broadcasts; per-term round(9) before the DECIMAL(38,9) sum.
    Q("q_kl_drift",
      s"""WITH tok AS (SELECT lang, unnest($toksDuck) AS t FROM documents),
         |lc AS (SELECT lang, t, count(*) AS clt FROM tok GROUP BY lang, t),
         |lt AS (SELECT lang, CAST(sum(clt) AS BIGINT) AS nl FROM lc
         |       GROUP BY lang),
         |tc AS (SELECT t, CAST(sum(clt) AS BIGINT) AS ct FROM lc GROUP BY t),
         |nn AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM tc),
         |term AS (SELECT lc.lang, nl,
         |    round((CAST(clt AS DOUBLE) / nl) *
         |          ln((CAST(clt AS DOUBLE) * n) /
         |             (CAST(nl AS DOUBLE) * ct)), 9) AS kt
         |  FROM lc JOIN lt USING (lang) JOIN tc USING (t) CROSS JOIN nn)
         |SELECT lang, nl AS n_tokens,
         |  round(CAST(sum(CAST(kt AS DECIMAL(38,9))) AS DOUBLE), 6) AS kl
         |FROM term GROUP BY lang, nl ORDER BY lang""".stripMargin) { (s, d) =>
      val tok = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(col("lang"), explode(col("w")).as("t"))
      val lc = tok.groupBy("lang", "t").agg(count(lit(1)).as("clt"))
        .localCheckpoint()
      val lt = lc.groupBy("lang").agg(sum("clt").as("nl"))
      val tc = lc.groupBy("t").agg(sum("clt").as("ct"))
      val nn = broadcast(tc.agg(sum("ct").as("n")))
      lc.join(broadcast(lt), "lang").join(tc, "t").crossJoin(nn)
        .withColumn("kt",
          round((col("clt").cast("double") / col("nl")) *
            log((col("clt").cast("double") * col("n")) /
              (col("nl").cast("double") * col("ct"))), 9))
        .groupBy("lang", "nl")
        .agg(round(sum(col("kt").cast(DecimalType(38, 9))).cast("double"), 6)
          .as("kl"))
        .select(col("lang"), col("nl").as("n_tokens"), col("kl"))
        .orderBy("lang")
    },

    // TRAINING-TENSOR ENCODE — the last step before shards: each
    // document becomes a FIXED-LENGTH id sequence (truncate to 32
    // tokens, right-pad with id 0), with token ids from a salted
    // 32767-way vocabulary hash (+1 so 0 stays the padding id) —
    // the corpus-scale declared form of the hash tokenizer the
    // inference seam uses per partition (ml/Embedders'
    // OnnxTextEmbedder.tokenize: same truncate/pad/hash-vocab
    // shape). Rows are (doc_id, pos, id) — the flat layout of an
    // (n_docs × 32) id tensor, which is what q_export_shards/
    // q_pack_sequences consume. Scale: tokenize once (barrier),
    // then a scan-local 32-row position explode + hash projection —
    // zero pre-sort shuffles, no state; the tensor never exists as
    // a driver-side object.
    Q("q_encode_ids",
      s"""WITH w AS (SELECT doc_id, $toksDuck AS w FROM documents)
         |SELECT doc_id, t.i AS pos,
         |  CASE WHEN t.i < least(len(w), 32)
         |    THEN ${h28Duck("'tok#' || w[CAST(t.i AS INT) + 1]")} % 32767 + 1
         |    ELSE 0 END AS id
         |FROM w, UNNEST(generate_series(0, 31)) AS t(i)
         |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(col("doc_id"), col("w"),
          explode(expr("sequence(0, 31)")).as("pos"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          when(col("pos") < least(size(col("w")), lit(32)),
            expr(h28("concat('tok#', element_at(w, pos + 1))")) % 32767 + 1)
            .otherwise(lit(0L)).as("id"))
        .orderBy("doc_id", "pos")
    },

    // NAIVE BAYES LANGUAGE CLASSIFIER — train a multinomial NB
    // (add-one smoothing) on the 80% hash-split train docs, score
    // the held-out 20%, and report the confusion matrix: the
    // classic supervised twin of q_lang_id's heuristic (and the
    // cheapest "train a model IN the engine" demonstration — the
    // whole fit is two partial-aggregated count frames). The split
    // reuses q_split_assign's exact salted hash, so "train" here is
    // the SAME set every other operator calls train. Scale: the fit
    // folds the corpus to VOCABULARY-sized frames (class-conditional
    // counts, class totals, priors — all zipf-bounded ≪ corpus);
    // the dense smoothed log-prob table is |V|×|C| and BROADCASTS
    // onto the test token stream (the ×|C| fan-out is the NB scoring
    // cost, |C|=5); per-doc-per-class scores fold back partial-
    // aggregated; the argmax is a |C|-row-per-doc window. Scoring
    // starts from test-docs × classes with a LEFT join, so a doc
    // with zero in-vocabulary tokens still gets prior-only scores
    // instead of vanishing. Determinism: every ln runs on exact
    // BIGINT-ratio operands, rounded 9dp per-term BEFORE the
    // DECIMAL(38,9) sum (q_lm_score discipline); argmax ties break
    // on class name ascending in both engines.
    Q("q_naive_bayes",
      s"""WITH $nbConfDuck
         |SELECT actual, predicted, n FROM conf
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      nbConfusion(s, d).orderBy("actual", "predicted")
    },

    // CLASSIFIER METRICS — per-class precision / recall / F1 plus
    // micro accuracy and macro-F1 over the q_naive_bayes held-out
    // confusion: the eval-suite member that grades a CLASSIFIER
    // (q_retrieval_eval grades a RANKING, q_auc a SCORER, q_abtest
    // an INTERVENTION) — the report every labeling/filter model in
    // a curation pipeline ships with before its predictions gate
    // data. The prediction chain is the shared NB definition
    // (nbConfDuck / nbConfusion — one source of truth with
    // q_naive_bayes), so this op's scale posture is NB's; everything
    // past the confusion runs on a ≤|classes|²-row frame.
    // Determinism: precision = tp/pred and recall = tp/actual are
    // single divisions of exact integers; F1 uses the count identity
    // 2·tp/(actual+pred) (≡ the harmonic mean, but ONE division of
    // exact integers instead of a chain of rounded ratios); macro-F1
    // decimal-sums the rounded per-class F1s (dsum discipline);
    // nullif guards a never-predicted class (prec NULL, its macro
    // contribution 0 — the sklearn zero_division convention).
    Q("q_confusion_metrics",
      s"""WITH $nbConfDuck,
         |a AS (SELECT actual AS class, CAST(sum(n) AS BIGINT)
         |      AS n_actual FROM conf GROUP BY 1),
         |p AS (SELECT predicted AS class, CAST(sum(n) AS BIGINT)
         |      AS n_predicted FROM conf GROUP BY 1),
         |tpt AS (SELECT actual AS class, CAST(sum(n) AS BIGINT) AS tp
         |      FROM conf WHERE actual = predicted GROUP BY 1),
         |cls AS (SELECT class, coalesce(n_actual, 0) AS n_actual,
         |      coalesce(n_predicted, 0) AS n_predicted,
         |      coalesce(tp, 0) AS tp
         |  FROM a FULL JOIN p USING (class) LEFT JOIN tpt USING (class)),
         |m AS (SELECT class, n_actual, n_predicted, tp,
         |    round(tp / CAST(nullif(n_predicted, 0) AS DOUBLE), 6) AS prec,
         |    round(tp / CAST(nullif(n_actual, 0) AS DOUBLE), 6) AS rec,
         |    round(2 * tp / CAST(nullif(n_actual + n_predicted, 0)
         |      AS DOUBLE), 6) AS f1 FROM cls),
         |g AS (SELECT
         |    round(CAST(sum(tp) AS BIGINT)
         |      / CAST(sum(n_actual) AS DOUBLE), 6) AS accuracy,
         |    round(CAST(sum(CAST(coalesce(f1, 0) AS DECIMAL(38,6)))
         |      AS DOUBLE) / count(*), 6) AS macro_f1 FROM m)
         |SELECT class, n_actual, n_predicted, tp, prec, rec, f1,
         |  accuracy, macro_f1
         |FROM m CROSS JOIN g ORDER BY class""".stripMargin) { (s, d) =>
      val conf = nbConfusion(s, d).localCheckpoint(eager = false)
      val a = conf.groupBy(col("actual").as("class"))
        .agg(sum("n").cast("long").as("n_actual"))
      val p = conf.groupBy(col("predicted").as("class"))
        .agg(sum("n").cast("long").as("n_predicted"))
      val tpt = conf.filter(col("actual") === col("predicted"))
        .groupBy(col("actual").as("class"))
        .agg(sum("n").cast("long").as("tp"))
      val cls = a.join(p, Seq("class"), "full_outer")
        .join(tpt, Seq("class"), "left")
        .select(col("class"),
          coalesce(col("n_actual"), lit(0L)).as("n_actual"),
          coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
          coalesce(col("tp"), lit(0L)).as("tp"))
      val m = cls.selectExpr("class", "n_actual", "n_predicted", "tp",
        "round(tp / CAST(nullif(n_predicted, 0) AS DOUBLE), 6) AS prec",
        "round(tp / CAST(nullif(n_actual, 0) AS DOUBLE), 6) AS rec",
        "round(2 * tp / CAST(nullif(n_actual + n_predicted, 0)" +
          " AS DOUBLE), 6) AS f1")
        .localCheckpoint(eager = false)
      val g = m.agg(
        round(sum("tp").cast("long")
          / sum("n_actual").cast("double"), 6).as("accuracy"),
        round(sum(coalesce(col("f1"), lit(0.0))
            .cast(DecimalType(38, 6))).cast("double")
          / count(lit(1)), 6).as("macro_f1"))
      m.crossJoin(broadcast(g))
        .select("class", "n_actual", "n_predicted", "tp", "prec",
          "rec", "f1", "accuracy", "macro_f1")
        .orderBy("class")
    },

    // ZIPF TAIL EXPONENT — Clauset-style discrete power-law MLE over
    // the token frequency distribution (xmin = 5):
    // α = 1 + n / Σ ln(f_i / 4.5) over tokens with frequency ≥ 5 —
    // the "is this corpus natural language" distributional check: a
    // healthy text corpus has α ≈ 2 (Zipf); scraped boilerplate,
    // log spam, or template farms skew it hard (q_vocab_coverage
    // asks which tokens a vocab covers; this asks whether the
    // frequency SHAPE is right at all). Scale: the corpus folds to
    // the vocabulary-sized frequency frame in ONE partial-aggregated
    // groupBy (q_lm_score discipline); the tail fold is
    // vocabulary-sized; the output is one row. Determinism: each
    // ln runs on (exact BIGINT) / 4.5 — one double op identical in
    // both engines — rounded 9dp into a DECIMAL(38,9) sum; α is one
    // division of exact operands rounded 6dp.
    Q("q_zipf_alpha",
      s"""WITH tok AS (SELECT unnest($toksDuck) AS t FROM documents),
         |f AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM tok
         |      GROUP BY t),
         |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
         |             CAST(sum(f) AS BIGINT) AS n_tokens FROM f),
         |tail AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
         |    CAST(sum(CAST(round(ln(f / CAST(4.5 AS DOUBLE)), 9)
         |         AS DECIMAL(38,9))) AS DOUBLE) AS s FROM f WHERE f >= 5)
         |SELECT vocab, n_tokens, n_tail,
         |  round(1 + n_tail / s, 6) AS alpha
         |FROM v CROSS JOIN tail""".stripMargin) { (s, d) =>
      val f = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(explode(col("w")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("f"))
        .localCheckpoint(eager = false)
      val v = f.agg(count(lit(1)).cast("long").as("vocab"),
        sum("f").cast("long").as("n_tokens"))
      val tail = f.filter(col("f") >= 5)
        .agg(count(lit(1)).cast("long").as("n_tail"),
          sum(round(log(col("f") / 4.5), 9).cast(DecimalType(38, 9)))
            .cast("double").as("s"))
      v.crossJoin(broadcast(tail))
        .selectExpr("vocab", "n_tokens", "n_tail",
          "round(1 + n_tail / s, 6) AS alpha")
    },

    // FEATURE HASHING — the hashing-trick featurizer audit: every
    // token maps to one of 64 dimensions by salted hash with a ±1
    // sign bit (Weinberger 2009), and the op reports the per-dim
    // load the trick actually produced — distinct tokens per dim
    // (collision load), total token mass, signed mass (the
    // cancellation the sign bit buys), and mass share. This is the
    // pre-flight for every hashed-feature model ("is 64 dims enough,
    // or is one bucket eating 10% of the mass"): q_encode_ids hashes
    // IDS to a fixed vocab for tensors; this hashes FEATURES and
    // audits the collision cost. Scale: corpus → token-count frame
    // in ONE partial-aggregated groupBy (the q_zipf_alpha fold,
    // pinned); the dim fold re-aggregates the VOCABULARY-sized frame
    // (never the corpus); the 1-row grand total broadcasts.
    // Determinism: md5-h28 dims and signs (never rand()); exact
    // BIGINT counts; share = one double division rounded 9dp.
    Q("q_feature_hashing",
      s"""WITH tok AS (SELECT unnest($toksDuck) AS t FROM documents),
         |f AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok
         |      GROUP BY t),
         |h AS (SELECT t, c, ${h28Duck("'fh#' || t")} % 64 AS dim,
         |    CASE WHEN (${h28Duck("'fh#' || t")} // 64) % 2 = 0
         |      THEN 1 ELSE -1 END AS sgn FROM f),
         |dims AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(c) AS BIGINT) AS mass,
         |    CAST(sum(sgn * c) AS BIGINT) AS signed_mass
         |  FROM h GROUP BY dim),
         |t AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM dims)
         |SELECT dim, n_tokens, mass, signed_mass,
         |  round(CAST(mass AS DOUBLE) / total, 9) AS mass_share
         |FROM dims CROSS JOIN t ORDER BY dim""".stripMargin) { (s, d) =>
      val f = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(explode(col("w")).as("t"))
        .groupBy("t").agg(count(lit(1)).cast("long").as("c"))
      val h = f.select(col("c"),
        (expr(h28("concat('fh#', t)")) % 64).as("dim"),
        when(expr(s"(${h28("concat('fh#', t)")} DIV 64) % 2") === 0, 1L)
          .otherwise(-1L).as("sgn"))
      val dims = h.groupBy("dim")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum("c").cast("long").as("mass"),
          sum(col("sgn") * col("c")).cast("long").as("signed_mass"))
      val t = dims.agg(sum("mass").cast("long").as("total"))
      dims.crossJoin(broadcast(t))
        .selectExpr("dim", "n_tokens", "mass", "signed_mass",
          "round(CAST(mass AS DOUBLE) / total, 9) AS mass_share")
        .orderBy("dim")
    },

    // TOKEN BURSTINESS (Church & Gale 1995): for each token with
    // df ≥ 20, the variance-to-mean ratio of its per-document counts
    // over the documents that CONTAIN it — the content-vs-function
    // discriminator a frequency list alone cannot give (a Poisson
    // token has VMR ≈ 1: 'the' appears everywhere, evenly; a bursty
    // topical token clumps — rare in most docs, dense where its
    // topic lives). Complements q_zipf_alpha (corpus frequency
    // SHAPE) and q_collocations (token-PAIR association) with the
    // per-token DISPERSION axis, and feeds stopword-list induction
    // (low-VMR high-df tokens are the functional skeleton).
    // Scale: corpus → (doc, token) tf frame in ONE partial-
    // aggregated groupBy, then a second partial fold to the
    // VOCABULARY-sized (df, Σc, Σc²) frame (the q_zipf_alpha
    // discipline) — no window, no pair stage; top-50 is a
    // TakeOrderedAndProject. Determinism: df/Σc/Σc² are exact
    // BIGINTs (Σc² fits through token totals ~3·10⁹ — far past any
    // test sf; swap the square to DECIMAL beyond), mean_tf uses the
    // exact-integer half-up form (mean-rounding caveat), and VMR =
    // (df·Σc² − (Σc)²) / ((df−1)·Σc) is ONE double division of
    // exact integer operands rounded 6dp; ties order on the token.
    Q("q_burstiness",
      s"""WITH tok AS (SELECT doc_id, unnest($toksDuck) AS t
         |             FROM documents),
         |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
         |       FROM tok GROUP BY 1, 2),
         |b AS (SELECT t, CAST(count(*) AS BIGINT) AS df,
         |      CAST(sum(c) AS BIGINT) AS total,
         |      CAST(sum(c * c) AS BIGINT) AS ss FROM tf GROUP BY t)
         |SELECT t, df, total,
         |  CAST(floor((2 * total * 1000000 + df) / (2.0 * df)) AS BIGINT)
         |    / 1000000.0 AS mean_tf,
         |  round((df * ss - total * total) / ((df - 1.0) * total), 6)
         |    AS vmr
         |FROM b WHERE df >= 20
         |ORDER BY vmr DESC, t LIMIT 50""".stripMargin) { (s, d) =>
      val tf = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(col("doc_id"), explode(col("w")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).cast("long").as("c"))
      tf.groupBy("t")
        .agg(count(lit(1)).cast("long").as("df"),
          sum("c").cast("long").as("total"),
          sum(col("c") * col("c")).cast("long").as("ss"))
        .filter(col("df") >= 20)
        .selectExpr("t", "df", "total",
          "CAST(floor((2 * total * 1000000 + df) / (2.0 * df)) AS BIGINT)" +
            " / CAST(1000000 AS DOUBLE) AS mean_tf",
          "round((df * ss - total * total)" +
            " / ((df - CAST(1 AS DOUBLE)) * total), 6) AS vmr")
        .orderBy(col("vmr").desc, col("t")).limit(50)
    },

    // K-FOLD CROSS-VALIDATION AS ONE DATAFLOW — 5-fold CV of the NB
    // language classifier WITHOUT training 5 models over 5 scans:
    // every fold's model is the count IDENTITY train_f = global −
    // fold_f, so ONE pass builds the global and per-fold count
    // frames and each document scores against its own held-out
    // fold's model in a single (fold, token)-keyed join — the
    // variance readout (per-fold accuracy + mean ± sd) that a single
    // q_naive_bayes split cannot give, and the distributed answer to
    // "k-fold CV costs k× a fit" (here it costs ~1×: the count
    // frames are vocabulary-sized regardless of k). Smoothing uses
    // the GLOBAL vocabulary for every fold by contract (the
    // train-only-vocab variant would make V fold-dependent for no
    // inferential gain). Scale: all model frames are (k ×)
    // vocabulary-sized partial aggregates; the dense per-fold
    // log-prob table broadcasts onto the token stream exactly like
    // q_naive_bayes; the argmax is a per-doc window; fold accuracies
    // fold to a k-row frame. Determinism: NB's 9dp-rounded
    // exact-integer-ratio ln terms into DECIMAL sums; the mean
    // accuracy divides a 6dp decimal sum by k (7th digit is always
    // even — no round tie is reachable); sd is one sqrt over
    // identical operands, greatest(·,0)-guarded.
    Q("q_crossval",
      s"""WITH s AS (SELECT doc_id, lang, $toksDuck AS w,
         |    ${h28Duck("'cv#' || doc_id")} % 5 AS fold FROM documents),
         |tok AS (SELECT doc_id, lang, fold, unnest(w) AS tok FROM s),
         |ctg AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cg
         |        FROM tok GROUP BY 1, 2),
         |ctf AS (SELECT fold, lang, tok, CAST(count(*) AS BIGINT) AS cf
         |        FROM tok GROUP BY 1, 2, 3),
         |tokg AS (SELECT lang, CAST(count(*) AS BIGINT) AS ntokg
         |         FROM tok GROUP BY 1),
         |tokf AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS ntokf
         |         FROM tok GROUP BY 1, 2),
         |vocab AS (SELECT DISTINCT tok FROM tok),
         |vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
         |docg AS (SELECT lang, CAST(count(*) AS BIGINT) AS ndg
         |         FROM s GROUP BY 1),
         |docf AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS ndf
         |         FROM s GROUP BY 1, 2),
         |ng AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
         |nf AS (SELECT fold, CAST(count(*) AS BIGINT) AS nfold
         |       FROM s GROUP BY 1),
         |folds AS (SELECT DISTINCT fold FROM s),
         |prior AS (SELECT folds.fold, docg.lang,
         |    round(ln(CAST(ndg - coalesce(ndf, 0) AS DOUBLE)
         |      / (n - nfold)), 9) AS lnprior
         |  FROM folds CROSS JOIN docg
         |  LEFT JOIN docf ON docf.fold = folds.fold
         |    AND docf.lang = docg.lang
         |  CROSS JOIN ng JOIN nf ON nf.fold = folds.fold),
         |dense AS (SELECT folds.fold, vocab.tok, tokg.lang,
         |    round(ln(CAST(coalesce(cg, 0) - coalesce(cf, 0) + 1
         |        AS DOUBLE)
         |      / (ntokg - coalesce(ntokf, 0) + v)), 9) AS lnp
         |  FROM folds CROSS JOIN vocab CROSS JOIN tokg CROSS JOIN vsz
         |  LEFT JOIN ctg ON ctg.lang = tokg.lang
         |    AND ctg.tok = vocab.tok
         |  LEFT JOIN ctf ON ctf.fold = folds.fold
         |    AND ctf.lang = tokg.lang AND ctf.tok = vocab.tok
         |  LEFT JOIN tokf ON tokf.fold = folds.fold
         |    AND tokf.lang = tokg.lang),
         |tsc AS (SELECT t.doc_id, de.lang AS cand,
         |    CAST(sum(CAST(de.lnp AS DECIMAL(38,9))) AS DOUBLE) AS tsum
         |  FROM tok t JOIN dense de ON de.fold = t.fold
         |    AND de.tok = t.tok GROUP BY 1, 2),
         |score AS (SELECT s.doc_id, s.fold, s.lang AS actual, p.lang
         |    AS cand, round(p.lnprior + coalesce(t.tsum, 0), 9) AS score
         |  FROM s JOIN prior p ON p.fold = s.fold
         |  LEFT JOIN tsc t ON t.doc_id = s.doc_id AND t.cand = p.lang),
         |pred AS (SELECT doc_id, fold, actual, cand, row_number()
         |    OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rk
         |  FROM score),
         |pf AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN cand = actual THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct,
         |    round(sum(CASE WHEN cand = actual THEN 1 ELSE 0 END)
         |      / CAST(count(*) AS DOUBLE), 6) AS acc
         |  FROM pred WHERE rk = 1 GROUP BY 1),
         |g AS (SELECT
         |    round(CAST(sum(CAST(acc AS DECIMAL(38,6))) AS DOUBLE)
         |      / count(*), 6) AS mean_acc,
         |    round(sqrt(greatest(
         |      CAST(sum(CAST(round(acc * acc, 12) AS DECIMAL(38,12)))
         |        AS DOUBLE) / count(*)
         |      - (CAST(sum(CAST(acc AS DECIMAL(38,6))) AS DOUBLE)
         |          / count(*))
         |        * (CAST(sum(CAST(acc AS DECIMAL(38,6))) AS DOUBLE)
         |          / count(*)), CAST(0 AS DOUBLE))), 6) AS sd_acc
         |  FROM pf)
         |SELECT fold, n_test, n_correct, acc, mean_acc, sd_acc
         |FROM pf CROSS JOIN g ORDER BY fold""".stripMargin) { (s, d) =>
      val base = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .withColumn("fold",
          expr(h28("concat('cv#', CAST(doc_id AS STRING))")) % 5)
        .select("doc_id", "lang", "w", "fold")
        .localCheckpoint(eager = false)
      val tok = base.select(col("doc_id"), col("lang"), col("fold"),
        explode(col("w")).as("tok")).localCheckpoint(eager = false)
      val ctg = tok.groupBy("lang", "tok")
        .agg(count(lit(1)).cast("long").as("cg"))
      val ctf = tok.groupBy("fold", "lang", "tok")
        .agg(count(lit(1)).cast("long").as("cf"))
      val tokg = tok.groupBy("lang")
        .agg(count(lit(1)).cast("long").as("ntokg"))
      val tokf = tok.groupBy("fold", "lang")
        .agg(count(lit(1)).cast("long").as("ntokf"))
      val vocab = tok.select("tok").distinct()
      val vsz = vocab.agg(count(lit(1)).cast("long").as("v"))
      val docg = base.groupBy("lang")
        .agg(count(lit(1)).cast("long").as("ndg"))
      val docf = base.groupBy("fold", "lang")
        .agg(count(lit(1)).cast("long").as("ndf"))
      val ng = base.agg(count(lit(1)).cast("long").as("n"))
      val nf = base.groupBy("fold")
        .agg(count(lit(1)).cast("long").as("nfold"))
      val folds = base.select("fold").distinct()
      val prior = folds.crossJoin(broadcast(docg))
        .join(broadcast(docf), Seq("fold", "lang"), "left")
        .crossJoin(broadcast(ng))
        .join(broadcast(nf), "fold")
        .selectExpr("fold", "lang",
          "round(ln(CAST(ndg - coalesce(ndf, 0) AS DOUBLE)" +
            " / (n - nfold)), 9) AS lnprior")
        .localCheckpoint(eager = false)
      val dense = folds.crossJoin(vocab)
        .crossJoin(broadcast(tokg)).crossJoin(broadcast(vsz))
        .join(broadcast(ctg), Seq("lang", "tok"), "left")
        .join(broadcast(ctf), Seq("fold", "lang", "tok"), "left")
        .join(broadcast(tokf), Seq("fold", "lang"), "left")
        .selectExpr("fold", "tok", "lang",
          "round(ln(CAST(coalesce(cg, 0) - coalesce(cf, 0) + 1" +
            " AS DOUBLE) / (ntokg - coalesce(ntokf, 0) + v)), 9) AS lnp")
      val tsc = tok.select("doc_id", "fold", "tok")
        .join(broadcast(dense), Seq("fold", "tok"))
        .groupBy(col("doc_id"), col("lang").as("cand"))
        .agg(sum(col("lnp").cast(DecimalType(38, 9))).cast("double")
          .as("tsum"))
      val scored = base.select(col("doc_id"), col("fold"),
          col("lang").as("actual"))
        .join(broadcast(prior.withColumnRenamed("lang", "cand")), "fold")
        .join(tsc, Seq("doc_id", "cand"), "left")
        .selectExpr("doc_id", "fold", "actual", "cand",
          "round(lnprior + coalesce(tsum, 0), 9) AS score")
      val pf = scored.withColumn("rk", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("cand"))))
        .filter(col("rk") === 1)
        .groupBy("fold")
        .agg(count(lit(1)).cast("long").as("n_test"),
          sum(when(col("cand") === col("actual"), 1L).otherwise(0L))
            .cast("long").as("n_correct"))
        .selectExpr("fold", "n_test", "n_correct",
          "round(n_correct / CAST(n_test AS DOUBLE), 6) AS acc")
        .localCheckpoint(eager = false)
      val g = pf.agg(
        round(sum(col("acc").cast(DecimalType(38, 6))).cast("double")
          / count(lit(1)), 6).as("mean_acc"),
        expr("round(sqrt(greatest(" +
          "CAST(sum(CAST(round(acc * acc, 12) AS DECIMAL(38,12)))" +
          " AS DOUBLE) / count(*)" +
          " - (CAST(sum(CAST(acc AS DECIMAL(38,6))) AS DOUBLE)" +
          " / count(*))" +
          " * (CAST(sum(CAST(acc AS DECIMAL(38,6))) AS DOUBLE)" +
          " / count(*)), CAST(0 AS DOUBLE))), 6)").as("sd_acc"))
      pf.crossJoin(broadcast(g))
        .select("fold", "n_test", "n_correct", "acc", "mean_acc",
          "sd_acc")
        .orderBy("fold")
    },

    // McNEMAR'S TEST — paired comparison of the NB classifier
    // against the majority-class baseline on the SAME held-out
    // documents: the 2×2 disagreement table (both right / both
    // wrong / NB-only / baseline-only) and the continuity-corrected
    // χ² = (|b−c|−1)²/(b+c) on the discordant cells. This is the
    // statistically-sound version of "the classifier beats the
    // baseline": comparing two ACCURACIES with q_abtest machinery
    // ignores that both run on the same docs — McNemar conditions on
    // the discordant pairs, which is the test an eval suite must use
    // for paired classifiers (q_confusion_metrics grades ONE model;
    // this compares two on shared examples). Scale: the prediction
    // chain is the SHARED nbPredDuck/nbPredictions definition (one
    // source of truth with q_naive_bayes/q_confusion_metrics/
    // q_crossval); the baseline is a broadcast 1-row majority pick;
    // the disagreement fold is ONE conditional aggregate.
    // Determinism: exact integer cells; χ² one identical double
    // chain; b + c = 0 → NULL via nullif (then `significant` is
    // NULL too, identically).
    Q("q_mcnemar",
      s"""WITH $nbPredDuck,
         |p AS (SELECT doc_id, actual, predicted FROM pred WHERE rk = 1),
         |mj AS (SELECT lang AS mlang FROM s WHERE split = 'train'
         |       GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1),
         |flags AS (SELECT (predicted = actual) AS nb_ok,
         |    (actual = mlang) AS base_ok
         |  FROM p CROSS JOIN mj),
         |tab AS (SELECT
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (nb_ok AND base_ok) AS BIGINT)
         |      AS both_right,
         |    CAST(count(*) FILTER (NOT nb_ok AND NOT base_ok) AS BIGINT)
         |      AS both_wrong,
         |    CAST(count(*) FILTER (nb_ok AND NOT base_ok) AS BIGINT)
         |      AS nb_only,
         |    CAST(count(*) FILTER (NOT nb_ok AND base_ok) AS BIGINT)
         |      AS base_only
         |  FROM flags)
         |SELECT n, both_right, both_wrong, nb_only, base_only,
         |  round((abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
         |    * (abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
         |    / nullif(CAST(nb_only + base_only AS DOUBLE), 0), 6)
         |    AS mcnemar_chi2,
         |  (abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
         |    * (abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
         |    / nullif(CAST(nb_only + base_only AS DOUBLE), 0)
         |    > CAST(3.841 AS DOUBLE) AS significant
         |FROM tab""".stripMargin) { (s, d) =>
      val p = nbPredictions(s, d)
      val base = barrier(Tables.documents(s, d))
        .filter(expr(h28("concat('split#', CAST(doc_id AS STRING))"))
          < 214748365L)
      val mj = base.groupBy("lang").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang")).limit(1)
        .select(col("lang").as("mlang"))
      p.crossJoin(broadcast(mj))
        .select((col("predicted") === col("actual")).as("nb_ok"),
          (col("actual") === col("mlang")).as("base_ok"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("nb_ok") && col("base_ok"), 1L).otherwise(0L))
            .cast("long").as("both_right"),
          sum(when(!col("nb_ok") && !col("base_ok"), 1L).otherwise(0L))
            .cast("long").as("both_wrong"),
          sum(when(col("nb_ok") && !col("base_ok"), 1L).otherwise(0L))
            .cast("long").as("nb_only"),
          sum(when(!col("nb_ok") && col("base_ok"), 1L).otherwise(0L))
            .cast("long").as("base_only"))
        .selectExpr("n", "both_right", "both_wrong", "nb_only",
          "base_only",
          """round((abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
            |  * (abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
            |  / nullif(CAST(nb_only + base_only AS DOUBLE), 0), 6)
            |  AS mcnemar_chi2""".stripMargin,
          """(abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
            |  * (abs(CAST(nb_only - base_only AS DOUBLE)) - 1)
            |  / nullif(CAST(nb_only + base_only AS DOUBLE), 0)
            |  > CAST(3.841 AS DOUBLE) AS significant""".stripMargin)
    },
  )
}
