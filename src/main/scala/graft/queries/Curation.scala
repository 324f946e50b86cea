package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import TextKit._

/** Training-data CURATION operators over `documents` — the
  * corpus-hygiene passes a 100 TB LLM pipeline runs between ingest
  * and training (reference analog: the per-photo description corpus,
  * photo_vector_search.py:128-140, is exactly the kind of scraped
  * text these passes clean):
  *
  *  - PII redaction (q_text_redact): scrub emails/phones before the
  *    corpus leaves the ingest boundary.
  *  - Benchmark decontamination (q_decontaminate): drop training
  *    docs that share long n-grams with an eval/benchmark set.
  *  - Repetition scoring (q_repetition): the classic repeated-n-gram
  *    quality gate (Gopher-style rules) — high duplicate-trigram
  *    fraction marks boilerplate/spam.
  *
  * Scale design: all three are scan-local per document except the
  * decontamination join, whose build side (the benchmark n-gram set)
  * is tiny by construction — benchmarks are MBs while the corpus is
  * TBs — so it broadcasts and the corpus side never shuffles. No
  * UDFs: regexes and n-gram builders are codegen'd built-ins.
  */
object Curation {

  /** Portable (Java regex ∩ RE2) PII patterns. Kept deliberately
    * simple: the operator contract is "same matches on both engines",
    * not full RFC 5322. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** The corpus carries no real PII, so each doc is augmented with a
    * deterministic synthetic email + phone (derived from doc_id,
    * identically on both engines) — the redactor then has a known
    * non-zero workload whose output is hash-compared. */
  private val AugSpark =
    "concat(text, ' contact u', CAST(doc_id AS STRING), " +
      "'@mail.example.com or 555-', " +
      "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-0199')"
  private val AugDuck =
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || " +
      "'@mail.example.com or 555-' || " +
      "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'"

  val qs: Seq[Q] = Seq(

    // PII redaction: count matches, then scrub with placeholder
    // tokens. Scan-local; the hash compare covers the full redacted
    // text via md5.
    Q("q_text_redact",
      s"""WITH a AS (SELECT doc_id, $AugDuck AS aug FROM documents),
         |r AS (SELECT doc_id,
         |    len(regexp_extract_all(aug, '$EmailRe')) AS n_email,
         |    len(regexp_extract_all(aug, '$PhoneRe')) AS n_phone,
         |    regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
         |                   '$PhoneRe', '<PHONE>', 'g') AS red
         |  FROM a)
         |SELECT doc_id, n_email, n_phone,
         |  length(red) AS red_len, md5(red) AS red_md5
         |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      // functions-API regexes (NOT expr()): Spark SQL string literals
      // process backslash escapes, so '\\b' in SQL text would become a
      // backspace char; Column-API patterns are raw Java regexes.
      val aug = Tables.documents(s, d).select(col("doc_id"),
        expr(AugSpark).as("aug"))
      val red = aug.select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("aug"), lit(PhoneRe), lit(0))).as("n_phone"),
        regexp_replace(regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("red"))
      red.select(col("doc_id"), col("n_email"), col("n_phone"),
          length(col("red")).as("red_len"), md5(col("red")).as("red_md5"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: originals with doc_id % 97 == 0 play
    // the held-out benchmark; the TRAINING corpus is a re-crawl of
    // the whole collection (ids shifted +100000, the A7 re-ingest
    // scenario) — so it verbatim-contains every benchmark doc, which
    // is precisely the leakage this pass exists to catch. Each corpus
    // doc is scored by how many of its distinct word-8-grams appear
    // in the benchmark set (the 13-gram GPT-3 rule scaled to this
    // corpus's short docs). The benchmark n-gram set is tiny by
    // construction (benchmarks are MBs, corpora TBs) → broadcast;
    // the corpus side stays shuffle-free up to the per-doc count.
    Q("q_decontaminate",
      s"""WITH corpus_docs AS (SELECT doc_id + 100000 AS doc_id, text FROM documents),
         |w AS (SELECT doc_id, $toksDuck AS w FROM corpus_docs),
         |g AS (SELECT doc_id, ${shinglesNDuck("w", 8, distinct = true)} AS g FROM w),
         |bw AS (SELECT doc_id, $toksDuck AS w FROM documents WHERE doc_id % 97 = 0),
         |bg AS (SELECT ${shinglesNDuck("w", 8, distinct = true)} AS g FROM bw),
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM bg),
         |cg AS (SELECT doc_id, unnest(g) AS gram FROM g),
         |hits AS (SELECT doc_id, count(*) AS n_hits
         |         FROM cg JOIN bench USING (gram) GROUP BY 1)
         |SELECT c.doc_id, coalesce(h.n_hits, 0) AS n_hits,
         |  CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
         |FROM g c LEFT JOIN hits h ON c.doc_id = h.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      def grams(df: org.apache.spark.sql.DataFrame) =
        barrier(barrier(df.withColumn("w", expr(toks)))
          .withColumn("g", expr(shinglesN("w", 8, distinct = true)))
          .select("doc_id", "g"))
      val docs = Tables.documents(s, d)
      val corpus = grams(docs.select(
        (col("doc_id") + 100000).as("doc_id"), col("text")))
      val bench = grams(docs.filter(col("doc_id") % 97 === 0))
        .select(explode(col("g")).as("gram")).distinct()
      val hits = corpus.select(col("doc_id"), explode(col("g")).as("gram"))
        .join(broadcast(bench), "gram")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      corpus.select("doc_id").join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("contaminated", (col("n_hits") > 0).cast("int"))
        .orderBy("doc_id")
    },

    // Repetition quality gate: duplicate word-trigram fraction per
    // doc (non-distinct shingles — the duplicates ARE the signal).
    // Pure integer counts until one double division, so the round(6)
    // value is bit-identical across engines; the flag compares the
    // ROUNDED fraction on both sides (no boundary flake). The 0.03
    // threshold sits inside this corpus's observed range (max ≈ 0.07)
    // so the gate actually fires.
    Q("q_repetition",
      s"""WITH w AS (SELECT doc_id, $toksDuck AS w FROM documents),
         |t AS (SELECT doc_id, ${shinglesNDuck("w", 3, distinct = false)} AS tri FROM w),
         |m AS (SELECT doc_id, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq,
         |    round(CASE WHEN len(tri) = 0 THEN 0.0
         |      ELSE (len(tri) - len(list_distinct(tri)))::DOUBLE / len(tri)
         |    END, 6) AS dup_frac
         |  FROM t)
         |SELECT doc_id, n_tri, n_uniq, dup_frac,
         |  CASE WHEN dup_frac > 0.03 THEN 1 ELSE 0 END AS flagged
         |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = barrier(barrier(Tables.documents(s, d)
          .withColumn("w", expr(toks)))
        .withColumn("tri", expr(shinglesN("w", 3, distinct = false)))
        .select("doc_id", "tri"))
      t.select(col("doc_id"),
          size(col("tri")).as("n_tri"),
          expr("size(array_distinct(tri))").as("n_uniq"))
        .withColumn("dup_frac",
          round(when(col("n_tri") === 0, 0.0)
            .otherwise((col("n_tri") - col("n_uniq")).cast("double") / col("n_tri")), 6))
        .withColumn("flagged", (col("dup_frac") > 0.03).cast("int"))
        .orderBy("doc_id")
    },

    // WINSORIZATION: clip per-language outlier doc lengths at that
    // language's p95 (the curation guard against length-skewed
    // batches — one pathological 10 MB doc otherwise dominates a
    // packed sequence). Two-pass broadcast shape: pass 1 computes
    // the tiny per-group threshold frame (|langs| rows — exact
    // interpolated percentile, portable per q_agg_median), pass 2 is
    // a scan-local clip against the broadcast thresholds. At 100 TB
    // the corpus side never shuffles; for regimes where even pass 1
    // is too hot, q_agg_approx_quantile's histogram sketch is the
    // drop-in threshold source.
    Q("q_winsorize",
      """WITH th AS (SELECT lang,
        |    round(quantile_cont(n_chars, 0.95), 6) AS p95 FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars, th.p95,
        |  round(least(CAST(d.n_chars AS DOUBLE), th.p95), 6) AS clipped,
        |  CASE WHEN CAST(d.n_chars AS DOUBLE) > th.p95 THEN 1 ELSE 0 END AS was_clipped
        |FROM documents d JOIN th USING (lang)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val th = docs.groupBy("lang")
        .agg(round(expr("percentile(n_chars, 0.95)"), 6).as("p95"))
      docs.join(broadcast(th), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("p95"),
          round(least(col("n_chars").cast("double"), col("p95")), 6).as("clipped"),
          (col("n_chars").cast("double") > col("p95")).cast("int").as("was_clipped"))
        .orderBy("doc_id")
    },

    // Z-SCORE NORMALIZATION: standardize event values within their
    // event_type group — the feature-scaling pass every training
    // pipeline runs before mixing heterogeneous metrics. Same
    // two-pass broadcast shape as q_winsorize: pass 1 folds the fact
    // scan to a |types|-row moment frame (ONE partial-aggregated
    // groupBy — count + DECIMAL sums of value and value², so the
    // group mean/stddev are accumulation-order exact), pass 2 is a
    // scan-local (v − μ)/σ against the broadcast moments. The corpus
    // side never shuffles; contrast with a percent_rank/window
    // formulation, which would sort each full group inside ONE task.
    // Determinism: moments round-trip through DECIMAL(38,6); the
    // per-row z uses the same double expression both sides
    // (population σ, the moment identity σ² = q/n − μ²).
    Q("q_zscore_normalize",
      """WITH m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(round(value * value, 6) AS DECIMAL(38,6))) AS DOUBLE) AS q
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
        |  round(m.s / m.n, 6) AS mu,
        |  round(sqrt(m.q / m.n - (m.s / m.n) * (m.s / m.n)), 6) AS sigma,
        |  round((e.value - m.s / m.n)
        |    / nullif(sqrt(m.q / m.n - (m.s / m.n) * (m.s / m.n)), 0), 6) AS z
        |FROM events e JOIN m USING (event_type)
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).cast("double").as("s"),
        sum(round(col("value") * col("value"), 6).cast(DecimalType(38, 6)))
          .cast("double").as("q"))
      ev.join(broadcast(m), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"),
          round(expr("s / n"), 6).as("mu"),
          round(expr("sqrt(q / n - (s / n) * (s / n))"), 6).as("sigma"),
          // σ = 0 guard (round-11 advice): a constant-valued group
          // divides by zero, where Spark's non-ANSI Divide returns
          // NULL but DuckDB's IEEE division returns ±inf/NaN —
          // nullif on BOTH sides pins the degenerate group to NULL
          // in both engines.
          round(expr(
            "(value - s / n) / nullif(sqrt(q / n - (s / n) * (s / n)), 0)"),
            6).as("z"))
        .orderBy("event_id")
    },

    // QUANTILE (RANK) NORMALIZATION — map each value to its
    // per-group empirical quantile qn = percent_rank ∈ [0, 1]: the
    // distribution-free feature transform (immune to outliers AND
    // to scale, where z-scoring assumes near-normality). The engine
    // plan is the 100 TB shape: a per-(group, value) HISTOGRAM
    // (bounded by the value domain — 2 dp over a few hundred units
    // here, so ≤ groups × ~33 k rows at ANY corpus size), a
    // cumulative count over that small frame, then a broadcast join
    // back — the corpus itself is never sorted, unlike the naive
    // percent_rank window whose per-group sort is corpus-sized.
    // percent_rank ties: qn = (#strictly-smaller) / (n − 1), which
    // the cumulative-histogram form reproduces exactly; the oracle
    // states the naive window form, proving the equivalence per row.
    Q("q_quantile_normalize",
      """SELECT event_id, event_type, round(value, 6) AS value,
        |  round(percent_rank() OVER (PARTITION BY event_type
        |    ORDER BY value), 6) AS qn
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val hist = ev.groupBy("event_type", "value")
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("value")
      val cum = hist
        .withColumn("below",
          coalesce(sum("c").over(w) - col("c"), lit(0L)))
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      ev.join(broadcast(cum), Seq("event_type", "value"))
        .join(broadcast(n), "event_type")
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"),
          when(col("n") === 1, lit(0.0)).otherwise(
            round(col("below").cast("double") / (col("n") - 1), 6))
            .as("qn"))
        .orderBy("event_id")
    },

    // ROBUST SCALING — (x − median) / IQR per group: the
    // outlier-immune sibling of q_zscore_normalize (one wild value
    // moves a mean/σ arbitrarily far; it moves a median/IQR by at
    // most one rank). Exact interpolated quantiles (the q_agg_median
    // Spark-percentile ≡ DuckDB-quantile_cont portability contract);
    // the group frame is ≤ #groups rows and broadcasts; IQR = 0
    // (degenerate constant-ish group) pins rz to NULL via the same
    // nullif-on-both-sides discipline as the z-score σ=0 guard.
    Q("q_robust_scale",
      """WITH m AS (SELECT event_type,
        |    quantile_cont(value, 0.5) AS med,
        |    quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
        |  round(med, 6) AS med, round(iqr, 6) AS iqr,
        |  round((e.value - med) / nullif(iqr, 0), 6) AS rz
        |FROM events e JOIN m USING (event_type)
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val m = ev.groupBy("event_type").agg(
        expr("percentile(value, 0.5)").as("med"),
        expr("percentile(value, 0.75) - percentile(value, 0.25)")
          .as("iqr"))
      ev.join(broadcast(m), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"),
          round(col("med"), 6).as("med"),
          round(col("iqr"), 6).as("iqr"),
          round((col("value") - col("med")) /
            expr("nullif(iqr, 0)"), 6).as("rz"))
        .orderBy("event_id")
    },
  )
}
