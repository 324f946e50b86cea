package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import TextKit.{toks, toksDuck}

/** Round-13 corpus-statistics wave: the curation diagnostics a
  * pretraining-data pipeline reads before deciding what to keep —
  * readability scoring (Flesch), corpus hapax structure (the Zipf
  * tail q_zipf_alpha's exponent summarizes, counted exactly),
  * Heaps'-law vocabulary growth (does the corpus keep adding types,
  * or is it saturating/templated), and an identifier/PII density
  * audit over every free-text surface (the release gate next to
  * q_text_redact, which masks what this MEASURES).
  *
  * Scale design notes (100 TB posture):
  *  - Readability + PII are pure SCAN-LOCAL regexp counting followed
  *    by one partial-aggregated fold — filter-at-scan-bandwidth ops.
  *  - Hapax + Heaps fold the corpus to vocabulary-sized frames in
  *    one pass each; all joins stay on those bounded frames.
  *  - The only partition-less window (Heaps' cumulative growth) runs
  *    on the FIXED 10-bucket frame (GlobalWindowAuditSpec-pinned).
  */
object CorpusStats {

  val qs: Seq[Q] = Seq(

    // FLESCH READABILITY — reading-ease scoring per language:
    // FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    // words), with the standard large-corpus proxies (syllables =
    // vowel groups [aeiouy]+; sentences = [.!?]+ runs, floored at 1
    // — an unpunctuated corpus like this one degenerates to
    // one-sentence docs, which the score then reads as very long
    // sentences: the contract is the formula, documented). The
    // curation use is the per-language MEAN and the words/syllable
    // shape, the quality axis q_quality_score's length/stopword
    // composite can't see. Scale: every feature is a scan-local
    // codegen regexp count; ONE partial-aggregated fold to the
    // ≤|langs|-row frame. Determinism: integer counts; per-doc FRE
    // is one identical double chain rounded 6 dp into exact micros;
    // means use the exact-integer half-up form; the corpus
    // syllables/word ratio is ONE division of exact BIGINTs.
    Q("q_readability",
      s"""WITH f AS (SELECT lang,
         |    CAST(len($toksDuck) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
         |      AS BIGINT) AS sy,
         |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
         |      AS BIGINT), 1) AS se
         |  FROM documents),
         |d AS (SELECT lang, w, sy,
         |    CAST(round(round(CAST(206.835 AS DOUBLE)
         |      - CAST(1.015 AS DOUBLE) * w / se
         |      - CAST(84.6 AS DOUBLE) * sy / w, 6) * 1000000, 0)
         |      AS BIGINT) AS fre6
         |  FROM f WHERE w > 0)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(floor((2 * CAST(sum(w) AS BIGINT) + count(*))
         |    / (2.0 * count(*))) AS BIGINT) AS mean_words,
         |  round(CAST(sum(sy) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6)
         |    AS syll_per_word,
         |  floor((2 * CAST(sum(fre6) AS BIGINT) + count(*))
         |    / (2.0 * count(*))) / 1e6 AS mean_fre
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val f = Tables.documents(s, d).selectExpr("lang",
        s"CAST(size($toks) AS BIGINT) AS w",
        "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))" +
          " AS BIGINT) AS sy",
        "greatest(CAST(size(regexp_extract_all(text, '[.!?]+', 0))" +
          " AS BIGINT), CAST(1 AS BIGINT)) AS se")
      f.filter(col("w") > 0)
        .selectExpr("lang", "w", "sy",
          """CAST(round(round(CAST(206.835 AS DOUBLE)
            |  - CAST(1.015 AS DOUBLE) * w / se
            |  - CAST(84.6 AS DOUBLE) * sy / w, 6) * 1000000, 0)
            |  AS BIGINT) AS fre6""".stripMargin)
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("w").cast("long").as("sw"),
          sum("sy").cast("long").as("ssy"),
          sum("fre6").cast("long").as("sfre"))
        .selectExpr("lang", "n_docs",
          "CAST(floor((2 * sw + n_docs) / (2.0 * n_docs)) AS BIGINT) AS mean_words",
          "round(CAST(ssy AS DOUBLE) / CAST(sw AS DOUBLE), 6)" +
            " AS syll_per_word",
          "floor((2 * sfre + n_docs) / (2.0 * n_docs)) / 1e6 AS mean_fre")
        .orderBy("lang")
    },

    // HAPAX LEGOMENA — per-source counts of tokens that occur EXACTLY
    // ONCE in the whole corpus: the exact Zipf tail (q_zipf_alpha
    // fits the exponent from the f ≥ 5 head; the hapax mass is the
    // tail that fit extrapolates), and a standard novelty/noise axis
    // — a source whose vocabulary is mostly corpus-hapax is either
    // genuinely novel or OCR garbage, and either way gets a human
    // look before training. Scale: corpus → (source, token) frame in
    // one fold; global token totals re-aggregate THAT frame; the
    // audit join runs vocabulary-sized on the token key (hapax
    // tokens live in exactly one source by definition, so per-source
    // hapax counts are exact from the joined frame). Determinism:
    // all exact BIGINT counts; one rounded division per ratio.
    Q("q_hapax",
      s"""WITH st AS (SELECT source, token,
         |    CAST(count(*) AS BIGINT) AS c_st
         |  FROM (SELECT source, unnest($toksDuck) AS token
         |        FROM documents) u
         |  GROUP BY source, token),
         |f AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_tot
         |  FROM st GROUP BY token)
         |SELECT source,
         |  CAST(sum(c_st) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(count(*) FILTER (c_tot = 1) AS BIGINT) AS n_hapax,
         |  round(CAST(count(*) FILTER (c_tot = 1) AS DOUBLE)
         |    / count(*), 6) AS hapax_share
         |FROM st JOIN f USING (token)
         |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val st = fanout(Tables.documents(s, d))
        .select(col("source"), explode(expr(toks)).as("token"))
        .groupBy("source", "token")
        .agg(count(lit(1)).cast("long").as("c_st"))
        .localCheckpoint(eager = false) // vocabulary-sized frame
      val f = st.groupBy("token").agg(sum("c_st").cast("long").as("c_tot"))
      st.join(f, "token")
        .groupBy("source")
        .agg(sum("c_st").cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("vocab"),
          sum(when(col("c_tot") === 1, 1L).otherwise(0L)).cast("long")
            .as("n_hapax"))
        .selectExpr("source", "n_tokens", "vocab", "n_hapax",
          "round(CAST(n_hapax AS DOUBLE) / vocab, 6) AS hapax_share")
        .orderBy("source")
    },

    // HEAPS' LAW — vocabulary growth V(n) ≈ K·n^β across the corpus
    // in document order: 10 equal doc-id buckets accumulate token
    // mass and FIRST-OCCURRENCE type counts, and β comes from a
    // log-log OLS over the 10 growth points. β near the corpus's
    // historical value means healthy novelty; β collapsing toward 0
    // means the tail of the crawl is re-crawl/template mass — the
    // growth-curve twin of q_ngram_novelty's per-doc read. Scale:
    // first occurrences are ONE vocabulary-sized min-fold (min
    // doc_id per token — no ordered scan, no window over the
    // corpus); bucket assignment is exact integer arithmetic; the
    // cumulative/OLS stage runs on the FIXED 10-row bucket frame
    // (GlobalWindowAuditSpec-pinned). Determinism: exact BIGINT
    // counts; ln terms rounded 9 dp into DECIMAL sums; β and K are
    // one identical double chain.
    Q("q_heaps_law",
      s"""WITH tok AS (SELECT doc_id, unnest($toksDuck) AS token
         |  FROM documents),
         |mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mx FROM documents),
         |tb AS (SELECT CAST((doc_id * 10) // (mx + 1) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_tokens
         |  FROM tok CROSS JOIN mx GROUP BY 1),
         |fo AS (SELECT CAST(min(doc_id) AS BIGINT) AS fd FROM tok
         |  GROUP BY token),
         |fb AS (SELECT CAST((fd * 10) // (mx + 1) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS new_types
         |  FROM fo CROSS JOIN mx GROUP BY 1),
         |g AS (SELECT tb.bucket, tb.n_tokens,
         |    CAST(coalesce(fb.new_types, 0) AS BIGINT) AS new_types
         |  FROM tb LEFT JOIN fb ON fb.bucket = tb.bucket),
         |c AS (SELECT bucket, n_tokens, new_types,
         |    CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT)
         |      AS cum_tokens,
         |    CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT)
         |      AS cum_vocab
         |  FROM g),
         |pt AS (SELECT round(ln(cum_tokens), 9) AS x,
         |    round(ln(cum_vocab), 9) AS y FROM c),
         |o AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(round(x * x, 9) AS DECIMAL(38,9))) AS DOUBLE)
         |      AS sxx,
         |    CAST(sum(CAST(round(x * y, 9) AS DECIMAL(38,9))) AS DOUBLE)
         |      AS sxy
         |  FROM pt),
         |b AS (SELECT
         |    (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) AS beta,
         |    n, sx, sy FROM o)
         |SELECT bucket, n_tokens, new_types, cum_tokens, cum_vocab,
         |  round(beta, 6) AS heaps_beta,
         |  round(exp((sy - beta * sx) / n), 6) AS heaps_k
         |FROM c CROSS JOIN b ORDER BY bucket""".stripMargin) { (s, d) =>
      val tok = fanout(Tables.documents(s, d))
        .select(col("doc_id"), explode(expr(toks)).as("token"))
        .localCheckpoint(eager = false)
      val mx = Tables.documents(s, d)
        .agg(max("doc_id").cast("long").as("mx"))
      val tb = tok.crossJoin(broadcast(mx))
        .selectExpr("CAST((doc_id * 10) DIV (mx + 1) AS BIGINT) AS bucket")
        .groupBy("bucket").agg(count(lit(1)).cast("long").as("n_tokens"))
      val fo = tok.groupBy("token")
        .agg(min("doc_id").cast("long").as("fd"))
      val fb = fo.crossJoin(broadcast(mx))
        .selectExpr("CAST((fd * 10) DIV (mx + 1) AS BIGINT) AS bucket")
        .groupBy("bucket").agg(count(lit(1)).cast("long").as("new_types"))
      val g = tb.join(fb.withColumnRenamed("new_types", "nt"),
          Seq("bucket"), "left")
        .selectExpr("bucket", "n_tokens",
          "CAST(coalesce(nt, 0) AS BIGINT) AS new_types")
        .localCheckpoint(eager = false) // fixed 10-bucket frame
      val w = Window.orderBy("bucket")
      val c = g
        .withColumn("cum_tokens", sum("n_tokens").over(w).cast("long"))
        .withColumn("cum_vocab", sum("new_types").over(w).cast("long"))
      val pt = c.select(round(log(col("cum_tokens")), 9).as("x"),
        round(log(col("cum_vocab")), 9).as("y"))
      val o = pt.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast(DecimalType(38, 9))).cast("double").as("sx"),
        sum(col("y").cast(DecimalType(38, 9))).cast("double").as("sy"),
        sum(round(col("x") * col("x"), 9).cast(DecimalType(38, 9)))
          .cast("double").as("sxx"),
        sum(round(col("x") * col("y"), 9).cast(DecimalType(38, 9)))
          .cast("double").as("sxy"))
      val b = o.selectExpr(
        "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) AS beta",
        "n", "sx", "sy")
      c.crossJoin(broadcast(b))
        .selectExpr("bucket", "n_tokens", "new_types", "cum_tokens",
          "cum_vocab", "round(beta, 6) AS heaps_beta",
          "round(exp((sy - beta * sx) / n), 6) AS heaps_k")
        .orderBy("bucket")
    },

    // IDENTIFIER / PII DENSITY — the release-gate measurement over
    // every free-text surface: long digit runs (account/card-like),
    // #-handles (the synthetic corpus's Customer#000000000 keys are
    // exactly such identifiers), and email-shaped tokens, counted
    // per surface with the rows-affected share. q_text_redact MASKS
    // a known pattern; this MEASURES how much identifier mass each
    // surface carries — the audit that decides whether redaction is
    // even sufficient or the column must be dropped. Scale: pure
    // scan-local codegen regexp counts over a UNION of the text
    // surfaces, then ONE partial-aggregated fold to the
    // 2-surface frame. Determinism: integer match counts (identical
    // RE semantics for these character-class patterns); one rounded
    // division per ratio.
    Q("q_pii_density",
      """WITH u AS (SELECT 'customer_name' AS surface, c_name AS t
        |    FROM customer
        |  UNION ALL SELECT 'document_text', text FROM documents),
        |m AS (SELECT surface,
        |    CAST(len(regexp_extract_all(t, '[0-9]{6,}')) AS BIGINT)
        |      AS dr,
        |    CAST(len(regexp_extract_all(t, '#[0-9]+')) AS BIGINT) AS hd,
        |    CAST(len(regexp_extract_all(t,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+')) AS BIGINT) AS em
        |  FROM u)
        |SELECT surface, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (dr + hd + em > 0) AS BIGINT)
        |    AS rows_with_id,
        |  CAST(sum(dr) AS BIGINT) AS digit_runs,
        |  CAST(sum(hd) AS BIGINT) AS handles,
        |  CAST(sum(em) AS BIGINT) AS emails,
        |  round(CAST(count(*) FILTER (dr + hd + em > 0) AS DOUBLE)
        |    / count(*), 6) AS id_density
        |FROM m GROUP BY surface ORDER BY surface""".stripMargin) { (s, d) =>
      val u = Tables.customer(s, d)
        .selectExpr("'customer_name' AS surface", "c_name AS t")
        .unionAll(Tables.documents(s, d)
          .selectExpr("'document_text' AS surface", "text AS t"))
      u.selectExpr("surface",
          "CAST(size(regexp_extract_all(t, '[0-9]{6,}', 0)) AS BIGINT)" +
            " AS dr",
          "CAST(size(regexp_extract_all(t, '#[0-9]+', 0)) AS BIGINT)" +
            " AS hd",
          "CAST(size(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+'," +
            " 0)) AS BIGINT) AS em")
        .groupBy("surface")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(when(col("dr") + col("hd") + col("em") > 0, 1L)
            .otherwise(0L)).cast("long").as("rows_with_id"),
          sum("dr").cast("long").as("digit_runs"),
          sum("hd").cast("long").as("handles"),
          sum("em").cast("long").as("emails"))
        .selectExpr("surface", "n_rows", "rows_with_id", "digit_runs",
          "handles", "emails",
          "round(CAST(rows_with_id AS DOUBLE) / n_rows, 6) AS id_density")
        .orderBy("surface")
    })
}
