package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextKit.{h28, h28Duck}

/** Sampling + physical-layout operators — the corpus-curation verbs
  * of a training-data pipeline (subsample for ablations, stratify
  * across languages, cluster the layout for data skipping).
  *
  * Sampling here is HASH-based, never `rand()`: at 100 TB a sample
  * must be reproducible across runs, engines, and retried tasks, and
  * a salted md5 of the key gives exactly that (plus oracle
  * verifiability) while staying scan-local — zero shuffles for the
  * Bernoulli sample, one bounded per-group shuffle for the
  * stratified one. */
object Sampling {

  val qs: Seq[Q] = Seq(

    // Deterministic Bernoulli sample: keep ~30% of documents by a
    // salted content-independent key hash. Pushable predicate, no
    // state, stable under re-runs and task retries — the 100 TB
    // replacement for TABLESAMPLE/rand().
    Q("q_sample_hash",
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${h28Duck("'smp#' || doc_id")} % 100 < 30
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(expr(s"${h28("concat('smp#', CAST(doc_id AS STRING))")} % 100 < 30"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // Stratified sample: exactly k=20 documents per language, chosen
    // by hash rank (deterministic, unbiased within stratum). One
    // shuffle keyed on the stratum; the rank-k filter is the same
    // grouped-top-k pattern as q_topk_group, so partial top-k merging
    // applies at scale.
    Q("q_sample_stratified",
      s"""WITH r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h28Duck("'strat#' || doc_id")}, doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, lang FROM r WHERE rn <= 20
         |ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val hk = expr(s"${h28("concat('strat#', CAST(doc_id AS STRING))")}")
      val w = Window.partitionBy("lang").orderBy(hk, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    },

    // Z-order layout: interleave the low 16 bits of two join/filter
    // dimensions into one clustering key, then report per-bucket
    // (zkey prefix) locality stats. Because the bucket is a PREFIX of
    // the interleaved key, both dimensions' min/max spans per bucket
    // are narrow — exactly the property that makes multi-dimensional
    // data skipping work when the table is written
    // `repartitionByRange(zkey).sortWithinPartitions(zkey)` (the
    // write itself is q_sink_partitioned's territory; this operator
    // is the key computation + the skipping evidence).
    Q("q_zorder_layout",
      """WITH z AS (SELECT l_partkey, l_suppkey,
        |    CAST(list_sum([(((l_partkey >> i) & 1) << (2 * i))
        |                   + (((l_suppkey >> i) & 1) << (2 * i + 1))
        |                   for i in range(0, 16)]) AS BIGINT) AS zkey
        |  FROM lineitem)
        |SELECT zkey >> 26 AS zbucket, count(*) AS n,
        |  min(l_partkey) AS p_min, max(l_partkey) AS p_max,
        |  min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
        |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin) { (s, d) =>
      val zkey = expr(
        """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) ->
          |  acc + shiftleft(shiftright(l_partkey, i) & 1, 2 * i)
          |      + shiftleft(shiftright(l_suppkey, i) & 1, 2 * i + 1))""".stripMargin)
      fanout(Tables.lineitem(s, d).select("l_partkey", "l_suppkey"))
        .withColumn("zkey", zkey)
        .withColumn("zbucket", expr("shiftright(zkey, 26)"))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("p_min"), max("l_partkey").as("p_max"),
          min("l_suppkey").as("s_min"), max("l_suppkey").as("s_max"))
        .orderBy("zbucket")
    },
  )
}
