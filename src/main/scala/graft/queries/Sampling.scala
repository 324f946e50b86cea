package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextKit.{h28, h28Duck, toks, toksDuck}

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

    // WEIGHTED sample without replacement — Efraimidis-Spirakis
    // exponential jumps: each document draws a deterministic uniform
    // u ∈ (0,1] from its salted key hash and competes with key
    // ln(u)/w (w = n_chars); the top-k keys ARE a w-proportional
    // sample without replacement (Efraimidis & Spirakis 2006, the
    // standard one-pass distributed weighted reservoir). Long
    // documents win proportionally more slots — the "sample by
    // token mass, not by row" primitive behind mixture building.
    // Scale: scan-local key arithmetic + ONE TakeOrderedAndProject;
    // zero shuffles, reproducible across engines, runs, and task
    // retries (same discipline as q_sample_hash — never rand()).
    // greatest(n_chars, 1) guards the zero-length document: without
    // it Spark yields -Infinity where DuckDB errors/NULLs, so the
    // engines would diverge on corpora containing empty docs.
    Q("q_sample_weighted",
      s"""SELECT doc_id, lang, n_chars,
         |  round(ln((${h28Duck("'wsmp#' || doc_id")} + 1) / 268435456.0)
         |        / greatest(n_chars, 1), 9) AS skey
         |FROM documents
         |ORDER BY ln((${h28Duck("'wsmp#' || doc_id")} + 1) / 268435456.0)
         |         / greatest(n_chars, 1) DESC, doc_id
         |LIMIT 50""".stripMargin) { (s, d) =>
      val u = (expr(s"${h28("concat('wsmp#', CAST(doc_id AS STRING))")}") +
        lit(1)) / lit(268435456.0)
      val key = log(u) / greatest(col("n_chars"), lit(1))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(key, 9).as("skey"), key.as("k0"))
        .orderBy(col("k0").desc, col("doc_id"))
        .limit(50)
        .drop("k0")
    },

    // TRAIN/VAL/TEST SPLIT — deterministic, leak-free 80/10/10
    // partition of the corpus into NAMED splits by salted key hash:
    // the assignment artifact every training run consumes (vs
    // q_sample_hash, which draws ONE Bernoulli subset — a split must
    // be exhaustive, disjoint, and stable under re-runs, appends,
    // and task retries, which is exactly what the content-independent
    // hash gives: a document's split never changes when the corpus
    // grows). Scale: scan-local CASE over the hash — zero shuffles
    // before the output sort; split membership is pushable into any
    // downstream read.
    Q("q_split_assign",
      s"""SELECT doc_id, lang,
         |  CASE WHEN ${h28Duck("'split#' || doc_id")} < 214748365 THEN 'train'
         |       WHEN ${h28Duck("'split#' || doc_id")} < 241591910 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val h = expr(h28("concat('split#', CAST(doc_id AS STRING))"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(h < 214748365L, "train")
            .when(h < 241591910L, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
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

    // Training-shard export: every doc hashes to one of 16 shards
    // (salted key hash — stable across runs/retries, like the
    // Bernoulli sample above), the table repartitions on the shard id
    // (the exchange IS the export layout: one writer task group per
    // shard), and the result is the per-shard manifest a trainer
    // consumes — row count, corpus bytes, an order-independent
    // content checksum. The groupBy reuses the repartition's hash
    // layout, so assignment + manifest cost ONE shuffle total.
    Q("q_export_shards",
      s"""WITH a AS (SELECT
         |    ${h28Duck("'shard#' || CAST(doc_id AS VARCHAR)")} % 16 AS shard,
         |    n_chars, ${h28Duck("text")} AS h
         |  FROM documents)
         |SELECT shard, count(*) AS n,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(h) AS BIGINT) AS checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
      fanout(Tables.documents(s, d))
        .withColumn("shard",
          expr(h28("concat('shard#', CAST(doc_id AS STRING))")) % 16)
        .withColumn("h", expr(h28("text")))
        .repartition(col("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("total_chars"),
          sum("h").as("checksum"))
        .orderBy("shard")
    },

    // Sequence packing: concatenate-then-chunk the corpus into
    // fixed-length (512-token) training sequences — each doc's token
    // span maps onto a running offset, and the 512-boundary chunking
    // assigns its first/last sequence ids plus how many boundaries
    // cut through it. Pure integer math (exact on both engines).
    //
    // The running offset is the DISTRIBUTED PREFIX SUM, not a global
    // window: docs range-bucket into ≤1024 shards by a monotone
    // doc_id split (integer DIV, so shard order ⊆ doc order), each
    // shard prefix-sums locally under a PARTITIONED window, and the
    // shard base offsets come from a triangular join over the
    // ≤1024-row per-shard totals frame — metadata-sized at any
    // corpus size. No partition-less window anywhere in the plan
    // (asserted in ScalePathSpec); one task never absorbs the
    // corpus. The oracle states the same prefix sum as one global
    // window — DuckDB's single-node planner is welcome to it.
    Q("q_pack_sequences",
      s"""WITH t AS (SELECT doc_id, len($toksDuck) AS n_tok FROM documents),
         |o AS (SELECT doc_id, n_tok,
         |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM t)
         |SELECT doc_id, n_tok, start_off,
         |  start_off // 512 AS seq_first,
         |  CAST(CASE WHEN n_tok = 0 THEN start_off // 512
         |       ELSE (start_off + n_tok - 1) // 512 END AS BIGINT) AS seq_last,
         |  CAST(CASE WHEN n_tok = 0 THEN 0
         |       ELSE (start_off + n_tok - 1) // 512 - start_off // 512
         |       END AS BIGINT) AS n_splits
         |FROM o ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // ONE tokenize pass: the (doc_id, n_tok) projection is
      // localCheckpointed (16 B/row — doc-count-sized, never
      // corpus-sized) so all three downstream consumers (min/max,
      // shard totals, final join) read the materialized frame instead
      // of re-running the tokenize or relying on exchange reuse,
      // which AQE can fail to canonicalize (the q_mixture precedent).
      val t0 = barrier(docs.withColumn("tk", expr(toks)))
        .select(col("doc_id"), size(col("tk")).cast("bigint").as("n_tok"))
        .localCheckpoint()
      // Shard split: bkt = (doc_id - lo) DIV width with
      // width = (hi - lo) DIV 1024 + 1 — monotone in doc_id, all
      // integer (no float drift), values in [0, 1024) for any id
      // range. min/max rides the checkpointed frame — no separate
      // scan job.
      val mm = t0.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      val t = t0.crossJoin(broadcast(mm))
        .withColumn("bkt",
          expr("(doc_id - lo) DIV ((hi - lo) DIV 1024 + 1)"))
      // Per-shard token totals (≤1024 rows); each shard's base offset
      // is the sum of all earlier shards' totals — a triangular join
      // on the metadata-sized frame, not a window over data.
      val tot = t.groupBy("bkt").agg(sum("n_tok").as("btot"))
      val off = tot
        .join(broadcast(tot.select(col("bkt").as("obkt"),
          col("btot").as("obtot"))), col("obkt") < col("bkt"), "left")
        .groupBy("bkt")
        .agg(coalesce(sum("obtot"), lit(0L)).as("boff"))
      // Shard-local prefix sum under a PARTITIONED window + the
      // broadcast base offset = the exact global running offset.
      val w = Window.partitionBy("bkt").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.join(broadcast(off), "bkt")
        .withColumn("start_off",
          col("boff") + coalesce(sum("n_tok").over(w), lit(0L)))
        .select(col("doc_id"), col("n_tok"), col("start_off"),
          expr("start_off DIV 512").as("seq_first"),
          expr("""CASE WHEN n_tok = 0 THEN start_off DIV 512
                 |ELSE (start_off + n_tok - 1) DIV 512 END""".stripMargin)
            .as("seq_last"))
        .withColumn("n_splits",
          when(col("n_tok") === 0, 0L)
            .otherwise(col("seq_last") - col("seq_first")))
        .orderBy("doc_id")
    },

    // Mixture weights: temperature-scaled (τ = 0.7) per-language
    // sampling weights over token counts — the knob that rebalances
    // a multilingual corpus before training (raw proportions
    // over-sample the head language; τ < 1 flattens). Token counts
    // are exact integers; pow() runs on both engines and its result
    // is pinned through DECIMAL(38,12) so the normalizing sum is
    // order-independent; the final weight divides as double and
    // rounds to 6dp. Weights sum to 1 (asserted in tests).
    Q("q_mixture_weights",
      s"""WITH t AS (SELECT lang, len($toksDuck) AS n_tok FROM documents),
         |pl AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS toks,
         |         count(*) AS n_docs FROM t GROUP BY lang),
         |sc AS (SELECT *, CAST(pow(CAST(toks AS DOUBLE), 0.7)
         |                      AS DECIMAL(38,12)) AS p FROM pl),
         |tt AS (SELECT sum(p) AS ptot FROM sc)
         |SELECT lang, toks, n_docs,
         |  round(CAST(p AS DOUBLE) / CAST(ptot AS DOUBLE), 6) AS weight
         |FROM sc, tt ORDER BY lang""".stripMargin) { (s, d) =>
      val t = barrier(Tables.documents(s, d).withColumn("w", expr(toks)))
        .select(col("lang"), size(col("w")).as("n_tok"))
      val perLang = t.groupBy("lang")
        .agg(sum("n_tok").as("toks"), count(lit(1)).as("n_docs"))
        .withColumn("p",
          pow(col("toks").cast("double"), 0.7)
            .cast(org.apache.spark.sql.types.DecimalType(38, 12)))
      val tot = perLang.agg(sum("p").as("ptot"))
      perLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("toks"), col("n_docs"),
          round(col("p").cast("double") / col("ptot").cast("double"), 6)
            .as("weight"))
        .orderBy("lang")
    },

    // MIXTURE APPLICATION: materialize the training mix the τ=0.7
    // weights prescribe — a budget of 40% of the corpus, each
    // language contributing floor(weight·budget + 0.5) documents
    // (floor(x+0.5) rounds identically on both engines; round()
    // half-up vs half-even would not), chosen by md5-hash rank so
    // the SAME docs are selected on any engine, any run, any
    // partitioning. Temperature flattening makes head languages'
    // quotas bind (undersampled) while tail languages keep more of
    // their docs — the point of the mix. The
    // quota window is one shuffle keyed on lang; the 100 TB form of
    // the SAME selection — hash threshold + histogram boundary, no
    // per-language global rank — is q_mixture_apply_threshold below
    // (set equality between the two is pinned in ScalePathSpec).
    Q("q_mixture_apply",
      s"""WITH t AS (SELECT doc_id, lang, len($toksDuck) AS n_tok FROM documents),
         |pl AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS toks FROM t GROUP BY lang),
         |sc AS (SELECT lang, CAST(pow(CAST(toks AS DOUBLE), 0.7)
         |                         AS DECIMAL(38,12)) AS p FROM pl),
         |tt AS (SELECT sum(p) AS ptot FROM sc),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) * 0.4 AS budget FROM documents),
         |tgt AS (SELECT lang, CAST(floor(CAST(p AS DOUBLE) / CAST(ptot AS DOUBLE)
         |                               * budget + 0.5) AS BIGINT) AS quota
         |        FROM sc, tt, nn),
         |rk AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |         ORDER BY ${h28Duck("CAST(doc_id AS VARCHAR)")}, doc_id) AS r
         |       FROM documents)
         |SELECT rk.doc_id, rk.lang, rk.r AS pick_rank
         |FROM rk JOIN tgt USING (lang) WHERE rk.r <= tgt.quota
         |ORDER BY rk.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val t = barrier(docs.withColumn("w", expr(toks)))
        .select(col("lang"), size(col("w")).as("n_tok"))
      val perLang = t.groupBy("lang")
        .agg(sum("n_tok").cast("long").as("toks"))
        .withColumn("p", pow(col("toks").cast("double"), 0.7)
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)))
      val tot = perLang.agg(sum("p").as("ptot"))
      val nn = docs.agg((count(lit(1)).cast("double") * 0.4).as("budget"))
      val tgt = perLang.crossJoin(broadcast(tot)).crossJoin(broadcast(nn))
        .select(col("lang"),
          floor(col("p").cast("double") / col("ptot").cast("double")
            * col("budget") + 0.5).cast("long").as("quota"))
      val byLang = Window.partitionBy("lang")
        .orderBy(expr(h28("CAST(doc_id AS STRING)")), col("doc_id"))
      docs.withColumn("r", row_number().over(byLang))
        .join(broadcast(tgt), "lang")
        .filter(col("r") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("r").as("pick_rank"))
        .orderBy("doc_id")
    },

    // MIXTURE APPLICATION, 100 TB PATH: the SAME selected set as
    // q_mixture_apply (hash-smallest `quota` docs per language)
    // computed WITHOUT ranking every row — the per-lang global
    // row_number above shuffles and sorts the whole corpus per
    // language; this variant is the declared scale form:
    //   1. bucket each doc's 28-bit hash into 2^16 coarse buckets
    //      (bucket = h >> 12, monotone in h);
    //   2. one (lang, bucket) COUNT — a metadata-sized histogram
    //      (≤ langs × 65536 rows however big the corpus), whose
    //      cumulative window costs nothing at any n;
    //   3. per lang, the BOUNDARY bucket where the cumulative count
    //      crosses the quota, and the residual still owed there;
    //   4. scan-local keep of every doc below the boundary bucket
    //      (a pushable h < threshold predicate — the "hash
    //      threshold"), plus a rank over ONLY the boundary bucket's
    //      rows (expected n/2^16 per lang) for the residual.
    // The set is EXACTLY the quota path's — bucket order is a prefix
    // of the (h, doc_id) order — so the count delta per language is
    // 0, asserted in ScalePathSpec; the oracle is the quota
    // semantics directly.
    Q("q_mixture_apply_threshold",
      s"""WITH t AS (SELECT doc_id, lang, len($toksDuck) AS n_tok FROM documents),
         |pl AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS toks FROM t GROUP BY lang),
         |sc AS (SELECT lang, CAST(pow(CAST(toks AS DOUBLE), 0.7)
         |                         AS DECIMAL(38,12)) AS p FROM pl),
         |tt AS (SELECT sum(p) AS ptot FROM sc),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) * 0.4 AS budget FROM documents),
         |tgt AS (SELECT lang, CAST(floor(CAST(p AS DOUBLE) / CAST(ptot AS DOUBLE)
         |                               * budget + 0.5) AS BIGINT) AS quota
         |        FROM sc, tt, nn),
         |rk AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |         ORDER BY ${h28Duck("CAST(doc_id AS VARCHAR)")}, doc_id) AS r
         |       FROM documents)
         |SELECT rk.doc_id, rk.lang
         |FROM rk JOIN tgt USING (lang) WHERE rk.r <= tgt.quota
         |ORDER BY rk.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val t = barrier(docs.withColumn("w", expr(toks)))
        .select(col("lang"), size(col("w")).as("n_tok"))
      val perLang = t.groupBy("lang")
        .agg(sum("n_tok").cast("long").as("toks"))
        .withColumn("p", pow(col("toks").cast("double"), 0.7)
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)))
      val tot = perLang.agg(sum("p").as("ptot"))
      val nn = docs.agg((count(lit(1)).cast("double") * 0.4).as("budget"))
      // localCheckpoint: tgt rides on the tokenize pass (the expensive
      // subtree) and is referenced twice below; materializing its
      // ≤|langs| rows once pins ONE tokenize pass regardless of how
      // many consumers the selection plan has (asserted in
      // ScalePathSpec — without it the noop sink re-derived the quota
      // subtree per reference, ~10× this query's real cost).
      val tgt = perLang.crossJoin(broadcast(tot)).crossJoin(broadcast(nn))
        .select(col("lang"),
          floor(col("p").cast("double") / col("ptot").cast("double")
            * col("budget") + 0.5).cast("long").as("quota"))
        .localCheckpoint()
      val withH = docs.select(col("doc_id"), col("lang"),
          expr(h28("CAST(doc_id AS STRING)")).as("h"))
        .withColumn("bkt", shiftright(col("h"), 12))
      // (lang, bucket) histogram + its cumulative prefix: the window
      // runs over histogram rows, bounded by langs × 2^16 at any
      // corpus size.
      val hist = withH.groupBy("lang", "bkt").agg(count(lit(1)).as("cnt"))
      val wcum = Window.partitionBy("lang").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist.withColumn("below",
        coalesce(sum("cnt").over(wcum), lit(0L)))
      // Boundary bucket = last bucket whose prefix is short of the
      // quota; residual = what the prefix still owes there. Also
      // checkpointed (≤|langs| rows): both selection branches below
      // join against it.
      val bound = cum.join(broadcast(tgt), "lang")
        .filter(col("below") < col("quota"))
        .groupBy("lang")
        .agg(max(struct(col("bkt"), col("below"))).as("m"))
        .join(broadcast(tgt), "lang")
        .select(col("lang"), col("m.bkt").as("bbkt"),
          (col("quota") - col("m.below")).as("resid"))
        .localCheckpoint()
      val flagged = withH.join(broadcast(bound), "lang")
      val belowSel = flagged.filter(col("bkt") < col("bbkt"))
        .select("doc_id", "lang")
      val wEdge = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      val edgeSel = flagged.filter(col("bkt") === col("bbkt"))
        .withColumn("r", row_number().over(wEdge))
        .filter(col("r") <= col("resid"))
        .select("doc_id", "lang")
      belowSel.unionByName(edgeSel).orderBy("doc_id")
    },

    // OUT-OF-FOLD TARGET ENCODING — leakage-safe mean-target
    // encoding of a categorical feature: each of 5 hash folds gets
    // the category's target mean computed from the OTHER four folds
    // (encode a row with a statistic that saw the row itself and the
    // model memorizes the target — the classic target-encoding leak;
    // out-of-fold is the standard fix). Folds reuse the engine's
    // salted-hash split discipline (q_split_assign), so assignment
    // is stable under appends and retries. Scale: ONE
    // partial-aggregated pass folds the corpus to category×fold
    // cells; the per-category totals re-aggregate THOSE cells
    // (no second scan) and broadcast back; the out-of-fold mean is
    // pure cell arithmetic — (S − S_cell) / (n − n_cell) in EXACT
    // INTEGER micro space ((2S+n) DIV 2n, positive operands).
    Q("q_target_encoding",
      s"""WITH o AS (SELECT o_orderpriority AS prio,
         |    ${h28Duck("'fold#' || o_orderkey")} % 5 AS fold,
         |    CAST(floor(round(o_totalprice, 6) * 1e6 + 0.5) AS BIGINT)
         |      AS micro FROM orders),
         |cell AS (SELECT prio, fold, count(*) AS n_cell,
         |    CAST(sum(micro) AS BIGINT) AS s_cell FROM o GROUP BY 1, 2),
         |g AS (SELECT prio AS gp, CAST(sum(n_cell) AS BIGINT) AS n,
         |    CAST(sum(s_cell) AS BIGINT) AS s FROM cell GROUP BY prio)
         |SELECT prio, fold, n_cell, n - n_cell AS oof_n,
         |  round(((2 * (s - s_cell) + (n - n_cell))
         |         // (2 * (n - n_cell))) / 1e6, 6) AS encoding
         |FROM cell JOIN g ON gp = prio
         |ORDER BY prio, fold""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"),
        (expr(h28("concat('fold#', CAST(o_orderkey AS STRING))")) % 5)
          .as("fold"),
        floor(round(col("o_totalprice"), 6) * lit(1e6) + 0.5).cast("long")
          .as("micro"))
      val cell = o.groupBy("prio", "fold")
        .agg(count(lit(1)).as("n_cell"),
          sum("micro").cast("long").as("s_cell"))
        .localCheckpoint(eager = false)
      val g = cell.groupBy("prio")
        .agg(sum("n_cell").cast("long").as("n"),
          sum("s_cell").cast("long").as("s"))
      cell.join(broadcast(g), "prio")
        .selectExpr("prio", "fold", "n_cell", "n - n_cell AS oof_n",
          "round(((2 * (s - s_cell) + (n - n_cell))" +
            " DIV (2 * (n - n_cell))) / 1e6, 6) AS encoding")
        .orderBy("prio", "fold")
    },

    // GREEDY SET COVER — 5 rounds of max-coverage document
    // selection: each round picks the document adding the MOST
    // not-yet-covered vocabulary tokens (ties → lowest doc_id) and
    // folds its tokens into the covered set — the classic (1−1/e)
    // greedy submodular-maximization core of coverage-driven data
    // selection ("which K documents teach the vocabulary fastest"
    // — the curation counterpart to q_mixture_weights: mixtures
    // RE-WEIGHT sources, cover SELECTS exemplars; same machinery =
    // facility location / k-center seeding over any gain function).
    // Scale: the posting frame (doc, token) builds ONCE and pins;
    // per round ONE anti-join against the vocabulary-sized covered
    // frame + ONE partial-aggregated groupBy, argmax by
    // TakeOrderedAndProject(1); the winner's tokens attach by a
    // 1-row BROADCAST semi-join; covered stays vocabulary-sized and
    // localCheckpoints per round (q_kcore loop discipline — O(1)
    // lineage). Determinism: exact integer gains, total tie-break
    // (gain DESC, doc_id); oracle = 5 chained MATERIALIZED CTEs.
    Q("q_greedy_cover", SamplingOracles.greedyCoverSql(5)) { (s, d) =>
      // the cover universe is word BIGRAMS: the unigram vocabulary of
      // the fixture saturates in one pick; bigrams give the greedy
      // frontier real curvature (and are the unit q_ngram_counts /
      // q_collocations already treat as the vocabulary of interest)
      val post = Tables.documents(s, d)
        .withColumn("w", expr(TextKit.toks))
        .select(col("doc_id"),
          explode(expr(TextKit.shinglesN("w", 2, distinct = true)))
            .as("tok"))
        .localCheckpoint(eager = false)
      val vocab = post.agg(countDistinct("tok").cast("long").as("v"))
        .localCheckpoint(eager = false)
      var cov: org.apache.spark.sql.DataFrame = null
      var rows: org.apache.spark.sql.DataFrame = null
      for (r <- 1 to 5) {
        val base =
          if (cov == null) post
          else post.join(cov, Seq("tok"), "left_anti")
        val pick = base.groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .localCheckpoint(eager = false)
        val newCov = post
          .join(broadcast(pick.select("doc_id")), "doc_id")
          .select("tok")
        cov = (if (cov == null) newCov else cov.union(newCov))
          .distinct().localCheckpoint(eager = false)
        val row = pick.withColumn("step", lit(r.toLong))
          .crossJoin(broadcast(
            cov.agg(count(lit(1)).cast("long").as("covered"))))
        rows = if (rows == null) row else rows.union(row)
      }
      rows.crossJoin(broadcast(vocab))
        .selectExpr("step", "doc_id", "gain", "covered",
          "round(CAST(covered AS DOUBLE) / v, 9) AS coverage_frac")
        .orderBy("step")
    },

    // PACKING-EFFICIENCY AUDIT — the sizing study run BEFORE
    // q_pack_sequences commits to a max_len: for each candidate
    // context length, how much of the token stream survives
    // clipping, how many docs clip, and how far naive
    // one-doc-per-sequence padding sits from the bin-packing lower
    // bound ⌈Σtokens/L⌉ (the gap IS the budget packing can
    // reclaim — at 100 TB a 0.3 fill ratio triples the training
    // cost of every epoch). One tokenize pass fanned out across the
    // three candidate lengths by an explode of a 3-element literal
    // (rows 3×docs, never reshuffled before the 3-row aggregate);
    // all integer arithmetic until the final ratios.
    Q("q_pack_efficiency",
      s"""WITH t AS (SELECT doc_id, len($toksDuck) AS n_tok FROM documents),
         |l AS (SELECT unnest([64, 128, 256]) AS max_len),
         |j AS (SELECT max_len, n_tok,
         |    least(n_tok, max_len) AS kept FROM t CROSS JOIN l)
         |SELECT max_len, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS toks_total,
         |  CAST(sum(kept) AS BIGINT) AS toks_kept,
         |  CAST(count(*) FILTER (n_tok > max_len) AS BIGINT) AS n_clipped,
         |  CAST(sum(max_len - kept) AS BIGINT) AS pad_naive,
         |  CAST(ceil(CAST(sum(kept) AS DOUBLE) / max_len) AS BIGINT)
         |    AS bins_lower_bound,
         |  round(CAST(sum(kept) AS DOUBLE) / (count(*) * max_len), 6)
         |    AS fill_naive
         |FROM j GROUP BY max_len ORDER BY max_len""".stripMargin) {
      (s, d) =>
        val t = barrier(Tables.documents(s, d)
          .select(col("doc_id"), size(expr(toks)).cast("long").as("n_tok")))
        t.select(col("n_tok"),
            explode(array(lit(64L), lit(128L), lit(256L))).as("max_len"))
          .withColumn("kept", least(col("n_tok"), col("max_len")))
          .groupBy("max_len")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").cast("long").as("toks_total"),
            sum("kept").cast("long").as("toks_kept"),
            sum(when(col("n_tok") > col("max_len"), 1L).otherwise(0L))
              .cast("long").as("n_clipped"),
            sum(col("max_len") - col("kept")).cast("long").as("pad_naive"))
          .selectExpr("max_len", "n_docs", "toks_total", "toks_kept",
            "n_clipped", "pad_naive",
            "CAST(ceil(CAST(toks_kept AS DOUBLE) / max_len) AS BIGINT)" +
              " AS bins_lower_bound",
            "round(CAST(toks_kept AS DOUBLE) / (n_docs * max_len), 6)" +
              " AS fill_naive")
          .orderBy("max_len")
    },

    // CLASS-BALANCED OVERSAMPLE — resample every label class up to
    // the majority-class size by deterministic hash-ring cycling:
    // slot i of a class takes the class's ((i−1) mod nl)+1-th member
    // in salted-hash order, so minority members repeat uniformly
    // (±1) and is_dup marks the synthetic copies — the class-
    // rebalancing pass before training on skewed labels, the
    // labeled-data sibling of q_mixture_apply's source-share
    // resampling (and the with-replacement complement of
    // q_sample_stratified's k-per-stratum downsample). No rand():
    // the q_sample_hash discipline — reruns, retries, and both
    // engines produce the identical sample. Scale: one label-keyed
    // rank window; slot generation EXPLODES THE |labels|-ROW CLASS
    // FRAME (never the corpus) to |labels|×max-class rows — the
    // output's own size, nothing bigger — and lands back on the
    // corpus via one (label, rank) co-partitioned equi-join.
    Q("q_class_balance",
      s"""WITH e AS (SELECT vec_id, label FROM embeddings),
         |labs AS (SELECT label, CAST(count(*) AS BIGINT) AS nl
         |         FROM e GROUP BY 1),
         |mx AS (SELECT CAST(max(nl) AS BIGINT) AS m FROM labs),
         |r AS (SELECT vec_id, label, CAST(row_number() OVER (
         |    PARTITION BY label ORDER BY
         |      ${h28Duck("'bal#' || vec_id")}, vec_id) AS BIGINT) AS rk
         |  FROM e),
         |slots AS (SELECT label, nl,
         |    unnest(generate_series(1, m)) AS slot
         |  FROM labs CROSS JOIN mx)
         |SELECT s.label, CAST(s.slot AS BIGINT) AS slot, r.vec_id,
         |  CAST(CASE WHEN s.slot > s.nl THEN 1 ELSE 0 END AS INT)
         |    AS is_dup
         |FROM slots s JOIN r ON r.label = s.label
         |  AND r.rk = (s.slot - 1) % s.nl + 1
         |ORDER BY s.label, s.slot""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d).select("vec_id", "label")
      val labs = e.groupBy("label").agg(count(lit(1)).cast("long").as("nl"))
      val mx = labs.agg(max("nl").as("m"))
      val r = e.withColumn("rk",
        row_number().over(Window.partitionBy("label")
          .orderBy(expr(h28("concat('bal#', CAST(vec_id AS STRING))")),
            col("vec_id"))).cast("long"))
      val slots = labs.crossJoin(broadcast(mx))
        .select(col("label"), col("nl"),
          explode(expr("sequence(1L, m)")).as("slot"))
        .withColumn("rk", (col("slot") - 1) % col("nl") + 1)
      slots.join(r, Seq("label", "rk"))
        .selectExpr("label", "CAST(slot AS BIGINT) AS slot", "vec_id",
          "CAST(CASE WHEN slot > nl THEN 1 ELSE 0 END AS INT) AS is_dup")
        .orderBy("label", "slot")
    },
  )
}

object SamplingOracles {
  import TextKit.toksDuck

  /** Chained-CTE oracle for the fixed greedy set-cover rounds: each
    * round's pick and covered-set CTEs are MATERIALIZED (they are
    * referenced by every later round — DuckDB's default inlining
    * would re-expand the chain exponentially, the q_dbscan lesson).
    * Same tie-break (gain DESC, doc_id) as the Spark loop. */
  def greedyCoverSql(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      val notCovered =
        if (r == 1) ""
        else s" WHERE tok NOT IN (SELECT tok FROM c${r - 1})"
      val pick =
        s"""p$r AS MATERIALIZED (SELECT doc_id,
           |    CAST(count(*) AS BIGINT) AS gain FROM post$notCovered
           |  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1)"""
          .stripMargin
      val cover =
        if (r == 1)
          s"""c1 AS MATERIALIZED (SELECT DISTINCT tok FROM post
             |  JOIN p1 USING (doc_id))""".stripMargin
        else
          s"""c$r AS MATERIALIZED (SELECT tok FROM c${r - 1}
             |  UNION SELECT tok FROM post JOIN p$r USING (doc_id))"""
            .stripMargin
      s"$pick,\n$cover"
    }.mkString(",\n")
    val rows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS step, doc_id, gain,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS covered
         |FROM p$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH wtok AS (SELECT doc_id, $toksDuck AS w FROM documents),
       |post AS MATERIALIZED (SELECT doc_id,
       |    unnest(${TextKit.shinglesNDuck("w", 2, distinct = true)})
       |      AS tok FROM wtok),
       |vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
       |          FROM post),
       |$steps
       |SELECT step, doc_id, gain, covered,
       |  round(CAST(covered AS DOUBLE) / v, 9) AS coverage_frac
       |FROM ($rows) u CROSS JOIN vocab
       |ORDER BY step""".stripMargin
  }
}
