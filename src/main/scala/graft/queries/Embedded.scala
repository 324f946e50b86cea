package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Embedders, HashImageEmbedder, TemplateCaptioner}

/** Batch embedding generation + captioning (SURVEY §2A A3/A4/A5) —
  * the reference's actual core pipeline (photo_vector_search.py:30-40
  * embeds, :42-82 captions) and the north star's "Spark for batch
  * embedding generation".
  *
  * Plan shape: a scan feeding `Dataset.mapPartitions` with a
  * per-partition model instance (graft.ml.Embedders' load-once
  * contract), then posexplode to scalar rows for the oracle compare.
  * No shuffle before the final presentation sort: inference is
  * scan-local and scales with partitions, which is the entire point
  * at 100 TB (1000 executors × a model session each; swap the hash
  * surrogate for an ONNX/HTTP embedder behind the same trait).
  *
  * The surrogates are md5-derived, so the DuckDB oracle reproduces
  * the full "model" output bit-for-bit (including the float32
  * quantization a real model head emits) — these are hash-matched,
  * not rows-only.
  */
object Embedded {

  /** Surrogate embedding component in SQL (DuckDB): uniform in
    * [-0.5, 0.5) from the 28-bit hash, quantized through float32. */
  private def componentDuck(saltedExpr: String): String =
    s"CAST(CAST(((('0x' || substr(md5($saltedExpr), 1, 7))::BIGINT)::DOUBLE / 268435456 - 0.5) AS FLOAT) AS DOUBLE)"

  private val DIM = 64

  /** Shared text-embed stage: scan → mapPartitions with the
    * conf-selected model (surrogate default, HTTP when
    * `spark.graft.embedder=http` — Embedders.textEmbedderFactory),
    * one instance per partition, rows batched through `embedAll`.
    * `Iterator.duplicate` feeds ids and texts in lockstep — the
    * buffered gap is bounded by the embedder's batch size. */
  private def embedText(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mkModel = Embedders.textEmbedderFactory(s, DIM)
    val ds = fanout(Tables.documents(s, d))
      .select(col("doc_id"), col("text")).as[(Long, String)]
    ds.mapPartitions { rows =>
      val model = mkModel() // once per partition, reused per row
      val (ids, texts) = rows.duplicate
      ids.map(_._1).zip(model.embedAll(texts.map(_._2)))
    }.toDF("doc_id", "emb")
  }

  val qs: Seq[Q] = Seq(

    // The reference's full user workflow as ONE lazy DataFrame
    // program (cli.py index-photos + search-photos-by-text end to
    // end): scan corpus → batch-embed via the mapPartitions model
    // seam → k-NN against a query document's embedding → join result
    // metadata back. Embedding inference and search compose into a
    // single plan — no materialized intermediate store needed (though
    // A7's upsert provides one when incremental).
    Q("q_pipeline_e2e",
      s"""WITH emb AS (SELECT doc_id,
         |    [${componentDuck("text || '#' || i")} for i in range($DIM)] AS v
         |  FROM documents),
         |q AS (SELECT v AS qv FROM emb WHERE doc_id = 0),
         |knn AS (SELECT e.doc_id,
         |    round(1 - list_cosine_similarity(e.v, q.qv), 6) AS dist
         |  FROM emb e, q WHERE e.doc_id <> 0
         |  ORDER BY dist, e.doc_id LIMIT 5)
         |SELECT k.doc_id, k.dist, d.lang, d.source
         |FROM knn k JOIN documents d USING (doc_id)
         |ORDER BY k.dist, k.doc_id""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.cosine_distance
      val emb = embedText(s, d)
      val q = emb.filter(col("doc_id") === 0).select(col("emb").as("qv"))
      emb.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("doc_id"),
          round(cosine_distance(col("emb"), col("qv")), 6).as("dist"))
        .orderBy(col("dist"), col("doc_id")).limit(5)
        .join(broadcast(Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"))), "doc_id")
        .select(col("doc_id"), col("dist"), col("lang"), col("source"))
        .orderBy(col("dist"), col("doc_id"))
    },

    // A4: text → embedding. One row per (doc, component) so the
    // compare is over scalars, not array renderings.
    Q("q_embed_text",
      s"""SELECT doc_id, i, ${componentDuck("text || '#' || i")} AS val
         |FROM documents, range($DIM) t(i)
         |ORDER BY doc_id, i""".stripMargin) { (s, d) =>
      embedText(s, d)
        .select(col("doc_id"), posexplode(col("emb")).as(Seq("i", "v")))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          col("v").cast("double").as("val"))
        .orderBy("doc_id", "i")
    },

    // A3: image → embedding over a binaryFile-shaped input
    // (path/content columns as `spark.read.format("binaryFile")`
    // yields; the bytes here are the documents' text so the oracle
    // can reproduce them — a real run points the same code at an
    // image directory). The decode/resize preprocess stage lives
    // inside the embedder seam (HashImageEmbedder notes).
    Q("q_embed_image",
      s"""SELECT doc_id, i, ${componentDuck("text || '#img#' || i")} AS val
         |FROM documents, range($DIM) t(i)
         |ORDER BY doc_id, i""".stripMargin) { (s, d) =>
      import s.implicits._
      val bin = fanout(Tables.documents(s, d)).select(
        col("doc_id"),
        concat(lit("mem://documents/"), col("doc_id"), lit(".txt")).as("path"),
        col("text").cast("binary").as("content"))
      val ds = bin.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      val emb = ds.mapPartitions { rows =>
        val model = new HashImageEmbedder(DIM)
        rows.map { case (id, bytes) => (id, model.embed(bytes)) }
      }.toDF("doc_id", "emb")
      emb.select(col("doc_id"), posexplode(col("emb")).as(Seq("i", "v")))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          col("v").cast("double").as("val"))
        .orderBy("doc_id", "i")
    },

    // A5: image → description (LLM captioning surrogate): a
    // metadata-grounded template captioner behind the same
    // per-partition seam an Ollama/HTTP client would use.
    Q("q_describe",
      s"""WITH t AS (SELECT doc_id, lang, source, $toksDuckRef AS w FROM documents)
         |SELECT doc_id,
         |  'doc ' || doc_id || ' (' || lang || ', ' || source || '): '
         |    || len(w) || ' tokens, starts ''' || coalesce(w[1], '') || '''' AS caption
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = fanout(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .as[(Long, String, String, String)]
      ds.mapPartitions { rows =>
        val model = new TemplateCaptioner
        rows.map { case (id, lang, src, t) => (id, model.describe(id, lang, src, t)) }
      }.toDF("doc_id", "caption")
        .orderBy("doc_id")
    },
  )

  private def toksDuckRef: String = TextKit.toksDuck
}
