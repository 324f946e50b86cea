package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions.cosine_distance

/** k-NN vector search — the reference's core capability
  * (photo_vector_search.py:156-193, A8-A12 in SURVEY §2A).
  *
  * Plan shape (scale rationale): the query vector is ONE row, joined
  * with an explicit `broadcast` (no shuffle of the big side);
  * `cosine_distance` is a codegen'd single-pass kernel; `orderBy(dist)
  * .limit(k)` collapses to `TakeOrderedAndProjectExec` — per-partition
  * top-k heaps merged on the driver, no global sort, no full shuffle.
  * A metadata pre-filter (A10) lands *before* distance evaluation and
  * is pushed into the parquet scan. This is exactly the plan that
  * survives 100 TB: scan-local work + k rows to the driver.
  */
object VectorSearch {
  private val K = 5 // reference default --k (cli.py:83)

  /** 1-row DataFrame holding the query vector (stand-in for the
    * driver-local query-image/text embedding, photo_vector_search.py:160). */
  private def queryVec(s: SparkSession, dir: String, id: Long): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") === id)
      .select(col("embedding").alias("qvec"))

  private def knn(s: SparkSession, dir: String, qid: Long,
      labelFilter: Option[Int]): DataFrame = {
    val base = Tables.embeddings(s, dir)
    val filtered = labelFilter.fold(base)(l => base.filter(col("label") === l))
    filtered
      .crossJoin(broadcast(queryVec(s, dir, qid)))
      .select(col("vec_id"), col("label"),
        round(cosine_distance(col("embedding"), col("qvec")), 6).alias("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(K)
  }

  private def knnOracle(qid: Long, where: String): String =
    s"""SELECT e.vec_id, e.label,
       |  round(1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                   CAST(q.qvec AS DOUBLE[])), 6) AS dist
       |FROM embeddings e
       |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = $qid) q
       |$where
       |ORDER BY dist, e.vec_id LIMIT $K""".stripMargin

  val qs: Seq[Q] = Seq(
    // A8: search by image — query embedding of an indexed photo
    Q("q_knn_image", knnOracle(0, ""))((s, d) => knn(s, d, 0, None)),
    // A9: search by text — distinct query vector, same plan
    Q("q_knn_text", knnOracle(7, ""))((s, d) => knn(s, d, 7, None)),
    // A10: aspect-filtered search (`where={"aspect_name": a}`) — the
    // filter is applied BEFORE distance math and pushed to parquet
    Q("q_knn_filtered", knnOracle(0, "WHERE e.label = 1"))(
      (s, d) => knn(s, d, 0, Some(1))),
  )
}
