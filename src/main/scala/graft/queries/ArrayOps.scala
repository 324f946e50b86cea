package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Array / higher-order-function surface over the embedding column
  * (SURVEY §2B q_array_funcs). Exercises size / element access /
  * slice / min-max / membership, plus BOTH dot-product formulations:
  * the codegen Catalyst kernel (graft.functions.DotProduct) and the
  * pure built-in higher-order fallback (aggregate ∘ zip_with). Both
  * columns must equal the oracle's `list_dot_product` — so the oracle
  * equality IS the kernel-vs-HOF cross-check, row by row. Everything
  * is scan-local: no joins, no shuffles, one projection.
  */
object ArrayOps {

  val qs: Seq[Q] = Seq(
    Q("q_array_funcs",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id,
        |  len(v) AS n,
        |  round(list_aggregate(v, 'min'), 6) AS min_e,
        |  round(list_aggregate(v, 'max'), 6) AS max_e,
        |  round(v[4], 6) AS e4,
        |  round(list_aggregate(v[9:16], 'max'), 6) AS slice_max,
        |  list_contains(v, v[1]) AS has_first,
        |  round(list_dot_product(v, v), 6) AS dot_kern,
        |  round(list_dot_product(v, v), 6) AS dot_hof,
        |  round(sqrt(list_dot_product(v, v)), 6) AS l2
        |FROM e ORDER BY vec_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"),
          size(col("v")).cast("long").as("n"),
          round(array_min(col("v")), 6).as("min_e"),
          round(array_max(col("v")), 6).as("max_e"),
          round(element_at(col("v"), 4), 6).as("e4"),
          round(array_max(slice(col("v"), 9, 8)), 6).as("slice_max"),
          array_contains(col("v"), element_at(col("v"), 1)).as("has_first"),
          round(GraftFunctions.dot_product(col("v"), col("v")), 6).as("dot_kern"),
          round(GraftFunctions.dotProductHof(col("v"), col("v")), 6).as("dot_hof"),
          round(sqrt(GraftFunctions.dot_product(col("v"), col("v"))), 6).as("l2"))
        .orderBy("vec_id")
    },
  )
}
