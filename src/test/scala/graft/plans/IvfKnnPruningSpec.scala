package graft.plans

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.catalyst.plans.logical.Filter

/** The ANN rewrite must actually FIRE (the DuckDB oracle can't tell:
  * for this query vector the probed cells happen to contain the true
  * top-5, so pruned and unpruned results coincide). */
class IvfKnnPruningSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("naive exact top-k over a registered IVF table gets probe-pruned") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val df = SparkEntry.queries("q_knn_ivf_rule")(spark, sf)
    val fired = df.queryExecution.optimizedPlan.exists {
      case f: Filter => f.condition.references.exists(_.name == "ivf_cell")
      case _ => false
    }
    assert(fired, "IvfKnnPruning did not inject the probe-cell filter:\n" +
      df.queryExecution.optimizedPlan)
    // And the scan itself is partition-pruned (ivf_cell is the
    // table's partition column).
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PartitionFilters: [ivf_cell"), phys)
    // Rows must equal the explicit IVF formulation.
    val explicit = SparkEntry.queries("q_knn_ivf")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq === explicit)
  }

  test("the rule leaves unregistered tables and non-knn sorts alone") {
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val plain = SparkEntry.queries("q_knn_image")(spark, sf)
    val touched = plain.queryExecution.optimizedPlan.exists {
      case f: Filter => f.condition.references.exists(_.name == "ivf_cell")
      case _ => false
    }
    assert(!touched)
    assert(plain.collect().length === 5)
  }
}
