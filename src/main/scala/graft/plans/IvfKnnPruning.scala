package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.{CosineDistance, L2Distance}

/** The optional ANN rewrite from SURVEY §4: a logical optimizer rule
  * that turns an EXACT top-k —
  *
  *   ORDER BY cosine_distance(embedding, <literal query vector>) LIMIT k
  *   (or l2_distance — probe cells are ranked under the QUERY's metric)
  *
  * over an [[IvfIndex]]-registered table into a probe-pruned scan:
  * a `ivf_cell IN (<nearest probe cells>)` filter is planted directly
  * above the relation, and because `ivf_cell` is the table's
  * PARTITION column, the filter becomes partition pruning — the scan
  * reads probes/cells of the data. The query text stays the naive
  * exact search (exactly how the reference's callers use the HNSW
  * collection without knowing it, photo_vector_search.py:167-176);
  * registration is the explicit opt-in to approximate recall.
  *
  * Scope guards (the rule must never touch anything else):
  *  - only fires on GlobalLimit ∘ LocalLimit ∘ global Sort whose
  *    primary key contains a CosineDistance or L2Distance against an
  *    array literal;
  *  - only when the subtree scans exactly one catalog table that has
  *    an `ivf_cell` column AND is registered in IvfIndex;
  *  - idempotent: skips subtrees already carrying an ivf_cell filter
  *    (the optimizer batch runs to fixpoint).
  */
case class IvfKnnPruning(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(IntegerLiteral(_),
        ll @ LocalLimit(_, sort @ Sort(orders, true, _, _))) if orders.nonEmpty =>
      rewrite(sort).map(ns => gl.copy(child = ll.copy(child = ns))).getOrElse(gl)
  }

  private def rewrite(sort: Sort): Option[Sort] = {
    val alreadyPruned = sort.child.exists {
      case Filter(cond, _) => cond.references.exists(_.name == "ivf_cell")
      case _ => false
    }
    if (alreadyPruned) return None

    for {
      dist <- distanceExpr(sort)
      (kernel, metric) <- dist.collectFirst {
        case c: CosineDistance => (c: Expression, IvfIndex.Cosine: IvfIndex.Metric)
        case l: L2Distance => (l: Expression, IvfIndex.L2: IvfIndex.Metric)
      }
      query <- literalVector(kernel)
      rel <- sort.child.collectFirst {
        case lr: LogicalRelation
            if lr.catalogTable.isDefined &&
              lr.output.exists(_.name == "ivf_cell") => lr
      }
      entry <- IvfIndex.lookup(rel.catalogTable.get.identifier.table)
    } yield {
      val cell = rel.output.find(_.name == "ivf_cell").get
      val probes = IvfIndex.probeCells(entry, query, metric)
      val pruned = sort.child.transformUp {
        case r: LogicalRelation if r eq rel =>
          Filter(In(cell, probes.map(Literal(_))), r)
      }
      sort.copy(child = pruned)
    }
  }

  /** The sort key's defining expression, chasing one Project alias. */
  private def distanceExpr(sort: Sort): Option[Expression] =
    sort.order.head.child match {
      case a: Attribute =>
        sort.child.collectFirst {
          case Project(list, _) => list.collectFirst {
            case al: Alias if al.exprId == a.exprId => al.child
          }
        }.flatten
      case e => Some(e)
    }

  private def literalVector(cd: Expression): Option[Array[Double]] =
    cd.collectFirst {
      case Literal(a: ArrayData, ArrayType(DoubleType, _)) => a.toDoubleArray()
      case Literal(a: ArrayData, ArrayType(FloatType, _)) =>
        a.toFloatArray().map(_.toDouble)
    }
}
