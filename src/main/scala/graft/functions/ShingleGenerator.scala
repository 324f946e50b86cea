package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom UDTF (Catalyst `Generator`): positional character n-grams —
  * one `(pos, gram)` output row per shingle of the input string.
  * Completes the custom UDF (VectorExpressions) / UDAF
  * (CentroidAggregator, MinHashUnionAggregator) / UDTF triple from
  * SURVEY §2C's extension-surface note.
  *
  * Why a Generator instead of `explode(transform(sequence(...)))`:
  * the built-in composition materializes the WHOLE shingle array per
  * row before exploding (peak memory O(|doc|) extra per in-flight
  * row, plus the HOF-inlining hazard documented in
  * queries/package.scala `barrier`), while a Generator streams rows
  * out of `eval` one at a time — constant per-row state, no
  * intermediate array, no barrier needed. The reference's n-gram
  * loops (its description text processing) are per-item Python; this
  * is the engine-native streaming equivalent.
  *
  * `n` must be a foldable INT literal (the schema is fixed at plan
  * time). Null/short inputs generate zero rows, matching the empty
  * comprehension on the oracle side.
  */
case class CharShingles(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("char_shingles: text must be STRING")
    else if (nExpr.dataType != IntegerType || !nExpr.foldable)
      TypeCheckResult.TypeCheckFailure("char_shingles: n must be an INT literal")
    else if (nExpr.eval(null) == null || nExpr.eval(null).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("char_shingles: n must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String]
      val len = s.numChars()
      if (len < n) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= len - n
        override def next(): InternalRow = {
          val g = s.substring(i, i + n)
          i += 1
          InternalRow(i, g) // pos is 1-based: i was just incremented
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharShingles =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
