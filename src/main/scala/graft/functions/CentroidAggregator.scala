package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: per-group mean embedding in ONE pass over the vectors
  * (the custom-Aggregator alternative to q_vector_centroid's
  * posexplode plan — SURVEY §2 "UDAF surface"). The shuffle carries
  * one (sums[dim], count) buffer per group per partition instead of
  * dim rows per vector.
  *
  * Determinism: each float component is quantized by
  * floor(x · 2^40) into a 64-bit integer before accumulation, so the
  * partial-aggregate merge is exact integer math — associative and
  * commutative, immune to partition order — and the DuckDB oracle
  * reproduces it bit-for-bit (`floor` is engine-stable; round-half
  * would not be, Java rounds half-up toward +∞, DuckDB away from
  * zero). 2^40 scaling is exact for f32 inputs of ordinary magnitude
  * (≤ 2^24 mantissa bits, binary exponent ≥ -16); the final mean
  * stays under 2^53 so the double read-back is exact too.
  */
class CentroidAggregator
    extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {
  private val Scale = 1099511627776d // 2^40

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  override def reduce(b: (Array[Long], Long), a: Array[Float]): (Array[Long], Long) = {
    val sums = if (b._1.length >= a.length) b._1 else {
      val g = new Array[Long](a.length)
      System.arraycopy(b._1, 0, g, 0, b._1.length)
      g
    }
    var i = 0
    while (i < a.length) {
      sums(i) += math.floor(a(i).toDouble * Scale).toLong
      i += 1
    }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
    val (small, big) = if (x._1.length <= y._1.length) (x._1, y._1) else (y._1, x._1)
    val sums = big.clone()
    var i = 0
    while (i < small.length) { sums(i) += small(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(b: (Array[Long], Long)): Array[Double] =
    b._1.map(s => (s.toDouble / Scale) / b._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}
