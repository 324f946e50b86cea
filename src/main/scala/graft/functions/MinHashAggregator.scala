package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-UNION aggregator: folds raw 28-bit shingle hashes
  * into a 32-permutation minhash signature in ONE pass — the sketch
  * is built AND merged inside the aggregation, never materialized
  * per row. This is the custom-sketch UDAF SURVEY §2C's UDAF note
  * reserved ("TypedImperativeAggregate only if we add custom
  * sketches — MinHash unions"): signature union is elementwise min,
  * which is associative and commutative, so partial aggregation
  * (map-side combine) applies and the shuffle carries one 32-long
  * buffer per group instead of the group's shingles — the property
  * that makes corpus-level sketch profiles cheap at 100 TB.
  *
  * Hash family = DedupStages.aCoef/bCoef mod P: the SAME family the
  * LSH dedup queries and their DuckDB oracles use, so signatures are
  * engine-portable and the profile query is exact-hash-oracled
  * (reference analog: the store-wide description statistics a
  * curator would keep, photo_vector_search.py:128-140).
  */
class MinHashUnionAggregator
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  import graft.queries.DedupStages.{aCoef, bCoef, P}

  private val N = 32
  private val as = Array.tabulate(N)(aCoef)
  private val bs = Array.tabulate(N)(bCoef)

  def zero: Array[Long] = Array.fill(N)(Long.MaxValue)

  def reduce(buf: Array[Long], hs: Seq[Long]): Array[Long] = {
    val it = hs.iterator
    while (it.hasNext) {
      val h = it.next()
      var i = 0
      while (i < N) {
        val v = (as(i) * h + bs(i)) % P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < N) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
