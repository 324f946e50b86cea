package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: per-group top-k neighbor list under the
  * (cos DESC, d2 ASC) total order, distinct by d2 — the in-stage
  * reduction of the clustered tf-idf top-k route. The banded
  * candidate join's output NEVER crosses an exchange as pair rows:
  * each map partition folds its join stream straight into ≤k-entry
  * buffers, so the shuffle carries n·partitions·k tuples instead of
  * the pair set (the 100× fixture's replica-index cliques are
  * 5 000-member — ~1.2·10⁹ true pairs; the distinct+window form
  * spilled the box's disk twice before this existed).
  *
  * Semantics match `row_number() OVER (PARTITION BY d1 ORDER BY cos
  * DESC, d2) <= k` exactly: the buffer is kept sorted by that order,
  * and a d2 already present is skipped (band-duplicate candidates
  * carry an identical deterministic cos, so keep-first equals
  * keep-any; the window form deduplicates earlier, at the pair
  * `distinct()`). Merge is the same ordered insert, so partial
  * aggregation is partition-order-invariant.
  *
  * Buffer: parallel arrays (cos, d2, nsh) of length ≤ k — tiny,
  * cheap to serialize, and the common reject path (candidate worse
  * than the current k-th) touches only the last slot.
  */
class TopKNeighborsAggregator(k: Int)
    extends Aggregator[(Long, Long, Double),
      (Array[Double], Array[Long], Array[Long]),
      Seq[(Long, Long, Double)]] {
  require(k >= 1, s"top-k k must be >= 1, got $k")

  override def zero: (Array[Double], Array[Long], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray, Array.emptyLongArray)

  /** (cos a, d2 a) strictly better than (cos b, d2 b)? */
  private def better(ca: Double, da: Long, cb: Double, db: Long): Boolean =
    ca > cb || (ca == cb && da < db)

  private def insert(b: (Array[Double], Array[Long], Array[Long]),
      d2: Long, nsh: Long, cos: Double)
      : (Array[Double], Array[Long], Array[Long]) = {
    val (cs, ds, ns) = b
    val n = cs.length
    // Fast reject: full buffer and not better than the k-th.
    if (n == k && !better(cos, d2, cs(n - 1), ds(n - 1))) return b
    var pos = 0
    while (pos < n && !better(cos, d2, cs(pos), ds(pos))) {
      if (ds(pos) == d2) return b // band duplicate: identical cos
      pos += 1
    }
    // Duplicates can only sort at the same (cos, d2) slot, checked
    // above; anything after `pos` is strictly worse so d2 cannot
    // reappear there with the same cos, and a DIFFERENT cos for the
    // same pair is impossible (deterministic kernel).
    val m = math.min(n + 1, k)
    val nc = new Array[Double](m); val nd = new Array[Long](m)
    val nn = new Array[Long](m)
    var i = 0
    while (i < pos) { nc(i) = cs(i); nd(i) = ds(i); nn(i) = ns(i); i += 1 }
    nc(pos) = cos; nd(pos) = d2; nn(pos) = nsh
    i = pos
    while (i + 1 < m) { nc(i + 1) = cs(i); nd(i + 1) = ds(i); nn(i + 1) = ns(i); i += 1 }
    (nc, nd, nn)
  }

  override def reduce(b: (Array[Double], Array[Long], Array[Long]),
      in: (Long, Long, Double)): (Array[Double], Array[Long], Array[Long]) =
    insert(b, in._1, in._2, in._3)

  override def merge(x: (Array[Double], Array[Long], Array[Long]),
      y: (Array[Double], Array[Long], Array[Long]))
      : (Array[Double], Array[Long], Array[Long]) = {
    var acc = x
    var i = 0
    while (i < y._1.length) {
      acc = insert(acc, y._2(i), y._3(i), y._1(i))
      i += 1
    }
    acc
  }

  override def finish(b: (Array[Double], Array[Long], Array[Long]))
      : Seq[(Long, Long, Double)] =
    b._1.indices.map(i => (b._2(i), b._3(i), b._1(i)))

  override def bufferEncoder
      : Encoder[(Array[Double], Array[Long], Array[Long])] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long, Double)]] =
    ExpressionEncoder()
}
