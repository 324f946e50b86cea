package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Round-14 additions: independent recomputation of q_ppr — a
  * reference personalized-PageRank on the driver from the raw edge
  * list, with the SAME fixed-point discipline the distributed loop
  * declares (per-edge terms rounded 12dp into exact decimal sums,
  * one shared damp+teleport double expression) so the comparison is
  * exact, not tolerance-based. */
class Round14OpsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("ppr: equals a reference driver-side personalized PageRank " +
    "(same rounding discipline), mass concentrates at the seed") {
    assume(new java.io.File(s"$sf/lineitem.parquet").exists())
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Seq[(String, String)] = li.toSeq.flatMap { case (p, su) =>
      Seq((s"p$p", s"s$su"), (s"s$su", s"p$p"))
    }
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val seed = "p" + li.map(_._1).min
    def rnd12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = Map(seed -> 1.0)
    for (_ <- 1 to 4) {
      val m = scala.collection.mutable.Map.empty[String, BigDecimal]
      edges.foreach { case (src, dst) =>
        r.get(src).foreach { rv =>
          val term = BigDecimal(rnd12(rv / deg(src)))
          m.update(dst, m.getOrElse(dst, BigDecimal(0)) + term)
        }
      }
      val nodes = m.keySet + seed
      r = nodes.map { n =>
        val tp = if (n == seed) 0.15 else 0.0
        n -> rnd12(0.85 * m.getOrElse(n, BigDecimal(0)).toDouble + tp)
      }.toMap
    }
    val expect = r.toSeq.filter(_._2 > 0)
      .sortBy { case (n, rv) => (-rv, n) }.take(50)
    val got = SparkEntry.queries("q_ppr")(spark, sf).collect()
      .map(row => (row.getString(0), row.getDouble(1))).toSeq
    assert(got === expect,
      s"distributed PPR diverges from the reference: got head " +
        s"${got.take(3)}, expected head ${expect.take(3)}")
    // Restart mass makes the seed the top-ranked node of its own walk
    // (the property global PageRank does NOT have).
    assert(got.head._1 === seed, s"seed $seed must rank first")
    // The walk stays a sub-probability mass (teleport loses mass to
    // the damp factor when the frontier is sparse) — sanity-bound it.
    val total = got.map(_._2).sum
    assert(total > 0.1 && total <= 1.000001, s"mass out of range: $total")
  }
}
