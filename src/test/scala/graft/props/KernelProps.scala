package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ml.Embedders

/** Pure-JVM ScalaCheck properties (SURVEY §5.3) for the hash and
  * sketch algebra the SQL operators rely on — no SparkSession, so
  * these run on every `sbt test` in milliseconds. */
object KernelProps extends Properties("graft.kernels") {

  private val asciiStr = Gen.asciiPrintableStr

  property("h28 is deterministic and within 28 bits") = forAll(asciiStr) { s =>
    val h = Embedders.h28(s)
    h == Embedders.h28(s) && h >= 0L && h < (1L << 28)
  }

  property("universal rehash stays within the Mersenne modulus") =
    forAll(Gen.choose(0, 31), Gen.choose(0L, (1L << 28) - 1)) { (i, h) =>
      val a = Embedders.h28("a#" + i) * 2 + 1
      val b = Embedders.h28("b#" + i)
      val v = (a * h + b) % 2147483647L
      v >= 0L && v < 2147483647L && a * h + b > 0 // no overflow wrap
    }

  private val tokenSet = Gen.containerOf[Set, Int](Gen.choose(0, 30))

  private def jaccard(a: Set[Int], b: Set[Int]): Double =
    if (a.isEmpty && b.isEmpty) Double.NaN
    else a.intersect(b).size.toDouble / (a.size + b.size - a.intersect(b).size)

  property("jaccard ∈ [0,1], symmetric, 1 iff equal (nonempty)") =
    forAll(tokenSet, tokenSet) { (a, b) =>
      (a.isEmpty && b.isEmpty) || {
        val j = jaccard(a, b)
        j >= 0.0 && j <= 1.0 && j == jaccard(b, a) &&
          ((j == 1.0) == (a == b))
      }
    }

  property("minhash collision prob tracks containment: equal sets ⇒ equal sigs") =
    forAll(tokenSet.suchThat(_.nonEmpty)) { s =>
      def sig(set: Set[Int]): Seq[Long] = (0 until 8).map { i =>
        val a = Embedders.h28("a#" + i) * 2 + 1
        val b = Embedders.h28("b#" + i)
        set.map(x => (a * Embedders.h28("t" + x) + b) % 2147483647L).min
      }
      sig(s) == sig(s ++ s)
    }

  property("simhash 4-chunk pigeonhole: hamming ≤ 3 ⇒ some chunk equal") =
    forAll(Gen.choose(0L, (1L << 60) - 1), Gen.listOfN(3, Gen.choose(0, 59))) {
      (x, flips) =>
        val y = flips.foldLeft(x)((v, b) => v ^ (1L << b))
        val anyChunk = (0 until 4).exists(c =>
          ((x >> (15 * c)) & 32767) == ((y >> (15 * c)) & 32767))
        Prop.collect(java.lang.Long.bitCount(x ^ y))(anyChunk)
    }

  property("theta-range unit bucket covers the band") =
    forAll(Gen.choose(-200.0, 200.0), Gen.choose(0.0, 1.0 - 1e-9)) { (c, u) =>
      val v = c - 0.5 + u
      val lo = math.floor(c - 0.5)
      math.floor(v) == lo || math.floor(v) == lo + 1
    }

  private val hashSeq = Gen.containerOf[Seq, Long](Gen.choose(0L, (1L << 28) - 1))

  property("minhash union is associative/commutative and merge == reduce-all") =
    forAll(hashSeq, hashSeq, hashSeq) { (x, y, z) =>
      val agg = new graft.functions.MinHashUnionAggregator()
      def unionOf(parts: Seq[Seq[Long]]): Seq[Long] =
        agg.finish(parts.map(p => agg.reduce(agg.zero, p))
          .foldLeft(agg.zero)(agg.merge))
      // any grouping/order of partial merges yields the signature of
      // the flattened input — the property map-side combine rests on
      val whole = agg.finish(agg.reduce(agg.zero, x ++ y ++ z))
      unionOf(Seq(x, y, z)) == whole &&
        unionOf(Seq(z, x, y)) == whole &&
        unionOf(Seq(x ++ y, z)) == whole
    }
}
