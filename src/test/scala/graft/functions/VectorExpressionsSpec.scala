package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Unit fixtures for the codegen vector kernels: hand-computed 2-4
  * dim values, edge cases (nulls, empty, zero-norm, mismatched
  * lengths), codegen-vs-interpreted parity, and kernel-vs-HOF parity
  * (the higher-order formulations in GraftFunctions are the
  * independent reference implementation). */
class VectorExpressionsSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def df1(a: Seq[java.lang.Double], b: Seq[java.lang.Double]) = {
    val s = spark
    import s.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  private def evalBoth(a: Seq[java.lang.Double], b: Seq[java.lang.Double],
      exprSql: String): (Double, Double) = {
    val base = df1(a, b)
    val codegen = base.selectExpr(exprSql).head.getDouble(0)
    // Force the interpreted path: no whole-stage codegen and
    // interpreted expression evaluation.
    val conf = spark.conf
    val ws = conf.get("spark.sql.codegen.wholeStage", "true")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try base.selectExpr(exprSql).head.getDouble(0)
      finally {
        conf.set("spark.sql.codegen.wholeStage", ws)
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    (codegen, interpreted)
  }

  private def d(xs: Double*): Seq[java.lang.Double] = xs.map(Double.box)

  test("dot product: hand-computed, codegen == interpreted") {
    val (c, i) = evalBoth(d(1, 2), d(3, 4), "dot_product(a, b)")
    assert(c === 11.0); assert(i === 11.0)
  }

  test("l2 norm and l2 distance: 3-4-5 triangle") {
    val base = df1(d(3, 4), d(0, 0))
    assert(base.selectExpr("l2_norm(a)").head.getDouble(0) === 5.0)
    assert(base.selectExpr("l2_distance(a, b)").head.getDouble(0) === 5.0)
  }

  test("cosine distance: orthogonal = 1, identical = 0, opposite = 2") {
    assert(evalBoth(d(1, 0), d(0, 1), "cosine_distance(a, b)")._1 === 1.0)
    assert(math.abs(evalBoth(d(0.3, 0.4), d(0.3, 0.4),
      "cosine_distance(a, b)")._1) < 1e-12)
    assert(math.abs(evalBoth(d(1, 2), d(-1, -2),
      "cosine_distance(a, b)")._1 - 2.0) < 1e-12)
  }

  test("zero-norm vector yields NaN distance (matches DuckDB)") {
    val (c, i) = evalBoth(d(0, 0), d(1, 2), "cosine_distance(a, b)")
    assert(c.isNaN); assert(i.isNaN)
  }

  test("null elements are treated as 0.0") {
    val (c, _) = evalBoth(Seq(Double.box(1.0), null), d(5, 7), "dot_product(a, b)")
    assert(c === 5.0)
  }

  test("mismatched lengths use the common prefix") {
    val (c, i) = evalBoth(d(1, 2, 3), d(10, 20), "dot_product(a, b)")
    assert(c === 50.0); assert(i === 50.0)
  }

  test("null array input yields null output (nullIntolerant)") {
    val s = spark
    import s.implicits._
    val base = Seq((Option.empty[Seq[Double]], Option(Seq(1.0, 2.0))))
      .toDF("a", "b")
    assert(base.selectExpr("dot_product(a, b)").head.isNullAt(0))
  }

  test("kernel == HOF fallback on random vectors (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((Seq.fill(16)(rnd.nextDouble() - 0.5),
      Seq.fill(16)(rnd.nextDouble() - 0.5)))
    val base = rows.toDF("a", "b")
    val got = base.select(
      GraftFunctions.dot_product(col("a"), col("b")).as("k"),
      GraftFunctions.dotProductHof(col("a"), col("b")).as("h"),
      GraftFunctions.cosine_distance(col("a"), col("b")).as("ck"),
      GraftFunctions.cosineDistanceHof(col("a"), col("b")).as("ch"),
      GraftFunctions.l2_norm(col("a")).as("nk"),
      GraftFunctions.l2NormHof(col("a")).as("nh")).collect()
    got.foreach { case Row(k: Double, h: Double, ck: Double, ch: Double,
        nk: Double, nh: Double) =>
      assert(math.abs(k - h) < 1e-12)
      assert(math.abs(ck - ch) < 1e-12)
      assert(math.abs(nk - nh) < 1e-12)
    }
  }

  test("sq_l2_distance: hand-computed, codegen == interpreted") {
    // (3-0)² + (4-0)² = 25 — the 3-4-5 triangle squared.
    val (c, i) = evalBoth(d(3, 4), d(0, 0), "sq_l2_distance(a, b)")
    assert(c === 25.0); assert(i === 25.0)
  }

  test("sq_l2_distance is BIT-identical to the HOF fold it replaced") {
    // The kernel's claim (used by q_lof/q_dbscan's 6dp-rounded d²) is
    // the exact left-to-right (x-y)*(x-y) accumulation of the
    // aggregate(zip_with(...)) fold — assert EXACT equality, not an
    // epsilon, on random vectors.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)((Seq.fill(64)(rnd.nextDouble() * 10 - 5),
      Seq.fill(64)(rnd.nextDouble() * 10 - 5)))
    val base = rows.toDF("a", "b")
    base.select(
      GraftFunctions.sq_l2_distance(col("a"), col("b")).as("k"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
        "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)").as("h"))
      .collect().foreach { case Row(k: Double, h: Double) =>
        assert(k == h, s"kernel $k != fold $h")
      }
  }

  test("sorted_intersect_count == size(array_intersect) on sorted distinct " +
    "arrays, codegen == interpreted") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    // Random sorted distinct long sets of varying sizes incl. empty
    // and disjoint — the exact shapes the dedup verify stage feeds.
    val rows = Seq.fill(200)((
      rnd.shuffle((0L to 400L).toList).take(rnd.nextInt(60)).sorted,
      rnd.shuffle((0L to 400L).toList).take(rnd.nextInt(60)).sorted))
    val base = rows.toDF("a", "b")
    base.selectExpr("sorted_intersect_count(a, b) AS k",
      "CAST(size(array_intersect(a, b)) AS BIGINT) AS r")
      .collect().foreach { case Row(k: Long, r: Long) =>
        assert(k === r, s"merge walk $k != array_intersect $r")
      }
    // Interpreted parity on one fixture.
    val one = Seq((Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)))
      .toDF("a", "b")
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try one.selectExpr("sorted_intersect_count(a, b)").head.getLong(0)
      finally {
        conf.set("spark.sql.codegen.wholeStage", "true")
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(interp === 2L)
  }

  test("first_eq_index == the HOF filter form on random signatures; " +
    "codegen == interpreted") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    // 16-slot signatures over a small value domain so agreements at
    // every position (incl. none and position 0) occur; plus a
    // length-mismatch row (min-length walk, like the merge kernels).
    val rows = Seq.fill(300)((
      Seq.fill(16)(rnd.nextInt(6).toLong),
      Seq.fill(16)(rnd.nextInt(6).toLong))) :+
      (Seq(7L, 8L), Seq(9L, 8L, 7L))
    val base = rows.toDF("a", "b")
    base.selectExpr("first_eq_index(a, b) AS k",
      "CAST(coalesce(try_element_at(filter(sequence(0, CAST(least(size(a), " +
        "size(b)) AS INT) - 1), i -> element_at(a, CAST(i AS INT) + 1) = " +
        "element_at(b, CAST(i AS INT) + 1)), 1), -1) AS INT) AS r")
      .collect().foreach { case Row(k: Int, r: Int) =>
        assert(k === r, s"kernel $k != HOF $r")
      }
    val one = Seq((Seq(5L, 1L, 9L), Seq(4L, 1L, 9L))).toDF("a", "b")
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try one.selectExpr("first_eq_index(a, b)").head.getInt(0)
      finally {
        conf.set("spark.sql.codegen.wholeStage", "true")
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(interp === 1)
  }

  test("sorted_intersect_count == size(array_intersect) on sorted arrays " +
    "WITH duplicates (set semantics, not pairwise)") {
    val s = spark
    import s.implicits._
    // The round-11 advice counterexample first: [5,5] ∩ [5,5] must be
    // 1 (array_intersect dedups), not 2 (pairwise).
    val pinned = Seq(
      (Seq(5L, 5L), Seq(5L, 5L)),
      (Seq(1L, 1L, 2L, 2L, 2L, 3L), Seq(2L, 2L, 3L, 3L, 4L)),
      (Seq(7L, 7L, 7L), Seq(7L)),
      (Seq.empty[Long], Seq(1L, 1L)))
    val rnd = new scala.util.Random(29)
    // Random sorted multisets: small value domain forces heavy
    // duplication on both sides.
    val fuzz = Seq.fill(300)((
      Seq.fill(rnd.nextInt(40))(rnd.nextLong(12)).sorted,
      Seq.fill(rnd.nextInt(40))(rnd.nextLong(12)).sorted))
    (pinned ++ fuzz).toDF("a", "b")
      .selectExpr("sorted_intersect_count(a, b) AS k",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS r")
      .collect().foreach { case Row(k: Long, r: Long) =>
        assert(k === r, s"merge walk $k != array_intersect $r")
      }
    // Interpreted path covers the duplicate-run skip too.
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try Seq((Seq(5L, 5L), Seq(5L, 5L))).toDF("a", "b")
        .selectExpr("sorted_intersect_count(a, b)").head.getLong(0)
      finally {
        conf.set("spark.sql.codegen.wholeStage", "true")
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(interp === 1L)
  }

  test("distance properties: symmetric, in [0, 2], d(x,x) ~ 0") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((Seq.fill(8)(rnd.nextDouble() - 0.5),
      Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val base = rows.toDF("a", "b")
    base.select(
      GraftFunctions.cosine_distance(col("a"), col("b")).as("ab"),
      GraftFunctions.cosine_distance(col("b"), col("a")).as("ba"),
      GraftFunctions.cosine_distance(col("a"), col("a")).as("aa"))
      .collect().foreach { case Row(ab: Double, ba: Double, aa: Double) =>
        assert(ab === ba)
        assert(ab >= 0.0 && ab <= 2.0 + 1e-12)
        assert(math.abs(aa) < 1e-12)
      }
  }

  test("sorted_dot_stats reproduces the posting-join DECIMAL(38,12) dot " +
    "bit-for-bit; codegen == interpreted") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    // Random sparse vectors in the tf-idf shape: sorted distinct long
    // keys, weights in the w = tf*idf range (incl. tiny and ~170, the
    // documented product bound), varying overlap incl. disjoint/empty.
    val rows = (0 until 200).map { i =>
      def mk(): (Seq[Long], Seq[Double]) = {
        val ks = rnd.shuffle((0L to 150L).toList).take(rnd.nextInt(40)).sorted
        (ks, ks.map(_ => (rnd.nextDouble() * 13.0 + 1e-9) *
          (if (rnd.nextInt(10) == 0) 13.0 else 0.05)))
      }
      val (ka, wa) = mk(); val (kb, wb) = mk()
      (i.toLong, ka, wa, kb, wb)
    }
    val base = rows.toDF("id", "ka", "wa", "kb", "wb")
      .localCheckpoint(eager = true)
    val kernel = base.selectExpr("id",
      "sorted_dot_stats(ka, wa, kb, wb) AS st")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // Truth: the EXACT expression of the flat tf-idf plan — explode
    // both sides to (key, w) postings, equi-join on key, then
    // sum(CAST(round(wa*wb,12) AS DECIMAL(38,12))) cast to double.
    val ea = base.selectExpr("id",
      "inline(arrays_zip(ka, wa)) AS (k, x)")
    val eb = base.selectExpr("id AS id2",
      "inline(arrays_zip(kb, wb)) AS (k2, y)")
    val truth = ea.join(eb,
        ea("id") === eb("id2") && ea("k") === eb("k2"))
      .groupBy("id")
      .agg(
        expr("CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE)")
          .as("dp"),
        count(lit(1)).cast("double").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { case (id, _, _, _, _) =>
      val st = kernel(id)
      val (dp, n) = truth.getOrElse(id, (0.0, 0.0))
      assert(st(0) === dp, s"row $id: kernel dp ${st(0)} != decimal sum $dp")
      assert(st(1) === n, s"row $id: kernel count ${st(1)} != join count $n")
    }
    assert(truth.values.exists(_._2 > 0), "fixture must produce overlaps")
    // Boundary-targeted products: the round12Scaled fast path must
    // hand exact x.5e-12 ties and near-tie products to the canonical
    // BigDecimal path — pin a batch of them against the same SQL
    // truth (wa = 1.0 makes the product the literal value).
    val ties = Seq(0.5e-12, 1.5e-12, 2.5e-12, 1234.5e-12,
      0.1 + 0.5e-12, 7.0000000000005e-3, 0.9999999999995,
      5.0e-13 + 1e-25, 2.4999999999999e-12, 169.0000000000005)
    val tieRows = ties.zipWithIndex.map { case (v, i) =>
      (1000L + i, Seq(1L), Seq(1.0), Seq(1L), Seq(v))
    }
    val tieBase = tieRows.toDF("id", "ka", "wa", "kb", "wb")
    val tieKernel = tieBase
      .selectExpr("id", "sorted_dot_stats(ka, wa, kb, wb)[0] AS dp")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tieTruth = tieBase
      .selectExpr("id",
        "CAST(CAST(round(wa[0] * wb[0], 12) AS DECIMAL(38,12)) AS DOUBLE) AS dp")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    tieRows.foreach { case (id, _, _, _, wb) =>
      assert(tieKernel(id) === tieTruth(id),
        s"boundary product ${wb.head}: kernel ${tieKernel(id)} != " +
          s"round/decimal ${tieTruth(id)}")
    }
    // Interpreted parity on one fixture (kernel walk is shared code,
    // but the codegen wrapper path must agree too).
    val one = Seq((Seq(1L, 3L, 9L), Seq(0.5, 2.0, 13.0),
      Seq(3L, 9L, 11L), Seq(4.0, 0.125, 7.0))).toDF("ka", "wa", "kb", "wb")
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try one.selectExpr("sorted_dot_stats(ka, wa, kb, wb)")
        .head.getSeq[Double](0)
      finally {
        conf.set("spark.sql.codegen.wholeStage", "true")
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(interp === Seq(2.0 * 4.0 + 13.0 * 0.125, 2.0))
  }
}
