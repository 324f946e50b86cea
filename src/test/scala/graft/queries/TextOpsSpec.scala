package graft.queries

import graft.SparkTestBase
import graft.ml.Embedders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Properties of the text/dedup building blocks (SURVEY §5.3). */
class TextOpsSpec extends SparkTestBase {

  test("Scala h28 == SQL h28 (the cross-engine hash contract)") {
    val samples = Seq("hello", "a#0", "", "the quick brown fox", "row scan 42")
    samples.foreach { x =>
      val sql = spark.sql(
        s"SELECT ${TextKit.h28(s"'${x.replace("'", "''")}'")}").head.getLong(0)
      assert(sql === Embedders.h28(x), s"for input '$x'")
    }
  }

  test("tokenizer drops empties and lowercases") {
    val s = spark
    import s.implicits._
    val out = Seq("A  b  C").toDF("text")
      .select(expr(TextKit.toks).as("w")).head.getSeq[String](0)
    assert(out === Seq("a", "b", "c"))
  }

  test("exact dedup is idempotent and keeps the first writer") {
    val s = spark
    import s.implicits._
    def dedup(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("h").orderBy("id")
      df.withColumn("h", md5(col("text").cast("binary")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("h", "rn")
    }
    val base = Seq((3L, "x"), (1L, "x"), (2L, "y"), (9L, "y"), (5L, "z"))
      .toDF("id", "text")
    val once = dedup(base).collect().toSet
    val twice = dedup(dedup(base)).collect().toSet
    assert(once === twice)
    assert(once.map(r => (r.getLong(0), r.getString(1))) ===
      Set((1L, "x"), (2L, "y"), (5L, "z")))
  }

  test("jaccard expr: bounds, symmetry, self = 1 (seeded random sets)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def randSet() = rnd.shuffle(alphabet).take(1 + rnd.nextInt(7))
    val rows = Seq.fill(200)((randSet(), randSet()))
    rows.toDF("s1", "s2")
      .select(expr(TextKit.jaccard("s1", "s2")).as("ab"),
        expr(TextKit.jaccard("s2", "s1")).as("ba"),
        expr(TextKit.jaccard("s1", "s1")).as("aa"))
      .collect().foreach { r =>
        val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(ab >= 0.0 && ab <= 1.0)
        assert(ab === ba)
        assert(aa === 1.0)
      }
  }

  test("word-trigram shingles of identical texts are identical; count = tokens - 2") {
    val s = spark
    import s.implicits._
    val df = Seq("one two three four five").toDF("text")
      .withColumn("w", expr(TextKit.toks))
      .select(expr(TextKit.shingles3("w")).as("sh"))
    val sh = df.head.getSeq[String](0)
    assert(sh === Seq("one two three", "two three four", "three four five"))
  }

  test("minhash collision estimates jaccard: identical sets share all seeds") {
    // Universal-family minhash over two identical shingle sets must
    // produce identical signatures (the LSH banding's soundness base).
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Seq("aa", "bb", "cc")), (2L, Seq("aa", "bb", "cc")),
      (3L, Seq("xx", "yy", "zz"))).toDF("doc_id", "s")
    val ex = docs.select(col("doc_id"), explode(col("s")).as("sh"))
      .select(col("doc_id"), expr(TextKit.h28("sh")).as("h0"))
    val seeds = spark.range(8).toDF("seed").select(col("seed"),
      (expr(TextKit.h28("concat('a#', seed)")) * 2 + 1).as("a"),
      expr(TextKit.h28("concat('b#', seed)")).as("b"))
    val mh = ex.crossJoin(seeds)
      .select(col("doc_id"), col("seed"),
        ((col("a") * col("h0") + col("b")) % 2147483647L).as("hv"))
      .groupBy("doc_id", "seed").agg(min("hv").as("mh"))
    val sigs = mh.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("seed"), col("mh")))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("top-k is a prefix of the full sort (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(500)(i => (i.toLong, rnd.nextDouble()))
    val df = rows.toDF("id", "v")
    val full = df.orderBy(col("v"), col("id")).collect().map(_.getLong(0))
    val topk = df.orderBy(col("v"), col("id")).limit(10).collect().map(_.getLong(0))
    assert(topk.toSeq === full.take(10).toSeq)
  }

  test("upsert latest-wins is permutation-invariant (seeded shuffles)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(60)(i =>
      (i % 7L, s"t${i % 3}", i.toLong, 1000L + rnd.nextInt(100)))
    def latest(data: Seq[(Long, String, Long, Long)]) = {
      val w = Window.partitionBy("k1", "k2")
        .orderBy(col("ts").desc, col("id").desc)
      data.toDF("k1", "k2", "id", "ts")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn").collect().map(_.toSeq).toSet
    }
    val expected = latest(rows)
    (1 to 3).foreach { _ => assert(latest(rnd.shuffle(rows)) === expected) }
  }
}
