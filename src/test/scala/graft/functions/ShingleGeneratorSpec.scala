package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CharShingles Generator vs the built-in explode(transform(...))
  * composition: same rows, same order keys — plus the edge semantics
  * (null / too-short input → zero rows, not nulls). */
class ShingleGeneratorSpec extends SparkTestBase {

  test("char_shingles matches the HOF composition on real text") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "sliding window"), (2L, "abc"), (3L, "ab"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val viaGen = df.select(col("id"), expr("char_shingles(t, 3)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaHof = df.filter(col("t").isNotNull && length(col("t")) >= 3)
      .select(col("id"), posexplode(
        expr("transform(sequence(1, length(t) - 2), i -> substr(t, i, 3))")))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaGen === viaHof)
    assert(viaGen.count(_._1 == 2L) === 1) // "abc" → exactly one gram
    assert(!viaGen.exists(_._1 == 3L))     // too short → zero rows
    assert(!viaGen.exists(_._1 == 4L))     // null → zero rows
  }

  test("char_shingles works from SQL text via the registry") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT pos, gram FROM (SELECT char_shingles('abcd', 2) FROM range(1))")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((1, "ab"), (2, "bc"), (3, "cd")))
  }
}
