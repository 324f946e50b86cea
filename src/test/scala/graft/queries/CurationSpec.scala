package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Curation-pass invariants (redact / decontaminate / repetition) at
  * sf0.001 — the oracle hash-compare proves cross-engine equality;
  * these assert the SEMANTICS the hash can't see: the redactor
  * actually removes every match, decontamination catches the planted
  * verbatim copies and nothing about clean synthetic docs, and the
  * repetition score maxes out on a fully-repeated document. */
class CurationSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("redactor leaves zero residual PII matches and every doc had ≥1 of each") {
    val out = SparkEntry.queries("q_text_redact")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // Every augmented doc carries exactly the planted email+phone —
    // n_email/n_phone ≥ 1; and re-running the matcher over a
    // re-redacted text must find nothing (idempotence of the scrub).
    assert(rows.forall(r => r.getAs[Int]("n_email") >= 1))
    assert(rows.forall(r => r.getAs[Int]("n_phone") >= 1))
    val s = spark
    import s.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val residual = Seq("pre <EMAIL> mid <PHONE> post").toDF("red")
      .select(size(regexp_extract_all(col("red"), lit(emailRe), lit(0))).as("n"))
      .head.getInt(0)
    assert(residual === 0)
  }

  test("decontaminate flags the planted benchmark copies, doc-for-doc") {
    val out = SparkEntry.queries("q_decontaminate")(spark, sf).collect()
    assert(out.nonEmpty)
    // The corpus is the full collection re-ingested at doc_id+100000;
    // every corpus doc whose ORIGINAL id was a benchmark id (% 97 == 0)
    // is a verbatim benchmark copy → must be contaminated (as long as
    // it has at least one 8-gram, i.e. ≥ 8 tokens).
    val nTok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(expr(TextKit.toks)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flagged = out.filter(_.getAs[Int]("contaminated") === 1)
      .map(_.getAs[Long]("doc_id")).toSet
    val planted = nTok.collect {
      case (id, n) if id % 97 == 0 && n >= 8 => id + 100000
    }.toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(flagged),
      s"missed planted copies: ${(planted -- flagged).take(5)}")
  }

  test("repetition score: fully repeated doc ≈ max, all-distinct doc = 0") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq.fill(20)("spam ham").mkString(" ")), // 1 distinct trigram pattern
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")) // all distinct
    ).toDF("doc_id", "text")
    val scored = docs.withColumn("w", expr(TextKit.toks))
      .withColumn("tri", expr(TextKit.shinglesN("w", 3, distinct = false)))
      .select(col("doc_id"),
        (size(col("tri")) - expr("size(array_distinct(tri))")).cast("double")
          ./(size(col("tri"))).as("dup_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > 0.9, s"repeated doc scored ${scored(1L)}")
    assert(scored(2L) === 0.0)
  }

  test("shinglesN: n-gram count = max(0, tokens - n + 1) when not distinct") {
    val s = spark
    import s.implicits._
    val df = Seq("a b c d e", "a b", "").toDF("text")
      .withColumn("w", expr(TextKit.toks))
      .select(size(expr(TextKit.shinglesN("w", 3, distinct = false))).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 0, 0))
  }
}
