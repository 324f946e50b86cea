package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The driver's CORRECTNESS harness hashes SCALAR cells (pandas
  * sort-columns-then-hash) — an ArrayType/MapType/StructType output
  * column crashes the compare (round 3's only red row,
  * q_minhash_profile's ARRAY<BIGINT> signature). Every declared query
  * therefore must emit flat scalar columns; sketch/vector shapes are
  * posexploded to (key, pos, value) rows instead. This spec enforces
  * the contract for the whole registry so a new operator can't
  * reintroduce the crash. */
class HarnessContractSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def repoFile(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing from repo root")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  // Docs lockstep: SURVEY.md §2 is the declared contract and README
  // states the inventory size. These drifted from the registry three
  // rounds running (round-6 VERDICT #1), so the contract is now a red
  // build instead of a reminder.
  test("every registry key appears in SURVEY.md") {
    val survey = repoFile("SURVEY.md")
    val missing = SparkEntry.registry.map(_.name).filterNot(survey.contains)
    assert(missing.isEmpty,
      s"SURVEY.md lacks rows for registry keys: ${missing.mkString(", ")}")
  }

  test("README states the registry's actual size") {
    val expected = s"${SparkEntry.registry.size} query"
    assert(repoFile("README.md").contains(expected),
      s"README.md must contain '$expected' (registry has " +
        s"${SparkEntry.registry.size} keys)")
  }

  test("BENCH.md log reaches the current round's predecessor") {
    // Rounds are recorded as "round-N" checkpoint rows; require ≥ 6.
    val rounds = "round[ -](\\d+)".r.findAllMatchIn(repoFile("BENCH.md"))
      .map(_.group(1).toInt).toSeq
    assert(rounds.nonEmpty && rounds.max >= 6,
      s"BENCH.md checkpoint log stops at round ${rounds.maxOption.getOrElse(0)}")
  }

  test("no registry query emits a nested top-level column") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val offenders = SparkEntry.registry.flatMap { q =>
      val schema = SparkEntry.queries(q.name)(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"nested output columns break the driver's scalar hash compare:\n  " +
        offenders.mkString("\n  "))
  }
}
