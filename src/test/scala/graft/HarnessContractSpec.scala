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
