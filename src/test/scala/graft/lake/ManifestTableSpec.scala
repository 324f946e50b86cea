package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The commit protocol's three claims: versions advance one commit at
  * a time; concurrent writers serialize (both effects land — no lost
  * update); a reader at any instant sees a complete snapshot, never a
  * half-applied commit. */
class ManifestTableSpec extends SparkTestBase {

  private def freshRoot() =
    Files.createTempDirectory("graft_mtable_spec_").toString

  test("create + commit + read round-trips and versions advance") {
    val s = spark
    import s.implicits._
    val t = ManifestTable.create(s, freshRoot(),
      (1 to 10).map(i => (i.toLong, i * 2)).toDF("id", "x"))
    assert(t.currentVersion() == 1)
    t.commit(_.withColumn("x", col("x") + 1))
    assert(t.currentVersion() == 2)
    val v3 = t.commit(_.filter(col("id") <= 5))
    assert(v3 == 3)
    val rows = t.read().orderBy("id").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(1)).toSeq == Seq(3, 5, 7, 9, 11))
    // Time travel: every committed snapshot remains readable.
    assert(t.readAt(1).count() == 10)
    assert(t.readAt(2).count() == 10)
  }

  test("concurrent writers serialize: both effects land, no lost update") {
    val s = spark
    import s.implicits._
    val t = ManifestTable.create(s, freshRoot(),
      (1 to 100).map(i => (i.toLong, 0L, 0L)).toDF("id", "a", "b"))
    // Two writers mutate DIFFERENT columns; a lost update would zero
    // one of them. A shared start-gate maximizes the race window.
    val gate = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val wa = Future { gate.await(); t.commit(_.withColumn("a", col("a") + 1)) }
    val wb = Future { gate.await(); t.commit(_.withColumn("b", col("b") + 7)) }
    gate.countDown()
    val va = Await.result(wa, 120.seconds)
    val vb = Await.result(wb, 120.seconds)
    assert(Set(va, vb) == Set(2, 3), s"versions $va,$vb")
    val agg = t.read().agg(sum("a"), sum("b")).collect().head
    assert(agg.getLong(0) == 100L && agg.getLong(1) == 700L,
      s"lost update: ${agg.mkString(",")}")
  }

  test("a racing reader only ever sees complete snapshots") {
    val s = spark
    import s.implicits._
    val n = 50
    val t = ManifestTable.create(s, freshRoot(),
      (1 to n).map(i => (i.toLong, 0)).toDF("id", "gen"))
    // Writer: 5 commits, each rewriting EVERY row's gen to the commit
    // number. A torn read would mix gens or change the row count.
    @volatile var done = false
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val writer = Future {
      (1 to 5).foreach(g => t.commit(_.withColumn("gen", lit(g))))
      done = true
    }
    var snapshots = 0
    while (!done) {
      val rows = t.read().groupBy("gen").agg(count(lit(1)).as("c")).collect()
      assert(rows.length == 1, s"torn read: mixed gens ${rows.mkString(";")}")
      assert(rows.head.getLong(1) == n.toLong,
        s"torn read: ${rows.head.getLong(1)} of $n rows")
      snapshots += 1
    }
    Await.result(writer, 120.seconds)
    assert(t.read().select(max("gen")).collect().head.getInt(0) == 5)
    assert(snapshots > 0)
  }
}
