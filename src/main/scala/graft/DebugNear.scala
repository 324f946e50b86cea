package graft

import org.apache.spark.sql.functions._
import graft.queries._
import graft.queries.TextKit._

/** Scratch stage-by-stage timing for q_dedup_near (not part of the
  * driver contract; kept for plan-tuning evidence). */
object DebugNear {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[near] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val sh = fanout(Tables.documents(s, d))
      .withColumn("w", expr(toks))
      .select(col("doc_id"), expr(shingles3("w")).as("s"))
      .filter(size(col("s")) > 0)
      .withColumn("n", size(col("s")))
    time("warmup sh.count")(sh.count())
    time("sh.count again")(sh.count())
    val ex = sh.select(col("doc_id"), col("n"), explode(col("s")).as("sh"))
    time("ex.count")(ex.count())
    val freq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    time("freq.count")(freq.count())
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = ex.join(broadcast(freq), "sh")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n") - ceil(col("n") * 0.6) + 1)
      .select("doc_id", "n", "sh")
    time("prefix.count")(prefix.count())
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * 0.6 <= col("b.n") && col("b.n") * 0.6 <= col("a.n"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    time("cand.count")(cand.count())
    val hsets = sh.select(col("doc_id"),
      expr(s"array_sort(transform(s, x -> ${TextKit.h60("x")}))").as("hs"))
    time("hsets.count")(hsets.count())
    val full = cand
      .join(broadcast(hsets.select(col("doc_id").as("id1"), col("hs").as("h1"))), "id1")
      .join(broadcast(hsets.select(col("doc_id").as("id2"), col("hs").as("h2"))), "id2")
      .withColumn("jac", round(expr(jaccard("h1", "h2")), 6))
      .filter(col("jac") >= 0.6)
      .select("id1", "id2", "jac")
      .orderBy("id1", "id2")
    time("full verify")(full.write.mode("overwrite").format("noop").save())
    time("full verify again")(full.write.mode("overwrite").format("noop").save())
    s.stop()
  }
}
