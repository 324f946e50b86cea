package graft.ml

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The inference seam: surrogate determinism, float32 quantization,
  * and the real `binaryFile` source plumbing (the path q_embed_image
  * runs over an actual image directory). */
class EmbeddersSpec extends SparkTestBase {

  test("hash embedders are deterministic, bounded, and salt-separated") {
    val t = new HashTextEmbedder(64)
    val i = new HashImageEmbedder(64)
    val a = t.embed("hello world")
    assert(a.length === 64)
    assert(a.toSeq === t.embed("hello world").toSeq) // deterministic
    assert(a.forall(x => x >= -0.5f && x < 0.5f))
    assert(a.toSeq !== t.embed("hello worlds").toSeq)
    // Image tower hashes the same bytes into a different space.
    assert(i.embed("hello world".getBytes("UTF-8")).toSeq !== a.toSeq)
  }

  test("captioner grounds on metadata and tokenization") {
    val c = new TemplateCaptioner
    assert(c.describe(3, "en", "src1", "Key Agg row") ===
      "doc 3 (en, src1): 3 tokens, starts 'key'")
    assert(c.describe(0, "fr", "s", "") === "doc 0 (fr, s): 0 tokens, starts ''")
  }

  test("binaryFile source feeds the image embedder end to end") {
    val dir = Files.createTempDirectory("graft_bin_")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.png"), Array[Byte](9, 8, 7))
    Files.write(dir.resolve("skip.txt"), Array[Byte](0))
    val s = spark
    import s.implicits._
    val bin = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.png") // A1's suffix predicate (cli.py:41-42)
      .load(dir.toString)
      .select(col("path"), col("content"))
    val embedded = bin.as[(String, Array[Byte])].mapPartitions { rows =>
      val model = new HashImageEmbedder(8) // once per partition
      rows.map { case (p, bytes) => (p, model.embed(bytes)) }
    }.collect().toMap
    assert(embedded.size === 2) // txt filtered out by the glob
    assert(embedded.keys.forall(_.endsWith(".png")))
    val again = new HashImageEmbedder(8).embed(Array[Byte](1, 2, 3, 4))
    assert(embedded.find(_._1.endsWith("a.png")).get._2.toSeq === again.toSeq)
  }
}
