package graft.ml

import graft.SparkTestBase

/** The ONNX leg of the embedder seam. The onnxruntime jar is not in
  * this container, so the live-session test is opt-in
  * (SPARK_GRAFT_ONNX_MODEL names a model file AND the runtime class
  * must load); everything else — factory resolution, lazy
  * construction, tokenizer determinism, the loud classpath error —
  * is asserted unconditionally, because those ARE the contract the
  * surrogate-verified pipeline relies on when a deployment flips
  * `spark.graft.embedder=onnx`. */
class OnnxEmbedderSpec extends SparkTestBase {

  private def runtimePresent: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException => false }

  test("factory resolves onnx mode and constructs lazily (no runtime touched)") {
    val s = spark
    s.conf.set("spark.graft.embedder", "onnx")
    s.conf.set("spark.graft.embedder.model", "/nonexistent/model.onnx")
    try {
      val factory = Embedders.textEmbedderFactory(s, dim = 64)
      // Construction on the driver and per-partition must not load
      // the runtime or open the model — only the first embed does.
      val e = factory()
      assert(e.isInstanceOf[OnnxTextEmbedder])
      assert(e.dim === 64)
    } finally {
      s.conf.unset("spark.graft.embedder")
      s.conf.unset("spark.graft.embedder.model")
    }
  }

  test("missing runtime fails loudly with the classpath contract, not NoClassDefFound") {
    assume(!runtimePresent)
    val e = intercept[IllegalStateException](
      new OnnxTextEmbedder("/nonexistent/model.onnx").embed("hello world"))
    assert(e.getMessage.contains("onnxruntime"))
    assert(e.getMessage.contains("surrogate"))
  }

  test("hash tokenizer is deterministic, padded, and vocab-bounded") {
    val emb = new OnnxTextEmbedder("/unused.onnx", maxLen = 8, vocabSize = 100L)
    val ids = emb.tokenize("a b  c")
    assert(ids.length === 8)
    assert(ids.drop(3).forall(_ == 0L), "right-padding broken")
    assert(ids.forall(i => i >= 0L && i < 100L))
    assert(ids.toSeq === emb.tokenize("a b  c").toSeq) // deterministic
    assert(emb.tokenize((1 to 50).mkString(" ")).length === 8) // truncation
  }

  test("onnx embedder embeds through a real session (opt-in: needs " +
    "onnxruntime on the classpath + SPARK_GRAFT_ONNX_MODEL pointing at " +
    "a .onnx file — CANCELED otherwise, by design)") {
    val model = sys.env.get("SPARK_GRAFT_ONNX_MODEL")
    assume(runtimePresent && model.exists(m => new java.io.File(m).exists()))
    val emb = new OnnxTextEmbedder(model.get, dim = 64)
    val v = emb.embed("the quick brown fox")
    assert(v.length === 64)
    assert(v.toSeq === emb.embed("the quick brown fox").toSeq)
  }
}
