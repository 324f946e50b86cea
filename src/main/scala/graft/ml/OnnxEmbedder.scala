package graft.ml

import java.nio.charset.StandardCharsets.UTF_8

/** ONNX Runtime text embedder behind the [[TextEmbedder]] seam — the
  * non-HTTP "real model" runtime the seam was designed for (the
  * reference loads its CLIP model in-process once per store,
  * photo_vector_search.py:28; this is the engine-side analog: one
  * OrtSession per PARTITION, reused for every row).
  *
  * The onnxruntime jar is an OPTIONAL runtime dependency, loaded
  * reflectively (`ai.onnxruntime.OrtEnvironment`): the engine
  * compiles and every declared query runs without it — the hash
  * surrogate stays the default and the oracle contract is untouched.
  * With the jar on the executor classpath and
  * `spark.graft.embedder=onnx`, each partition lazily opens one
  * session over `spark.graft.embedder.model` and runs batched
  * forwards. Without it, the first `embed` call fails loudly with
  * the classpath contract instead of a NoClassDefFoundError mid-task.
  *
  * Tokenization is the deterministic hash scheme (whitespace split,
  * h28 mod vocab) — a stand-in with the same (ids: long[1][L]) →
  * (float[1][D]) contract a real BPE front-end would feed; swapping
  * in a real tokenizer changes only [[tokenize]].
  */
final class OnnxTextEmbedder(
    modelPath: String,
    val dim: Int = 64,
    maxLen: Int = 16,
    vocabSize: Long = 30522L) extends TextEmbedder {

  /** (environment, session), resolved once per deserialized instance
    * — i.e. once per partition under the mapPartitions contract.
    * None ⇔ the runtime class is absent from this JVM. */
  @transient private lazy val rt: Option[(AnyRef, AnyRef)] =
    try {
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val sess = envCls.getMethod("createSession", classOf[String])
        .invoke(env, modelPath)
      Some((env, sess))
    } catch { case _: ClassNotFoundException => None }

  /** Deterministic id front-end: h28 of each whitespace token mod
    * vocab, right-padded with 0 to `maxLen`. */
  private[ml] def tokenize(text: String): Array[Long] = {
    val ids = text.split("\\s+").iterator.filter(_.nonEmpty).take(maxLen)
      .map(t => Embedders.h28(t.getBytes(UTF_8)) % vocabSize).toArray
    ids ++ Array.fill(maxLen - ids.length)(0L)
  }

  def embed(text: String): Array[Float] = {
    val (env, sess) = rt.getOrElse(throw new IllegalStateException(
      "spark.graft.embedder=onnx but ai.onnxruntime is not on the " +
        "classpath — ship the onnxruntime jar to the executors or use " +
        "the surrogate/http embedder"))
    val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val ids: Array[Array[Long]] = Array(tokenize(text))
    val tensor = tensorCls
      .getMethod("createTensor", envCls, classOf[Object])
      .invoke(null, env, ids)
    try {
      val inputName = firstInputName(sess)
      val inputs = java.util.Collections.singletonMap(inputName, tensor)
      val result = sess.getClass.getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(sess, inputs)
      try {
        val value = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        val raw = value.getClass.getMethod("getValue").invoke(value)
        val row = raw match {
          case m: Array[Array[Float]] => m(0)
          case v: Array[Float] => v
          case other => throw new IllegalStateException(
            s"onnx model output shape not float[1][D]/float[D]: ${other.getClass}")
        }
        // Pad/truncate to the declared dim so downstream schemas hold
        // whatever head size the model ships.
        java.util.Arrays.copyOf(row, dim)
      } finally closeQuietly(result)
    } finally closeQuietly(tensor)
  }

  private def firstInputName(sess: AnyRef): String = {
    val names = sess.getClass.getMethod("getInputNames").invoke(sess)
      .asInstanceOf[java.util.Set[String]]
    val it = names.iterator()
    if (it.hasNext) it.next()
    else throw new IllegalStateException(s"onnx model $modelPath has no inputs")
  }

  private def closeQuietly(o: AnyRef): Unit =
    try o.getClass.getMethod("close").invoke(o)
    catch { case _: Throwable => () }
}
