package graft.ml

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** HTTP model-endpoint embedder — the production shape behind the
  * TextEmbedder trait (reference analog: the Ollama HTTP client,
  * photo_vector_search.py:42-82; CLIP-service deployments look the
  * same). The hash surrogates remain the VERIFIED oracle path; this
  * class proves the trait's operational contract for a real remote
  * model:
  *
  *  - **Batching**: `embedAll` groups the partition iterator into
  *    `batchSize` requests (one HTTP round trip per batch, not per
  *    row) and streams results lazily, preserving order.
  *  - **Retry**: transient failures (IOException, 5xx) are retried
  *    up to `maxRetries` times with exponential backoff; a poison
  *    request fails the task loudly after the budget, it never
  *    hangs or silently drops rows.
  *  - **Rate limiting**: at most one request per `minIntervalMs`
  *    per embedder instance — i.e. per PARTITION, the mapPartitions
  *    load-once discipline, so total QPS = partitions / interval
  *    and is controlled by the plan, not by luck.
  *
  * Wire protocol (dependency-free on purpose — the container has no
  * JSON library beyond Spark's internals): POST `endpoint` with one
  * base64(UTF-8 text) per line; response is one line per input of
  * comma-joined float32 components. Anything but HTTP 200 with
  * exactly one line per input is an error.
  *
  * Construct ONCE PER PARTITION inside `mapPartitions` — the
  * instance carries the rate-limiter clock and an HTTP keep-alive
  * pool via the JDK's connection cache. */
final class HttpTextEmbedder(
    endpoint: String,
    val dim: Int = 64,
    batchSize: Int = 32,
    maxRetries: Int = 3,
    minIntervalMs: Long = 0L,
    initialBackoffMs: Long = 10L) extends TextEmbedder {

  @transient private var lastRequestAt = 0L

  def embed(text: String): Array[Float] = embedAll(Iterator(text)).next()

  override def embedAll(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.grouped(batchSize).flatMap(postWithRetry)

  private def postWithRetry(batch: Seq[String]): Seq[Array[Float]] = {
    var attempt = 0
    var backoff = initialBackoffMs
    while (true) {
      rateLimit()
      try return post(batch)
      catch {
        case e: IOException =>
          attempt += 1
          if (attempt > maxRetries)
            throw new IOException(
              s"embed endpoint $endpoint still failing after $maxRetries retries", e)
          Thread.sleep(backoff)
          backoff *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def rateLimit(): Unit = if (minIntervalMs > 0) {
    val wait = lastRequestAt + minIntervalMs - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
    lastRequestAt = System.currentTimeMillis()
  }

  private def post(batch: Seq[String]): Seq[Array[Float]] = {
    val conn = URI.create(endpoint).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(30000)
      conn.setDoOutput(true)
      val body = batch.map(t =>
        Base64.getEncoder.encodeToString(t.getBytes(UTF_8))).mkString("\n")
      conn.getOutputStream.write(body.getBytes(UTF_8))
      val code = conn.getResponseCode
      if (code != 200) throw new IOException(s"embed endpoint returned HTTP $code")
      val lines = new String(conn.getInputStream.readAllBytes(), UTF_8)
        .split("\n", -1).filter(_.nonEmpty)
      if (lines.length != batch.length)
        throw new IOException(
          s"embed endpoint returned ${lines.length} rows for ${batch.length} inputs")
      val vecs = lines.toSeq.map(_.split(",").map(_.toFloat))
      // A wrong-dimension vector must fail HERE (retryable + loud),
      // not flow silently into downstream distance kernels.
      vecs.foreach { v =>
        if (v.length != dim) throw new IOException(
          s"embed endpoint returned a dim-${v.length} vector, expected $dim")
      }
      vecs
    } finally conn.disconnect()
  }
}
