package graft.ml

import java.nio.charset.StandardCharsets.UTF_8

/** Multimodal decode / feature-extract seam (reference analog: PIL
  * decode + bounded resize before inference,
  * photo_vector_search.py:85-92). Media arrives as an opaque binary
  * column; the decoder turns bytes into typed features and fixed-size
  * frame samples. Real codecs (ImageIO/JCodec/ffmpeg-pipe) plug in
  * behind the same trait with the same load-once-per-partition
  * discipline; the shipped implementation is a deterministic
  * surrogate (hash-derived dimensions, byte-chunk "frames") so the
  * Spark-side plumbing — schema, partitioning, batch shape — is real
  * and oracle-checkable while the container has no image libraries.
  */
final case class MediaMeta(width: Int, height: Int, format: String, nBytes: Long)

trait MediaDecoder extends Serializable {
  def meta(content: Array[Byte]): MediaMeta
  /** Every `stride`-th fixed-size frame of the payload (video
    * frame-sampling shape: bounded, evenly spaced). */
  def sampleFrames(content: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]]
}

final class SurrogateMediaDecoder extends MediaDecoder {
  def meta(content: Array[Byte]): MediaMeta = {
    // "Decoded" dimensions: bounded like the reference's <=1024 edge;
    // derived from the content hash so the oracle can reproduce them.
    val h = Embedders.h28(content)
    MediaMeta(
      width = (h % 1024).toInt + 1,
      height = ((h / 1024) % 1024).toInt + 1,
      format = if (content.length % 2 == 0) "png" else "jpeg",
      nBytes = content.length.toLong)
  }

  def sampleFrames(content: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    val full = content.length / frameSize // complete frames only
    (0 until full by stride).map(i =>
      java.util.Arrays.copyOfRange(content, i * frameSize, (i + 1) * frameSize))
  }
}

object MediaDecoder {
  /** UTF-8 helper for the surrogate oracle (content is text bytes in
    * the testdata harness). */
  def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)
}
