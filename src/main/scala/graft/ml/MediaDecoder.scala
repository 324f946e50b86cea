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

/** REAL image decoder on javax.imageio / java.awt (zero extra deps,
  * works headless): decode → RGB-convert → bounded resize, the
  * reference's PIL preprocess exactly (photo_vector_search.py:85-92:
  * `Image.open`, `convert("RGB")`, thumbnail to a ≤1024 long edge).
  * Frame sampling operates on the DECODED RGB pixel stream (3
  * bytes/pixel, row-major), so a "frame" is a fixed-size pixel block
  * — the same shape a video pipeline feeds a featurizer.
  *
  * This is the production implementation behind the trait; the
  * surrogate stays the ORACLE path because the harness's payloads
  * are text bytes (DuckDB must be able to replay the "decode").
  * Same load-once-per-partition discipline: construct inside
  * mapPartitions, reuse per row (decoder instances hold no per-image
  * state, only configuration). */
final class ImageIoMediaDecoder(maxEdge: Int = 1024) extends MediaDecoder {
  import java.awt.image.BufferedImage
  import java.io.ByteArrayInputStream
  import javax.imageio.ImageIO

  def meta(content: Array[Byte]): MediaMeta = {
    val img = decode(content)
    MediaMeta(img.getWidth, img.getHeight, formatName(content),
      content.length.toLong)
  }

  /** Decode + RGB conversion + aspect-preserving bound of the long
    * edge to `maxEdge` (never upscales — PIL `thumbnail` semantics). */
  def decodeRgb(content: Array[Byte]): BufferedImage = {
    val src = decode(content)
    val scale = math.min(1.0,
      maxEdge.toDouble / math.max(src.getWidth, src.getHeight))
    val tw = math.max(1, math.round(src.getWidth * scale).toInt)
    val th = math.max(1, math.round(src.getHeight * scale).toInt)
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(src, 0, 0, tw, th, null) finally g.dispose()
    out
  }

  /** RGB bytes of the bounded decode, row-major, 3 bytes per pixel. */
  def rgbBytes(content: Array[Byte]): Array[Byte] = {
    val img = decodeRgb(content)
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    var p = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        out(p) = ((rgb >> 16) & 0xff).toByte
        out(p + 1) = ((rgb >> 8) & 0xff).toByte
        out(p + 2) = (rgb & 0xff).toByte
        p += 3; x += 1
      }
      y += 1
    }
    out
  }

  def sampleFrames(content: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    val px = rgbBytes(content)
    val full = px.length / frameSize // complete frames only
    (0 until full by stride).map(i =>
      java.util.Arrays.copyOfRange(px, i * frameSize, (i + 1) * frameSize))
  }

  private def decode(content: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(content))
    if (img == null) throw new IllegalArgumentException(
      s"undecodable image payload (${content.length} bytes)")
    img
  }

  private def formatName(content: Array[Byte]): String = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (readers.hasNext) readers.next().getFormatName.toLowerCase else "unknown"
    } finally iis.close()
  }
}

object MediaDecoder {
  /** UTF-8 helper for the surrogate oracle (content is text bytes in
    * the testdata harness). */
  def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)
}
