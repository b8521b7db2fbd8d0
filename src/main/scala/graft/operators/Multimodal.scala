package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads are opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * frame-sample run as per-partition batch transforms.
 *
 * Two decoders behind the same bytes -> per-frame-features contract:
 *  - [[decodeImageRows]] is a REAL image decoder (`javax.imageio` — the
 *    PNG/BMP/GIF readers ship with every JDK, no external codec needed):
 *    pixels -> per-pixel-row mean luminance, one feature per row.
 *  - [[decodeFrames]] is the deterministic byte-level fake, kept as the
 *    ORACLE mode (an independent SQL engine can reproduce it bit-for-bit,
 *    which no codec output is; q32/q42 oracle against it). Audio/video
 *    codecs still don't ship in this environment; for those formats the
 *    fake remains the stand-in and this seam is where a codec lands.
 */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** Pack a string column into the binary + metadata layout every
    * multimodal operator consumes (in production the binary arrives from
    * object storage; here it is synthesized from text fixtures). */
  def packBinary(df: DataFrame, idCol: String, payloadCol: String,
                 mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col(payloadCol), "UTF-8")).as("content_md5"),
        lit(mime).as("mime")).as("meta"))

  /**
   * REAL image decode via `javax.imageio` (pure JVM, headless-safe): the
   * payload is parsed as PNG/BMP/GIF/JPEG — whatever readers the JRE's
   * ImageIO registry carries — and reduced to one feature per pixel row
   * (mean Rec.601 luminance across the row). Undecodable or empty bytes
   * yield an empty feature array, so a mixed-quality corpus streams
   * through without task failures — the downstream resize/aggregate chain
   * treats "no frames" as a first-class case already.
   */
  def decodeImageRows(content: Array[Byte]): Array[Double] = {
    if (content == null || content.isEmpty) return Array.emptyDoubleArray
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: java.io.IOException => null }
    if (img == null) return Array.emptyDoubleArray
    val w = img.getWidth
    val h = img.getHeight
    if (w == 0 || h == 0) return Array.emptyDoubleArray
    val out = new Array[Double](h)
    var y = 0
    while (y < h) {
      var s = 0.0
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      out(y) = s / w
      y += 1
    }
    out
  }

  /**
   * ORACLE-mode decoder: interprets the payload as fixed-size "frames" of
   * `frameBytes` bytes and emits one mean-byte-value feature per frame —
   * a deterministic stand-in an independent SQL engine can reproduce
   * bit-for-bit (q32/q42), and the fallback contract for formats with no
   * JVM codec (audio/video). Same signature as the real decoder.
   */
  def decodeFrames(content: Array[Byte], frameBytes: Int): Array[Double] = {
    if (content.isEmpty) return Array.emptyDoubleArray
    content.grouped(frameBytes).map { frame =>
      var s = 0L
      frame.foreach(b => s += (b & 0xff))
      s.toDouble / frame.length
    }.toArray
  }

  /**
   * Nearest-neighbor resize of a variable-length feature sequence to a
   * fixed output dimension — the media-pipeline "resize" step (total for
   * ANY input length >= 1, unlike mean pooling which needs n >= outDim):
   * out(i) = in(floor(i * n / outDim)). Upsamples by repetition and
   * downsamples by striding, exactly like nearest-neighbor image resize.
   */
  def resizeNearest(features: Array[Double], outDim: Int): Array[Double] = {
    val n = features.length
    if (n == 0) return Array.emptyDoubleArray
    Array.tabulate(outDim)(i => features((i * n) / outDim))
  }

  /**
   * Real image feature extraction over the binary column: ImageIO decode
   * -> per-pixel-row luminance -> nearest-neighbor resize to a fixed
   * `outDim` feature vector. Narrow projection (no shuffle); rows whose
   * bytes don't decode get an empty vector and `decoded = false`.
   */
  def extractImageFeatures(packed: DataFrame, idCol: String,
                           outDim: Int = 32): DataFrame = {
    val decodeUdf = udf { (content: Array[Byte]) =>
      resizeNearest(decodeImageRows(content), outDim)
    }
    packed.select(
      col(idCol),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.mime").as("mime"),
      decodeUdf(col("content")).as("image_features"))
      .withColumn("decoded", size(col("image_features")) === outDim)
  }

  /**
   * Frame-sampled feature extraction over the binary column. Runs as a
   * single narrow projection (mapPartitions batch shape — rows stream
   * through the "decoder" without materializing the partition).
   */
  def extractFrameFeatures(packed: DataFrame, idCol: String,
                           frameBytes: Int = 64, sampleEvery: Int = 1): DataFrame = {
    val decodeUdf = udf { (content: Array[Byte]) =>
      val frames = decodeFrames(content, frameBytes)
      frames.indices.collect { case i if i % sampleEvery == 0 => frames(i) }
    }
    packed.select(
      col(idCol),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.content_md5").as("content_md5"),
      decodeUdf(col("content")).as("frame_features"))
      .withColumn("n_frames", size(col("frame_features")))
  }
}
