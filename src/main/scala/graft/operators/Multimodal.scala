package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads are opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * frame-sample run as per-partition batch transforms.
 *
 * The Spark-side contract (schema, partitioning, batch iteration, output
 * shape) is real and tested; the actual media decode is STUBBED with a
 * deterministic byte-level fake because no image/audio codec libraries
 * ship in this environment — `decodeFrames` is the single seam to replace
 * with a real decoder (e.g. javacv) without touching the plan shape.
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
   * STUB decoder: interprets the payload as fixed-size "frames" of
   * `frameBytes` bytes and emits one mean-byte-value feature per frame —
   * a deterministic stand-in for image decode + downsampled features.
   * Replace this function body with a real codec call; the signature
   * (bytes -> per-frame float features) is the production contract.
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
