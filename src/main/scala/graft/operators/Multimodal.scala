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
 *  - [[decodeAudioFrames]] is a REAL audio decoder (`javax.sound.sampled`
 *    — the WAV/AIFF/AU readers also ship with every JDK): 16-bit PCM
 *    samples -> per-frame RMS amplitude, one feature per frame.
 *  - [[decodeVideoFrames]] is a REAL video decoder for uncompressed AVI
 *    (hand-rolled RIFF walk + BI_RGB DIB frames): per-frame mean
 *    luminance.
 *  - [[decodeFrames]] is the deterministic byte-level fake, kept as the
 *    ORACLE mode (an independent SQL engine can reproduce it bit-for-bit,
 *    which no codec output is; q32/q42 oracle against it) and the
 *    stand-in for COMPRESSED codecs (JPEG-only in the JDK; no MP3/AAC,
 *    no H.264) — that seam is where an external codec library lands.
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
   * REAL audio decode via `javax.sound.sampled` (pure JVM): the payload
   * is parsed as WAV/AIFF/AU and reduced to one RMS-amplitude feature per
   * frame of `frameSamples` samples (channels averaged per sampling
   * instant, amplitude normalized to [0, 1]). Only 16-bit PCM is decoded
   * — the universal uncompressed interchange format; anything else (or
   * undecodable bytes) yields an empty feature array, mirroring
   * [[decodeImageRows]]'s total-function contract.
   */
  def decodeAudioFrames(content: Array[Byte], frameSamples: Int = 1024): Array[Double] = {
    if (frameSamples <= 0) return Array.emptyDoubleArray
    val x = decodePcmInstants(content)
    val nInstants = x.length
    if (nInstants == 0) return Array.emptyDoubleArray
    val out = new Array[Double]((nInstants + frameSamples - 1) / frameSamples)
    var f = 0
    while (f < out.length) {
      val lo = f * frameSamples
      val hi = math.min(nInstants, lo + frameSamples)
      var sumSq = 0.0
      var i = lo
      while (i < hi) { sumSq += x(i) * x(i); i += 1 }
      out(f) = math.sqrt(sumSq / (hi - lo))
      f += 1
    }
    out
  }

  /** Shared PCM front-end of the audio decoders: 16-bit PCM payload ->
    * channel-averaged normalized samples in [-1, 1], one per sampling
    * instant. Undecodable / non-PCM16 bytes yield an empty array (the
    * family's total-function contract). */
  private def decodePcmInstants(content: Array[Byte]): Array[Double] = {
    if (content == null || content.isEmpty) return Array.emptyDoubleArray
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => return Array.emptyDoubleArray }
    try {
      val fmt = in.getFormat
      val ch = fmt.getChannels
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || ch < 1) return Array.emptyDoubleArray
      val bytes = in.readAllBytes()
      val big = fmt.isBigEndian
      val bytesPerInstant = 2 * ch
      val nInstants = bytes.length / bytesPerInstant
      val x = new Array[Double](nInstants)
      var i = 0
      while (i < nInstants) {
        // average the channels of one sampling instant
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val o = i * bytesPerInstant + 2 * c
          val s =
            if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
            else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
          acc += s / 32768.0
          c += 1
        }
        x(i) = acc / ch
        i += 1
      }
      x
    } catch { case _: Exception => Array.emptyDoubleArray }
    finally in.close()
  }

  /**
   * REAL audio decode to per-frame BAND energies — the spectral front
   * end of the audio perceptual fingerprint (r11 verdict #3: the media
   * dedup family had image dHash but audio only byte/envelope identity;
   * an RMS envelope cannot tell a 440 Hz tone from a 3.5 kHz one).
   * Per frame of `frameSamples` channel-averaged instants, a 2-level
   * HAAR WAVELET PACKET split yields 4 frequency bands in O(n) — the
   * pure-JVM stand-in for chromaprint's filterbank (no FFT library in
   * the JDK): level 1 halves the spectrum via pairwise sums/differences,
   * level 2 halves each half; the output per frame is the 4 bands' RMS
   * in packet order [LL, LH, HL, HH] (low -> high frequency up to the
   * wavelet-packet folding quirk, which is irrelevant for matching —
   * both sides of a comparison fold identically). Flattened frame-major:
   * [f0b0..f0b3, f1b0..f1b3, ...].
   */
  def decodeAudioBandEnergies(content: Array[Byte],
                              frameSamples: Int = 1024): Array[Double] = {
    if (frameSamples < 4) return Array.emptyDoubleArray
    val x = decodePcmInstants(content)
    val nInstants = x.length
    if (nInstants == 0) return Array.emptyDoubleArray
    val nFrames = (nInstants + frameSamples - 1) / frameSamples
    val out = new Array[Double](nFrames * 4)
    val a = new Array[Double](frameSamples / 2)
    val d = new Array[Double](frameSamples / 2)
    var f = 0
    while (f < nFrames) {
      val lo = f * frameSamples
      val hi = math.min(nInstants, lo + frameSamples)
      val half = (hi - lo) / 2
      // level 1: a = lowpass (pair means), d = highpass (pair diffs)
      var i = 0
      while (i < half) {
        val p = x(lo + 2 * i); val q = x(lo + 2 * i + 1)
        a(i) = (p + q) / 2; d(i) = (p - q) / 2
        i += 1
      }
      // level 2 on each, accumulating band energy directly
      val quarter = half / 2
      var eLL = 0.0; var eLH = 0.0; var eHL = 0.0; var eHH = 0.0
      var j = 0
      while (j < quarter) {
        val aa = (a(2 * j) + a(2 * j + 1)) / 2
        val ad = (a(2 * j) - a(2 * j + 1)) / 2
        val da = (d(2 * j) + d(2 * j + 1)) / 2
        val dd = (d(2 * j) - d(2 * j + 1)) / 2
        eLL += aa * aa; eLH += ad * ad; eHL += da * da; eHH += dd * dd
        j += 1
      }
      val denom = math.max(1, quarter)
      out(4 * f) = math.sqrt(eLL / denom)
      out(4 * f + 1) = math.sqrt(eLH / denom)
      out(4 * f + 2) = math.sqrt(eHL / denom)
      out(4 * f + 3) = math.sqrt(eHH / denom)
      f += 1
    }
    out
  }

  /**
   * REAL video decode for uncompressed AVI (RIFF container, BI_RGB
   * 24-bit DIB frames — the interchange format every encoder can emit):
   * one mean-Rec.601-luminance feature per video frame. A hand-rolled
   * RIFF walk because the JDK ships no video API at all; compressed
   * codecs (MJPEG/H.264) are out of scope and yield an empty array, as
   * do malformed bytes — the same total-function contract as the image
   * and audio decoders.
   */
  def decodeVideoFrames(content: Array[Byte]): Array[Double] = {
    if (content == null || content.length < 12) return Array.emptyDoubleArray
    def u32(o: Int): Long =
      (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
        ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def fourcc(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Array.emptyDoubleArray

    var width = 0
    var height = 0
    var bitCount = -1
    var compression = -1L
    // streams are declared in hdrl order; the NNdb/NNdc frame prefix is
    // the stream ordinal, so an AVI with an audio stream first carries
    // its video as '01db' and its first strf is a WAVEFORMATEX — track
    // the last strh's fccType and the video stream's ordinal instead of
    // assuming stream 0 / first strf
    var streamOrdinal = -1
    var lastStreamType = ""
    var videoStream = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, size)
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(o)
        val sz = u32(o + 4).toInt
        if (sz < 0 || o + 8 + sz > end) return // malformed chunk: stop
        if (id == "LIST") walk(o + 12, o + 8 + sz)
        else if (id == "avih" && sz >= 40) {
          width = u32(o + 8 + 32).toInt
          height = u32(o + 8 + 36).toInt
        } else if (id == "strh" && sz >= 4) {
          streamOrdinal += 1
          lastStreamType = fourcc(o + 8)
        } else if (id == "strf" && sz >= 20 &&
          lastStreamType == "vids" && videoStream < 0) {
          // BITMAPINFOHEADER: biBitCount at +14 (u16), biCompression at +16
          videoStream = streamOrdinal
          bitCount = u16(o + 8 + 14)
          compression = u32(o + 8 + 16)
        } else if (sz > 0 && videoStream >= 0 && id.length == 4 &&
          id.startsWith(f"$videoStream%02d") &&
          (id.endsWith("db") || id.endsWith("dc"))) frames += ((o + 8, sz))
        o += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
    }
    try walk(12, content.length)
    catch { case _: IndexOutOfBoundsException => return Array.emptyDoubleArray }
    if (width <= 0 || height <= 0 || frames.isEmpty ||
      compression != 0L || bitCount != 24) return Array.emptyDoubleArray

    val rowBytes = ((width * 3 + 3) / 4) * 4 // DIB rows pad to 4 bytes
    val expected = rowBytes * height
    frames.iterator.filter(_._2 >= expected).map { case (off, _) =>
      var s = 0.0
      var y = 0
      while (y < height) {
        var o = off + y * rowBytes
        var x = 0
        while (x < width) {
          // DIB pixel order is B, G, R
          s += 0.114 * (content(o) & 0xff) + 0.587 * (content(o + 1) & 0xff) +
            0.299 * (content(o + 2) & 0xff)
          o += 3
          x += 1
        }
        y += 1
      }
      s / (width.toLong * height)
    }.toArray
  }

  /**
   * Real video feature extraction over the binary column: AVI frame
   * decode -> per-frame mean luminance -> nearest-neighbor resize
   * (temporal frame-sampling) to `outDim` features. Narrow projection,
   * same contract as [[extractImageFeatures]].
   */
  def extractVideoFeatures(packed: DataFrame, idCol: String,
                           outDim: Int = 16): DataFrame = {
    val decodeUdf = udf { (content: Array[Byte]) =>
      resizeNearest(decodeVideoFrames(content), outDim)
    }
    packed.select(
      col(idCol),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.mime").as("mime"),
      decodeUdf(col("content")).as("video_features"))
      .withColumn("decoded", size(col("video_features")) === outDim)
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
   * Real audio feature extraction over the binary column: PCM decode ->
   * per-frame RMS -> nearest-neighbor resize to `outDim` features. Narrow
   * projection, same contract as [[extractImageFeatures]].
   */
  def extractAudioFeatures(packed: DataFrame, idCol: String,
                           frameSamples: Int = 1024, outDim: Int = 32): DataFrame = {
    val decodeUdf = udf { (content: Array[Byte]) =>
      resizeNearest(decodeAudioFrames(content, frameSamples), outDim)
    }
    packed.select(
      col(idCol),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.mime").as("mime"),
      decodeUdf(col("content")).as("audio_features"))
      .withColumn("decoded", size(col("audio_features")) === outDim)
  }

  /**
   * 60-bit perceptual difference hash (dHash — the public
   * perceptual-hash family's gradient variant, e.g. Krawetz's
   * "Kind of Like That" writeup) over a decoded 1-D luminance/feature
   * sequence: resize to 61 samples ([[resizeNearest]] — index-exact, so
   * an independent SQL engine reproduces it), bit k = 1 iff
   * sample(k+1) > sample(k). Adjacent-sample gradients are invariant to
   * global brightness shifts and robust to mild re-encoding — the
   * property that makes dHash a NEAR-dup signal where content-md5 (q32)
   * only catches byte-identity. 60 bits (not 64) so the hash rides the
   * existing 4x15-bit pigeonhole banding ([[Dedup.hammingBandPairs]]).
   * The comparison operands are means of exact integer sums (one double
   * division each), so the > is engine-exact under the shared-operand
   * rule. Empty decode -> hash 0 (groups with other undecodables).
   */
  def perceptualHash60(features: Array[Double]): Long = {
    if (features == null || features.isEmpty) return 0L
    val r = resizeNearest(features, 61)
    var h = 0L
    var k = 0
    while (k < 60) {
      if (r(k + 1) > r(k)) h |= (1L << k)
      k += 1
    }
    h
  }

  /**
   * Perceptual-hash near-duplicate pairs over a packed media column —
   * the dedup member of the multimodal family (r9 verdict #4: text has
   * five dedup signals, media had none): decode -> [[perceptualHash60]]
   * -> [[Dedup.hammingBandPairs]] (the same pigeonhole banding, skew
   * cap, and CapAuto sizing rule the text SimHash rides). `decode`
   * defaults to the REAL image decoder; q150 passes the byte-fake
   * [[decodeFrames]] (the established SQL-reproducible oracle mode).
   * Output: (doc_a, doc_b, hamming) with hamming <= maxHamming.
   *
   * Scale shape: hashing is a narrow per-row projection (one fused
   * decode+hash kernel call per payload — the heavy bytes never
   * shuffle); only (doc, 8-byte sim) rows enter the band join.
   */
  def imageNearDupPairs(
      packed: DataFrame, idCol: String,
      maxHamming: Int = 3, hotBucketCap: Int = Dedup.CapAuto,
      decode: Array[Byte] => Array[Double] = decodeImageRows,
      contentCol: String = "content"): DataFrame = {
    val hashUdf = udf((content: Array[Byte]) => perceptualHash60(decode(content)))
    val sig = packed.select(col(idCol).as("doc"), hashUdf(col(contentCol)).as("sim"))
    Dedup.hammingBandPairs(sig, maxHamming, hotBucketCap)
  }

  /**
   * Byte-fake SPECTRAL decode — the ORACLE mode of the audio fingerprint
   * (the [[decodeFrames]] role for [[decodeAudioBandEnergies]]): the
   * payload bytes themselves are treated as the sample stream, and each
   * `frameBytes` frame is reduced to 4 Haar-packet band energies, all in
   * EXACT integer arithmetic so an independent SQL engine reproduces the
   * result bit-for-bit. Per group of 4 consecutive bytes the level-2 Haar
   * packet coefficients are the 4-point Hadamard combinations
   * (x0+x1+x2+x3, x0+x1-x2-x3, x0-x1+x2-x3, x0-x1-x2+x3) — the unscaled
   * integer form of [[decodeAudioBandEnergies]]'s pair-mean recursion
   * (each real coefficient is the integer one / 4, so within-band
   * gradient SIGNS agree on full frames; the sqrt and per-frame
   * normalization are dropped because monotone rescaling cannot be made
   * engine-exact while integer sums can). Band energy = sum of squared
   * coefficients, a BIGINT. Output flattened frame-major
   * [f0LL,f0LH,f0HL,f0HH, f1LL, ...]; a trailing group of <4 bytes is
   * dropped and a trailing frame of <4 bytes yields all-zero bands —
   * both pinned by MultimodalAudioFpSpec and reproduced by the oracle.
   */
  def byteBandEnergies(content: Array[Byte], frameBytes: Int = 64): Array[Double] = {
    if (content == null || content.isEmpty || frameBytes < 4) return Array.emptyDoubleArray
    val n = content.length
    val nFrames = (n + frameBytes - 1) / frameBytes
    val out = new Array[Double](nFrames * 4)
    var f = 0
    while (f < nFrames) {
      val lo = f * frameBytes
      val q = (math.min(n, lo + frameBytes) - lo) / 4
      var eLL = 0L; var eLH = 0L; var eHL = 0L; var eHH = 0L
      var j = 0
      while (j < q) {
        val o = lo + 4 * j
        val x0 = content(o) & 0xff; val x1 = content(o + 1) & 0xff
        val x2 = content(o + 2) & 0xff; val x3 = content(o + 3) & 0xff
        val aa = x0 + x1 + x2 + x3; val ad = x0 + x1 - x2 - x3
        val da = x0 - x1 + x2 - x3; val dd = x0 - x1 - x2 + x3
        eLL += aa.toLong * aa; eLH += ad.toLong * ad
        eHL += da.toLong * da; eHH += dd.toLong * dd
        j += 1
      }
      out(4 * f) = eLL.toDouble; out(4 * f + 1) = eLH.toDouble
      out(4 * f + 2) = eHL.toDouble; out(4 * f + 3) = eHH.toDouble
      f += 1
    }
    out
  }

  /**
   * 60-bit audio PERCEPTUAL fingerprint: real PCM decode ->
   * [[decodeAudioBandEnergies]] (4 Haar-packet band energies per frame,
   * the chromaprint-style spectral front end) -> [[perceptualHash60]]
   * over the flattened frame-major band sequence. The dHash gradient is
   * taken along the (frame, band) trajectory, so the signature encodes
   * how spectral energy MOVES — a volume-scaled copy multiplies every
   * band energy by the same constant and keeps every gradient sign
   * (hamming ~0), while a different tone sequence reorders band maxima
   * (hamming far); an RMS envelope ([[decodeAudioFrames]]) cannot tell a
   * 440 Hz tone from a 3.5 kHz one, which is why the dedup family needed
   * the spectral front end (r11 verdict #3, finished r13).
   */
  def audioFingerprint60(content: Array[Byte], frameSamples: Int = 1024): Long =
    perceptualHash60(decodeAudioBandEnergies(content, frameSamples))

  /**
   * Audio perceptual near-duplicate pairs: [[audioFingerprint60]] per
   * payload, then the SAME 4x15-bit pigeonhole banding as text SimHash
   * and image dHash ([[Dedup.hammingBandPairs]] — skew cap and CapAuto
   * sizing inherited unchanged). Scale shape identical to
   * [[imageNearDupPairs]]: one fused decode+hash kernel per payload,
   * only (doc, 8-byte sim) rows shuffle.
   */
  def audioNearDupPairs(
      packed: DataFrame, idCol: String,
      maxHamming: Int = 3, hotBucketCap: Int = Dedup.CapAuto,
      frameSamples: Int = 1024): DataFrame =
    imageNearDupPairs(packed, idCol, maxHamming, hotBucketCap,
      decode = decodeAudioBandEnergies(_, frameSamples))

  /** Video perceptual near-duplicate pairs — the third modality through
    * the same decode seam (r13, completing the media dedup family:
    * image dHash q150, audio band-energy q167, video here): REAL
    * uncompressed-AVI decode to the per-frame mean-luminance trajectory
    * ([[decodeVideoFrames]]), dHash-60 along it (brightness-shift
    * invariant — a re-graded copy keeps every frame-to-frame gradient
    * sign), the shared pigeonhole banding. Spec-golden on synthesized
    * AVI bytes (MultimodalPHashSpec); the SQL-oracled byte-fake path is
    * q150's, unchanged — a codec cannot be reproduced in SQL. */
  def videoNearDupPairs(
      packed: DataFrame, idCol: String,
      maxHamming: Int = 3, hotBucketCap: Int = Dedup.CapAuto): DataFrame =
    imageNearDupPairs(packed, idCol, maxHamming, hotBucketCap,
      decode = decodeVideoFrames)

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
