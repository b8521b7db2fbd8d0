package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal}

/**
 * Golden locks for the perceptual-hash near-dup family behind q150
 * (r9 verdict #4 — the dedup member the multimodal family lacked):
 *  - dHash kernel bit-exactness on constructed feature sequences;
 *  - the gradient property (global brightness shifts leave the hash
 *    unchanged — the reason dHash is a NEAR-dup signal);
 *  - REAL-codec golden: PNG images decoded via javax.imageio, where a
 *    1-row perturbation lands at hamming 1 and a reversed gradient at
 *    hamming 60 — imageNearDupPairs returns exactly the near pair;
 *  - the sized-by-default star-edge cap inherited from
 *    Dedup.hammingBandPairs (the r8 bare-call quadratic hazard).
 */
class MultimodalPHashSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-phash-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("perceptualHash60: exact bits on constructed sequences") {
    // strictly rising 61 samples -> every adjacent comparison true
    assert(Multimodal.perceptualHash60(Array.tabulate(61)(_.toDouble)) ==
      (1L << 60) - 1)
    // strictly falling -> no bit set; empty/constant -> 0
    assert(Multimodal.perceptualHash60(Array.tabulate(61)(i => (61 - i).toDouble)) == 0L)
    assert(Multimodal.perceptualHash60(Array.emptyDoubleArray) == 0L)
    assert(Multimodal.perceptualHash60(Array.fill(100)(7.0)) == 0L)
    // 2-sample upsample: resize repeats f(0) for k<=30, f(1) after ->
    // the single rise sits exactly at bit 30
    assert(Multimodal.perceptualHash60(Array(1.0, 2.0)) == (1L << 30))
  }

  test("perceptualHash60: invariant to global brightness shift") {
    val f = Array.tabulate(97)(i => math.sin(i / 7.0) * 50 + 100)
    val shifted = f.map(_ + 33.3)
    assert(Multimodal.perceptualHash60(f) == Multimodal.perceptualHash60(shifted))
    assert(Multimodal.perceptualHash60(f) != 0L)
  }

  private def pngBytes(grays: Seq[Int]): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(8, grays.length, BufferedImage.TYPE_INT_RGB)
    for (y <- grays.indices; x <- 0 until 8) {
      val g = grays(y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  private def pack(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "content")
      .select(col("doc_id"), col("content"),
        struct(length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("content_md5"),
          lit("image/png").as("mime")).as("meta"))
  }

  test("REAL PNG golden: 1-row edit is hamming 1, reversed gradient is far") {
    // 61 rows so the 61-sample resize is the identity on row means:
    // gray 4*y strictly rising -> all 60 dHash bits set
    val base = (0 until 61).map(_ * 4)
    val hA = Multimodal.perceptualHash60(Multimodal.decodeImageRows(pngBytes(base)))
    assert(hA == (1L << 60) - 1)
    // flatten one step: row 30 drops to row 29's level -> ONLY bit 29
    // (the 29->30 comparison) flips; bit 30 (30->31) still rises
    val near = base.updated(30, base(29))
    val hN = Multimodal.perceptualHash60(Multimodal.decodeImageRows(pngBytes(near)))
    assert(java.lang.Long.bitCount(hA ^ hN) == 1, s"expected hamming 1")
    // reversed gradient: every comparison flips -> hamming 60
    val hR = Multimodal.perceptualHash60(Multimodal.decodeImageRows(pngBytes(base.reverse)))
    assert(java.lang.Long.bitCount(hA ^ hR) == 60)

    // the full operator on real codec bytes finds exactly the near pair
    import spark.implicits._
    val packed = pack(Seq((1L, pngBytes(base)), (2L, pngBytes(near)),
      (3L, pngBytes(base.reverse))))
    val pairs = Multimodal.imageNearDupPairs(packed, "doc_id", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1)), s"got $pairs")
  }

  test("REAL AVI golden: videoNearDupPairs completes the media family") {
    // minimal uncompressed-AVI builder (the TrainingOpsSpec RIFF shape)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ inner)
    val (w, h) = (4, 2)
    val rowBytes = ((w * 3 + 3) / 4) * 4
    def aviBytes(grays: Seq[Int]): Array[Byte] = {
      val avih = new Array[Byte](56)
      le32(w).copyToArray(avih, 32); le32(h).copyToArray(avih, 36)
      val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
        new Array[Byte](48)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(rowBytes * h) ++ new Array[Byte](16)
      val movi = list("movi",
        grays.map(g => chunk("00db", Array.fill(rowBytes * h)(g.toByte)))
          .foldLeft(Array.empty[Byte])(_ ++ _))
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // 61 frames rising 4/step: all 60 dHash bits set; a global
    // brightness re-grade (+12) keeps every gradient sign -> hamming 0;
    // the reversed trajectory flips all 60
    val base = (0 until 61).map(_ * 4)
    val hA = Multimodal.perceptualHash60(Multimodal.decodeVideoFrames(aviBytes(base)))
    assert(hA == (1L << 60) - 1)
    assert(Multimodal.perceptualHash60(
      Multimodal.decodeVideoFrames(aviBytes(base.map(_ + 12)))) == hA)
    assert(java.lang.Long.bitCount(hA ^ Multimodal.perceptualHash60(
      Multimodal.decodeVideoFrames(aviBytes(base.reverse)))) == 60)
    import spark.implicits._
    val packed = pack(Seq((1L, aviBytes(base)), (2L, aviBytes(base.map(_ + 12))),
      (3L, aviBytes(base.reverse))))
    val pairs = Multimodal.videoNearDupPairs(packed, "doc_id", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0)), s"got $pairs")
  }

  test("REAL WAV golden: the operator is modality-generic via its decode seam") {
    import javax.sound.sampled._
    // 16-bit mono PCM tones; a mild amplitude change is a NEAR dup
    // (few gradient flips), a different frequency pattern is far
    def wavBytes(freqs: Seq[Double], amp: Double): Array[Byte] = {
      val rate = 8000f
      val perTone = 1024
      val n = freqs.length * perTone
      val pcm = new Array[Byte](n * 2)
      for ((f, t) <- freqs.zipWithIndex; i <- 0 until perTone) {
        val v = (math.sin(2 * math.Pi * i * f / rate) * amp * 16384).toInt
        pcm(2 * (t * perTone + i)) = (v & 0xff).toByte
        pcm(2 * (t * perTone + i) + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 64 tones with rising-falling RMS profile via amplitude steps
    val profile = (0 until 64).map(i => 100.0 + (i % 8) * 30.0)
    val a = wavBytes(profile, 0.5)
    val near = wavBytes(profile, 0.52) // amplitude scale: same gradient signs
    val far = wavBytes(profile.reverse, 0.5)
    def hashOf(bytes: Array[Byte]): Long =
      Multimodal.perceptualHash60(
        Multimodal.decodeAudioFrames(bytes, frameSamples = 1024))
    val hA = hashOf(a)
    assert(hA != 0L)
    assert(java.lang.Long.bitCount(hA ^ hashOf(near)) <= 3,
      "amplitude-scaled tone sequence should be hamming-near")
    assert(java.lang.Long.bitCount(hA ^ hashOf(far)) > 10,
      "reversed tone profile should be hamming-far")
    // the full operator with the audio decoder plugged into the seam
    import spark.implicits._
    val packed = pack(Seq((1L, a), (2L, near), (3L, far)))
    val pairs = Multimodal.imageNearDupPairs(packed, "doc_id", maxHamming = 3,
        decode = Multimodal.decodeAudioFrames(_, 1024))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)), s"got $pairs")
  }

  test("default cap inherited: 150 identical payloads emit star edges, not all-pairs") {
    import spark.implicits._
    val bytes = pngBytes((0 until 61).map(_ * 4))
    val packed = pack((1L to 150L).map(i => (i, bytes)))
    // identical hashes -> every chunk bucket is 150 > the CapAuto floor
    // (100): a BARE call must emit 149 star edges from the min doc
    val got = Multimodal.imageNearDupPairs(packed, "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(got.length == 149, s"default must star-cap: ${got.length}")
    assert(got.forall { case (a, b) => a == 1L && b > 1L })
    // connectivity preserved: one 150-doc cluster
    val clusters = Dedup.dupClusters(
      Multimodal.imageNearDupPairs(packed, "doc_id").select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 150 && clusters.values.forall(_ == 1L))
    // the oracle opt-in keeps exact all-pairs semantics
    assert(Multimodal.imageNearDupPairs(packed, "doc_id",
      hotBucketCap = Int.MaxValue).count() == 150L * 149 / 2)
  }
}
