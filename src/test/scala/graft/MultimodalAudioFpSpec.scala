package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/**
 * Golden locks for the audio PERCEPTUAL fingerprint behind q167 (the
 * spectral dedup member the media family lacked — r11/r12 verdict: an
 * RMS envelope cannot tell a 440 Hz tone from a 3.5 kHz one):
 *  - byteBandEnergies (the SQL-reproducible oracle mode) hand-computed
 *    golden, including the <4-byte trailing-group drop;
 *  - decodeAudioBandEnergies band ORDERING on real WAV tones (low tone
 *    concentrates in band 0; a high tone leaves band 0) and the
 *    partial-frame edge case (a trailing frame of <4 samples yields
 *    all-zero bands — pinned, per the r12 advice);
 *  - audioFingerprint60 volume-invariance (energies scale by c^2, the
 *    dHash gradient signs do not move) and frequency discrimination;
 *  - audioNearDupPairs end-to-end on real WAV bytes: exactly the
 *    volume-scaled pair comes back, the different-tone-sequence does
 *    not.
 */
class MultimodalAudioFpSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-audiofp-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("byteBandEnergies: hand-computed golden + trailing-group drop") {
    // one frame of 8 bytes, two 4-byte groups:
    //   [1,2,3,4]: aa=10 ad=-4 da=-2 dd=0 -> 100,16,4,0
    //   [5,5,5,5]: aa=20 ad=da=dd=0      -> 400,0,0,0
    val e = Multimodal.byteBandEnergies(Array[Byte](1, 2, 3, 4, 5, 5, 5, 5), 8)
    assert(e.toSeq == Seq(500.0, 16.0, 4.0, 0.0))
    // trailing 3 bytes don't fill a 4-group: dropped (q = 1)
    val e2 = Multimodal.byteBandEnergies(Array[Byte](1, 2, 3, 4, 9, 9, 9), 8)
    assert(e2.toSeq == Seq(100.0, 16.0, 4.0, 0.0))
    // a trailing FRAME of <4 bytes yields all-zero bands (pinned edge)
    val e3 = Multimodal.byteBandEnergies(Array[Byte](1, 2, 3, 4, 7, 7), 4)
    assert(e3.length == 8 && e3.toSeq.drop(4) == Seq(0.0, 0.0, 0.0, 0.0))
    // signed bytes read unsigned
    assert(Multimodal.byteBandEnergies(Array[Byte](-1, -1, -1, -1), 4).head ==
      (255.0 * 4) * (255.0 * 4))
    assert(Multimodal.byteBandEnergies(Array.emptyByteArray, 8).isEmpty)
  }

  // 16-bit mono PCM WAV: one tone per 1024-sample block
  private def wavBytes(freqs: Seq[Double], amp: Double,
                       extraSamples: Int = 0): Array[Byte] = {
    import javax.sound.sampled._
    val rate = 8000f
    val perTone = 1024
    val n = freqs.length * perTone + extraSamples
    val pcm = new Array[Byte](n * 2)
    for (t <- freqs.indices; i <- 0 until perTone) {
      val v = (math.sin(2 * math.Pi * i * freqs(t) / rate) * amp * 16384).toInt
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

  test("decodeAudioBandEnergies: band ordering + partial-frame edge") {
    // 440 Hz at 8 kHz sits in [0, 1 kHz) -> band 0 (LL) dominates
    val low = Multimodal.decodeAudioBandEnergies(wavBytes(Seq(440.0), 0.5), 1024)
    assert(low.length == 4)
    assert(low(0) == low.max, s"440 Hz should peak in band 0: ${low.toSeq}")
    // 3.5 kHz sits in the top quarter -> band 0 is NOT the peak
    val high = Multimodal.decodeAudioBandEnergies(wavBytes(Seq(3500.0), 0.5), 1024)
    assert(high(0) != high.max, s"3.5 kHz should leave band 0: ${high.toSeq}")
    // a trailing frame with <4 samples yields all-zero bands (r12 advice)
    val e = Multimodal.decodeAudioBandEnergies(
      wavBytes(Seq(440.0), 0.5, extraSamples = 2), 1024)
    assert(e.length == 8 && e.toSeq.drop(4) == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("audioFingerprint60: volume-invariant, frequency-discriminating") {
    // alternating low/high tone blocks -> band energy moves between
    // bands frame to frame, a rich gradient trajectory
    val profile = (0 until 32).map(i => if ((i / 2) % 2 == 0) 440.0 else 3500.0)
    val a = audioHash(wavBytes(profile, 0.5))
    assert(a != 0L)
    // volume scale: every band energy scales by c^2, gradient signs hold
    val scaled = audioHash(wavBytes(profile, 0.4))
    assert(java.lang.Long.bitCount(a ^ scaled) <= 3,
      s"volume-scaled clip should be hamming-near, got ${java.lang.Long.bitCount(a ^ scaled)}")
    // a different tone sequence reorders the band maxima -> far
    val other = (0 until 32).map(i => if ((i / 2) % 2 == 0) 1500.0 else 700.0)
    val far = audioHash(wavBytes(other, 0.5))
    assert(java.lang.Long.bitCount(a ^ far) > 10,
      s"different tone sequence should be hamming-far, got ${java.lang.Long.bitCount(a ^ far)}")
  }

  private def audioHash(bytes: Array[Byte]): Long =
    Multimodal.audioFingerprint60(bytes, frameSamples = 1024)

  test("audioNearDupPairs: end-to-end on real WAV bytes") {
    import spark.implicits._
    val profile = (0 until 32).map(i => if ((i / 2) % 2 == 0) 440.0 else 3500.0)
    val other = (0 until 32).map(i => if ((i / 2) % 2 == 0) 1500.0 else 700.0)
    val rows = Seq(
      (1L, wavBytes(profile, 0.5)),
      (2L, wavBytes(profile, 0.4)), // volume-scaled near dup
      (3L, wavBytes(other, 0.5)))
    val packed = rows.toDF("doc_id", "content")
      .select(col("doc_id"), col("content"),
        struct(length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("content_md5"),
          lit("audio/wav").as("mime")).as("meta"))
    val pairs = Multimodal.audioNearDupPairs(packed, "doc_id", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)), s"got $pairs")
  }
}
