package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine deterministic hashing, built on MD5 — the one hash that is
 * bit-identical in Spark, DuckDB, and the JVM (`MessageDigest`). Used by
 * every operator whose results must be reproducible by an independent SQL
 * engine (the correctness oracle): hash sampling, MinHash shingle hashes,
 * SimHash token hashes, LSH hyperplane signs.
 *
 * The 64-bit engine hashes (xxhash64) stay in paths where only Spark-side
 * determinism matters — they are ~10x cheaper per call. The contract here
 * trades that speed for verifiability.
 *
 * Convention: `h(s, n)` = first n hex chars of md5(s) parsed as a base-16
 * integer. n <= 15 keeps the value under 2^60, so all downstream affine
 * arithmetic fits signed 64-bit without overflow (ANSI-safe in Spark,
 * identical in DuckDB):
 *   Spark : CAST(conv(substr(md5(CAST(s AS BINARY)), 1, n), 16, 10) AS BIGINT)
 *   DuckDB: ('0x' || substr(md5(s), 1, n))::BIGINT
 */
object PortableHash {

  /** First `hexChars` hex digits of md5(s) as a non-negative long — THE
    * convention every consumer implements: [[graft.functions.ShingleKernel]]
    * reads the same bits straight from the digest bytes on the hot path,
    * and the oracle SQL spells it `('0x'||substr(md5(s),1,n))::BIGINT`. */
  // one digest per executor thread: getInstance is an allocation +
  // provider lookup, and the simhash path calls this once per TOKEN
  // INSTANCE; digest() resets the instance so reuse is safe
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5LongOf(s: String, hexChars: Int): Long = {
    val d = mdLocal.get().digest(s.getBytes(UTF_8))
    // first hexChars hex digits = high 4*hexChars bits of the big-endian prefix
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = d(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  /** DuckDB SQL fragment equivalent to [[md5LongOf]] over expression `e`. */
  def duckdbMd5Long(e: String, hexChars: Int): String =
    s"('0x'||substr(md5($e),1,$hexChars))::BIGINT"
}
