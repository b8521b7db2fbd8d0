package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Fused tokenize -> shingle -> hash -> distinct -> sort kernel for the
 * dedup operators (one JVM call per document).
 *
 * The composable column form — `transform(shingleSet(text), s =>
 * md5Long32(s))` — evaluates inside higher-order functions, which Spark
 * interprets per element: every shingle paid for expression-tree walking,
 * a 32-char hex string allocation, and a base-16 parse. Measured at
 * sf0.1 that was ~14 s of q26's ~17 s (~60 us per shingle). This kernel
 * crosses the UDF boundary once per row and reuses one MessageDigest
 * across the row's shingles, reading the hash straight from the digest
 * bytes — same values, ~30x less overhead.
 *
 * Parity contracts (tested by the unchanged q26/q27 oracle hashes):
 *  - tokenization = Spark's `split(text, "\\s+")` (Java regex, limit -1);
 *  - md5-32 = first 8 hex chars of md5 as a long ([[PortableHash]]'s
 *    convention) = the digest's first 4 bytes, big-endian unsigned;
 *  - xx64 = Spark's `xxhash64(shingle)` (XXH64 of the UTF-8 bytes,
 *    seed 42) — bit-identical to the built-in column function.
 */
object ShingleKernel {

  private val ws = java.util.regex.Pattern.compile(TextFunctions.wsClass)

  /** Distinct sorted md5-32 hashes of the word n-gram shingles (the
    * cross-engine-reproducible variant — feeds MinHash, q26). Null text
    * yields the empty set, like the null-propagating column form it
    * replaced (callers filter empty sets). */
  def md5ShingleSet(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    hashShingles(text, n) { bytes =>
      val d = md.digest(bytes) // digest() resets for the next shingle
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
  }

  /** Distinct sorted xxhash64 hashes of the shingles (engine-only paths:
    * exact Jaccard verification, q27 — 64-bit keeps pairwise collision
    * odds negligible). Null text yields the empty set. */
  def xx64ShingleSet(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    import org.apache.spark.unsafe.Platform
    hashShingles(text, n) { bytes =>
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    }
  }

  /** Distinct word n-gram shingle STRINGS in first-occurrence order — the
    * string variant of [[md5ShingleSet]] for operators that join on the
    * shingle itself (q45 decontamination). Bit-parity contract with
    * `TextFunctions.shingleSet` (`array_distinct` also keeps first
    * occurrences), locked in KernelParitySpec: the HOF column form
    * evaluates its lambda interpreted per element, this is one pass. */
  def shingleStrings(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty[String]
    val toks = ws.split(text, -1)
    if (toks.length < n) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** One-pass token/bigram repetition counters (q47):
    * [n_tokens, n_distinct_tokens, n_bigrams, n_distinct_bigrams] —
    * exactly `size(tokens)`, `size(array_distinct(tokens))`,
    * `size(bigrams)`, `size(array_distinct(bigrams))` of the column
    * forms, without four interpreted HOF walks over every document. */
  def repetitionCounts(text: String): Array[Int] = {
    if (text == null) return Array(0, 0, 0, 0)
    val toks = ws.split(text, -1)
    val tokSet = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { tokSet.add(toks(i)); i += 1 }
    val biSet = new java.util.HashSet[String]()
    i = 0
    while (i < toks.length - 1) { biSet.add(toks(i) + " " + toks(i + 1)); i += 1 }
    Array(toks.length, tokSet.size, math.max(toks.length - 1, 0), biSet.size)
  }

  @inline private def hashShingles(text: String, n: Int)
                                  (hash: Array[Byte] => Long): Array[Long] = {
    val toks = ws.split(text, -1)
    if (toks.length < n) return Array.emptyLongArray
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = hash(sb.toString.getBytes(UTF_8))
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }
}
