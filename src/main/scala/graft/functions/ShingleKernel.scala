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

  /** Distinct sorted md5-60 (15 hex chars, the PortableHash convention
    * q105 established for span identity) shingle hashes — the
    * wide-identity variant of [[md5ShingleSet]] for operators whose
    * semantics READ the collision rate (first-occurrence novelty, q116:
    * a 32-bit birthday collision would mis-attribute a shingle's first
    * occurrence ~100x per million distinct shingles; at 60 bits the
    * expectation is ~1e-6 per million^2 — negligible, and in any case
    * identical in the oracle, which shares the hash). */
  def md5ShingleSet60(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    hashShingles(text, n)(bytes => md5Long60(md, bytes))
  }

  /** First 15 hex chars of md5 as a long (60 bits) — bit-identical to
    * `('0x'||substr(md5(s),1,15))::BIGINT` in DuckDB and to q105's
    * conv(substr(md5(..),1,15),16,10) column form. */
  @inline private def md5Long60(md: java.security.MessageDigest,
                                bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 15) {
      val b = d(i / 2) & 0xff
      v = (v << 4) | (if (i % 2 == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** Positional (NON-distinct, document-order) md5-60 hashes of the
    * k-token shingles — the shared front half of [[winnowSet]] and
    * [[cdcChunkHashes]], exposed for spec parity against the column
    * form. Empty when the document has fewer than k tokens. */
  def positionalHashes60(text: String, k: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = ws.split(text, -1)
    positionalHashes60(toks, k)
  }

  private def positionalHashes60(toks: Array[String], k: Int): Array[Long] = {
    if (toks.length < k) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](toks.length - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = md5Long60(md, sb.toString.getBytes(UTF_8))
      i += 1
    }
    out
  }

  /** Winnowing fingerprint set (Schleimer et al. 2003, the MOSS
    * guarantee: every shared substring of length >= k + w - 1 tokens
    * contributes at least one shared fingerprint): positional k-shingle
    * md5-60 hashes, minimum per sliding window of w consecutive hashes,
    * distinct sorted minima. A monotone deque keeps the sweep O(n)
    * instead of the HOF column form's O(n*w) interpreted walk. Ties
    * inside a window are by VALUE only (the selected set is the same
    * whichever position a duplicated minimum came from — set semantics
    * make the rightmost-vs-leftmost convention unobservable), so the
    * DuckDB `list_min` over slices reproduces it exactly. Empty when
    * the document has fewer than k + w - 1 tokens (no full window). */
  def winnowSet(text: String, k: Int, w: Int): Array[Long] = {
    val hs = positionalHashes60(text, k)
    if (hs.length < w) return Array.emptyLongArray
    val mins = new Array[Long](hs.length - w + 1)
    val deque = new Array[Int](hs.length) // indices, increasing hash value
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < hs.length) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(deque(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var wr = 0
    i = 0
    while (i < mins.length) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(wr) = mins(i); wr += 1 }
      i += 1
    }
    if (wr == mins.length) mins else java.util.Arrays.copyOf(mins, wr)
  }

  /** Content-defined chunk hashes (the storage-dedup primitive — FastCDC
    * / LBFS-style boundaries, token-level): a boundary closes at token
    * position i (1-based, w <= i <= n-1) when the md5-60 hash of the
    * w-token window ENDING at i is divisible by `modulus` (expected
    * chunk length ~ modulus tokens); the final token always closes the
    * last chunk. Each chunk's identity is the md5-60 of its tokens
    * joined by single spaces, returned in DOCUMENT ORDER with
    * duplicates kept (occurrence counts are the point of chunk dedup).
    * Content-defined means insert/delete edits only perturb the
    * neighboring chunk boundaries — unlike fixed-size chunking, where
    * one leading token shifts every downstream chunk identity. A
    * document shorter than w tokens is a single chunk. */
  def cdcChunkHashes(text: String, w: Int, modulus: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = ws.split(text, -1)
    val hw = positionalHashes60(toks, w)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    val sb = new java.lang.StringBuilder(256)
    var start = 0 // 0-based chunk start
    var i = 0
    while (i < toks.length) {
      // window ending at 0-based i has hash hw(i - w + 1); boundary
      // positions are w-1 .. n-2 (0-based), i.e. 1-based w .. n-1
      val boundary = i == toks.length - 1 ||
        (i >= w - 1 && i < toks.length - 1 && hw(i - w + 1) % modulus == 0)
      if (boundary) {
        sb.setLength(0)
        var j = start
        while (j <= i) {
          if (j > start) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out += md5Long60(md, sb.toString.getBytes(UTF_8))
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** ALL word n-gram shingle strings in document order, duplicates kept
    * — the non-distinct sibling of [[shingleStrings]] for operators that
    * COUNT instances (q121's count-of-counts). Bit-parity contract with
    * `TF.shingles` (the interpreted HOF form measured 7.6 s of q121's
    * sf0.1 wall — this is one JVM call per row). */
  def shingleInstances(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty[String]
    val toks = ws.split(text, -1)
    if (toks.length < n) return Array.empty[String]
    val out = new Array[String](toks.length - n + 1)
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
      out(i) = sb.toString
      i += 1
    }
    out
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

  /** For each probe length n, 1 if some token n-gram occurs >= 2 times
    * in the document, else 0 — one early-exiting pass per probe over
    * the token array with an EXACT string set (no hashing, so a SQL
    * oracle's `len(ngrams) > len(distinct(ngrams))` reproduces it
    * verbatim). The probe lengths are the operator's contract: a
    * binary-search-style fixed grid stands in for "longest repeated
    * n-gram" without quadratic suffix work. */
  def repeatedNgramFlags(text: String, ns: Array[Int]): Array[Int] = {
    if (text == null) return ns.map(_ => 0)
    val toks = ws.split(text, -1)
    ns.map { n =>
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      var rep = 0
      while (i <= toks.length - n && rep == 0) {
        sb.setLength(0)
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        if (!seen.add(sb.toString)) rep = 1
        i += 1
      }
      rep
    }
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
