package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PortableHash, ShingleKernel}

/**
 * Semantics locks for the round-9 fingerprint/chunking kernels
 * (q114 winnowing, q115 CDC chunk dedup, q116 novelty identity):
 *  - the O(n) monotone-deque winnow sweep equals the naive O(n*w)
 *    window-min the oracle computes (list_min over slices);
 *  - the MOSS guarantee: documents sharing a token run of length
 *    >= k + w - 1 share at least one winnowed fingerprint;
 *  - CDC chunks PARTITION the document (reassembly invariant) and a
 *    single-token edit perturbs only the neighboring chunks, where
 *    fixed-width chunking shifts every downstream identity — the
 *    property the operator exists for;
 *  - md5ShingleSet60 is the 60-bit widening of md5ShingleSet (same
 *    shingle walk, PortableHash's 15-hex-char convention).
 */
class WinnowCdcSpec extends AnyFunSuite {

  private val K = 3
  private val W = 4

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "a b c d e f",               // exactly k + w - 1 tokens: one window
    "a b c d e",                 // one short of a full window
    "",
    "dup dup dup dup dup dup dup dup",
    "unicode éè tokens 中文 here ok seven eight nine ten",
    (1 to 300).map(i => s"tok${i % 37}").mkString(" "))

  private def naiveWinnow(text: String, k: Int, w: Int): Array[Long] = {
    val hs = ShingleKernel.positionalHashes60(text, k)
    if (hs.length < w) return Array.emptyLongArray
    (0 to hs.length - w).map(i => hs.slice(i, i + w).min).distinct.sorted.toArray
  }

  test("winnowSet: deque sweep equals the naive window-min (the oracle's form)") {
    texts.foreach { t =>
      assert(ShingleKernel.winnowSet(t, K, W).toSeq == naiveWinnow(t, K, W).toSeq,
        s"winnow mismatch on: '$t'")
    }
  }

  test("winnowSet: the MOSS coverage guarantee on a shared run") {
    // two documents with disjoint vocabulary except a shared run of
    // exactly k + w - 1 tokens — the minimum-length match the scheme
    // guarantees to detect
    val shared = (1 to K + W - 1).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma delta $shared epsilon zeta"
    val b = s"one two three $shared four five six seven"
    val fa = ShingleKernel.winnowSet(a, K, W).toSet
    val fb = ShingleKernel.winnowSet(b, K, W).toSet
    assert(fa.intersect(fb).nonEmpty,
      "documents sharing a (k+w-1)-token run must share a fingerprint")
    // and fully disjoint documents share none (60-bit hashes)
    val c = "completely different words with nothing in common at all here"
    assert(fa.intersect(ShingleKernel.winnowSet(c, K, W).toSet).isEmpty)
  }

  test("winnowSet: density lands near the analytic 2/(w+1)") {
    val doc = new scala.util.Random(7).shuffle(
      (1 to 5000).map(i => s"w$i").toList).mkString(" ")
    val n = ShingleKernel.winnowSet(doc, K, W).length
    val windows = 5000 - K - W + 2
    val expected = 2.0 / (W + 1)
    assert(math.abs(n.toDouble / windows - expected) < 0.05,
      s"density ${n.toDouble / windows} far from $expected")
  }

  // naive CDC reference returning the chunk TOKEN SPANS, so the
  // partition invariant is checked on content, not just hashes
  private def naiveCdcSpans(text: String, w: Int, mod: Int): Seq[Seq[String]] = {
    val toks = text.split("[ \\t\\n\\x0B\\f\\r]+", -1).toSeq
    val hs = ShingleKernel.positionalHashes60(text, w)
    val bounds = (w to toks.length - 1).filter(i => hs(i - w) % mod == 0) :+ toks.length
    bounds.foldLeft((0, Seq.empty[Seq[String]])) { case ((start, acc), b) =>
      (b, acc :+ toks.slice(start, b))
    }._2
  }

  test("cdcChunkHashes: chunks partition the document and hash its spans") {
    texts.foreach { t =>
      val spans = naiveCdcSpans(t, 3, 16)
      val toks = t.split("[ \\t\\n\\x0B\\f\\r]+", -1).toSeq
      assert(spans.flatten == toks, s"spans must partition tokens of '$t'")
      val expect = spans.map(sp => PortableHash.md5LongOf(sp.mkString(" "), 15))
      assert(ShingleKernel.cdcChunkHashes(t, 3, 16).toSeq == expect,
        s"chunk hashes mismatch on '$t'")
    }
  }

  test("cdcChunkHashes: a point edit perturbs O(1) chunks; fixed-width shifts all") {
    val base = (1 to 400).map(i => s"tok$i").mkString(" ")
    val edited = ("inserted " + base)
    val a = ShingleKernel.cdcChunkHashes(base, 3, 16)
    val b = ShingleKernel.cdcChunkHashes(edited, 3, 16)
    // CDC: everything after the first post-edit boundary re-synchronizes
    val shared = a.toSet.intersect(b.toSet).size
    assert(shared >= a.length - 2,
      s"CDC resync failed: only $shared of ${a.length} chunks survive a 1-token prepend")
    // fixed-width chunking on the same edit: every chunk identity shifts
    def fixed(text: String, width: Int): Seq[Long] =
      text.split(" ").grouped(width).map(g => PortableHash.md5LongOf(g.mkString(" "), 15)).toSeq
    val fShared = fixed(base, 16).toSet.intersect(fixed(edited, 16).toSet).size
    assert(fShared <= 1, s"fixed-width unexpectedly stable: $fShared shared")
  }

  test("shingleInstances keeps duplicates in document order (TF.shingles parity)") {
    texts.foreach { t =>
      val toks = t.split("[ \\t\\n\\x0B\\f\\r]+", -1).toSeq
      val expect =
        if (toks.length < K) Seq.empty
        else toks.sliding(K).map(_.mkString(" ")).toSeq
      assert(ShingleKernel.shingleInstances(t, K).toSeq == expect,
        s"instance mismatch on '$t'")
    }
  }

  test("md5ShingleSet60 is the 60-bit widening of the 32-bit walk") {
    texts.foreach { t =>
      val s60 = ShingleKernel.md5ShingleSet60(t, K)
      val s32 = ShingleKernel.md5ShingleSet(t, K)
      // no 32-bit collisions on these fixtures: same cardinality, and
      // the top 32 of each 60-bit hash... (different prefixes) — check
      // via the string walk instead: distinct shingle count matches
      assert(s60.length == s32.length, s"cardinality drift on '$t'")
      assert(s60.toSeq == s60.toSeq.sorted && s60.toSeq.distinct == s60.toSeq)
      // 60-bit values agree with PortableHash on the raw shingles
      val expect = ShingleKernel.shingleStrings(t, K)
        .map(s => PortableHash.md5LongOf(s, 15)).toSeq.distinct.sorted
      assert(s60.toSeq == expect)
    }
  }
}
