package graft.functions

import scala.collection.mutable

/**
 * Aho-Corasick multi-pattern string matching (Aho & Corasick 1975,
 * "Efficient String Matching: An Aid to Bibliographic Search" — public
 * method): match EVERY pattern of a set against a text in ONE pass,
 * O(|text| + matches), independent of the pattern count. This is the
 * blocklist primitive of production curation (C4/CCNet-style banned
 * phrase filtering runs tens of thousands of phrases per document —
 * per-pattern `contains` scans are O(|text| · |patterns|) and fall over
 * exactly where the blocklist gets serious).
 *
 * Match semantics: ALL occurrences at every position, overlapping
 * included ("aa" hits "aaaa" three times) — the position-enumeration
 * definition an independent SQL engine reproduces exactly (the q175
 * oracle counts `substr(text, i, len(p)) = p` over every i), unlike
 * replace-based non-overlapping counts.
 *
 * Scale shape: the automaton builds ONCE on the driver and rides the
 * kernel closure (the r11 per-row-constant-table rule) — broadcast cost
 * is the trie, per-row cost is one pass; no shuffle, no state. The
 * per-node transition map is a HashMap (alphabet-agnostic); `out`
 * chains collapse at build time so matching never walks suffix links.
 */
final class AhoCorasick private (
    val patterns: Array[String],
    gotoFn: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]]) extends Serializable {

  /** Occurrence count per pattern (index-aligned with `patterns`). */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    if (text == null) return counts
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      s = gotoFn(s).getOrElse(c, 0)
      val hits = out(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  def apply(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")
    val gotoFn = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = gotoFn(s).getOrElseUpdate(c, {
          gotoFn += mutable.HashMap.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          gotoFn.size - 1
        })
      }
      outB(s) += pi
    }
    // BFS failure links; output sets absorb their fail target's so the
    // match loop never chases suffix links
    val fail = new Array[Int](gotoFn.size)
    val queue = mutable.Queue.empty[Int]
    gotoFn(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoFn(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotoFn(f).contains(c)) f = fail(f)
        fail(s) = if (gotoFn(f).contains(c) && gotoFn(f)(c) != s) gotoFn(f)(c) else 0
        outB(s) ++= outB(fail(s))
      }
    }
    new AhoCorasick(patterns.toArray, gotoFn.toArray, fail, outB.map(_.toArray).toArray)
  }
}
