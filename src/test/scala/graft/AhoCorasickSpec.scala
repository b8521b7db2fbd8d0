package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AhoCorasick

/**
 * Aho-Corasick kernel (q175's blocklist primitive): the classic
 * failure-link cases hand-checked, overlapping-occurrence semantics
 * pinned, and a property check against the brute-force
 * position-enumeration definition (the exact definition the q175
 * DuckDB oracle evaluates in SQL).
 */
class AhoCorasickSpec extends AnyFunSuite {

  private def brute(patterns: Seq[String], text: String): Seq[Long] =
    patterns.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  test("classic he/she/his/hers failure-link case") {
    val pats = Seq("he", "she", "his", "hers")
    val ac = AhoCorasick(pats)
    // "ushers": she at 1, he at 2, hers at 2
    assert(ac.countMatches("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
    // "his hershey": he at 4 and 8, she inside "hershey" (s-h-e), his
    // at 0, hers at 4
    assert(ac.countMatches("his hershey").toSeq == Seq(2L, 1L, 1L, 1L))
    assert(ac.countMatches("").toSeq == Seq(0L, 0L, 0L, 0L))
    assert(ac.countMatches(null).toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("overlapping occurrences all count (the oracle's position semantics)") {
    val ac = AhoCorasick(Seq("aa", "aba"))
    assert(ac.countMatches("aaaa").toSeq == Seq(3L, 0L))
    assert(ac.countMatches("ababa").toSeq == Seq(0L, 2L))
    // a pattern that is a suffix of another still counts independently
    val ac2 = AhoCorasick(Seq("abab", "bab", "ab"))
    assert(ac2.countMatches("ababab").toSeq == Seq(2L, 2L, 3L))
  }

  test("production blocklist size: 2000 patterns, one pass, still exact") {
    // the size class the one-pass shape exists for — per-pattern scans
    // would be 2000 passes here
    val pats = (0 until 2000).map { i =>
      val w = graft.functions.PortableHash.md5LongOf(s"pat_$i", 10).toHexString
      w.take(3 + (i % 4))
    }.distinct
    val ac = AhoCorasick(pats)
    val texts = (0 until 50).map(t =>
      graft.functions.PortableHash.md5LongOf(s"text_$t", 15).toHexString * 8)
    texts.foreach { t =>
      assert(ac.countMatches(t).toSeq == brute(pats, t))
    }
  }

  test("property: matches the brute-force position enumeration") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val alpha = Gen.oneOf('a', 'b', 'c')
    val word = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    val pats = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.distinct)
    val text = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    val prop = Prop.forAll(pats, text) { (ps: List[String], t: String) =>
      ps.isEmpty || AhoCorasick(ps).countMatches(t).toSeq == brute(ps, t)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
