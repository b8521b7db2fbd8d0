package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeTrainer, WordPieceTrainer}

/**
 * Semantics locks for [[WordPieceTrainer]] (q160):
 *  - the SCORE selection is live, not frequency in disguise: a fixture
 *    where the most frequent pair loses to a rarer pair with rare parts
 *    (the defining WordPiece-vs-BPE difference), checked against BPE on
 *    the same vocabulary;
 *  - integer-score ties break on the pair string (the oracle's ORDER BY
 *    mirror) and merged symbols strip the right part's ## marker;
 *  - the ## alphabet is real: word-initial and continuation chars count
 *    separately;
 *  - encodeGreedy is maximal munch with ## continuations and the
 *    documented OOV fallback;
 *  - scoreScaleFor keeps n * scale within headroom.
 */
class WordPieceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("wordpiece-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vocabOf(ws: Seq[String]) = {
    import spark.implicits._
    WordPieceTrainer.vocabulary(ws.toDF("word"))
  }

  test("score selection: rare-parts pair beats the most frequent pair; tie breaks on pair") {
    // pairs: (a,##b) n=200 score .005 | (##b,##x)/(##b,##y) n=100 score .005
    // | (c,##d) n=50 score 50/(50*50)=.02 <- winner despite lowest count
    val vocab = vocabOf(
      Seq.fill(100)("abx") ++ Seq.fill(100)("aby") ++ Seq.fill(50)("cd"))
    val (merges, enc) = WordPieceTrainer.trainWithVocab(vocab, 2, minCount = 0L)
    val got = merges.orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0)._2 == "c ##d" && got(0)._3 == 50L,
      s"round 1 must pick the high-score rare pair, got ${got(0)}")
    assert(got(0)._4 == 1000000000000L * 50 / (50 * 50))
    // round 2: (a,##b), (##b,##x), (##b,##y) all score exactly
    // 100/(200*100) or 200/(200*200) = .005 -> scaled tie at 5e9;
    // '#' < 'a' so "##b ##x" wins the pair-string tie-break
    assert(got(1)._2 == "##b ##x" && got(1)._4 == 5000000000L,
      s"round 2 tie must break on pair string, got ${got(1)}")
    // the merged symbol stripped the right ## marker
    val encs = enc.collect().map(r => r.getString(0)).toSet
    assert(encs.exists(_.contains("##bx")),
      s"merged continuation symbol must be ##bx, got $encs")
    assert(encs.exists(_.contains("cd")),
      s"word-initial merge must be bare cd, got $encs")

    // BPE on the same vocabulary merges the most FREQUENT pair first —
    // the defining difference this spec exists to pin (BPE's alphabet
    // has no ## so its pair is "a b")
    val bpe = BpeTrainer.train(vocab, merges = 1, minCount = 0L).collect()
    assert(bpe(0).getString(1) == "a b" && bpe(0).getLong(2) == 200L)
  }

  test("## alphabet: initial and continuation chars are different symbols") {
    // "aa" x 10: symbols a (initial) and ##a (continuation) — a merge
    // candidate (a, ##a) with cx=10, cy=10, n=10
    val (merges, _) = WordPieceTrainer.trainWithVocab(
      vocabOf(Seq.fill(10)("aa")), 1, minCount = 0L)
    val m = merges.collect()(0)
    assert(m.getString(1) == "a ##a")
    assert(m.getLong(3) == 1000000000000L * 10 / (10 * 10))
  }

  test("encodeGreedy: maximal munch with ## continuations; OOV falls back per char") {
    val vocab = Set("a", "##b", "##bx", "##y", "cd")
    assert(WordPieceTrainer.encodeGreedy("abxy", vocab).toSeq ==
      Seq("a", "##bx", "##y"))
    // longest match wins over a shorter valid one ("##b" also matches)
    assert(WordPieceTrainer.encodeGreedy("abx", vocab).toSeq ==
      Seq("a", "##bx"))
    // word-initial piece from a merge
    assert(WordPieceTrainer.encodeGreedy("cd", vocab).toSeq == Seq("cd"))
    // OOV: novel chars emit their (marked) single-char form
    assert(WordPieceTrainer.encodeGreedy("qz", Set("q")).toSeq ==
      Seq("q", "##z"))
  }

  test("scoreScaleFor: headroom-sized, monotone down in corpus size") {
    assert(WordPieceTrainer.scoreScaleFor(270000L) == WordPieceTrainer.ScoreScale)
    val big = WordPieceTrainer.scoreScaleFor(1L << 40)
    assert(big < WordPieceTrainer.ScoreScale && big >= 1L)
    assert((1L << 40) <= (1L << 62) / big)
  }
}
