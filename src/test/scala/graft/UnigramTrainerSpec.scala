package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramTrainer

/**
 * Semantics locks for the unigram-LM (SentencePiece-style) trainer
 * behind q149:
 *  - train == apply: segmenting every word with the RETURNED costs
 *    reproduces the returned counts exactly (the scaladoc's
 *    removing-never-chosen-candidates argument, asserted live);
 *  - full coverage: every word's pieces concatenate back to the word;
 *  - the EM loop is LIVE, not vacuously converged: a constructed
 *    fixture flips a word's segmentation between rounds 1 and 2 (the
 *    q121 vacuous-green lesson — the round-2 DP must be exercised on a
 *    path where it disagrees with round 1);
 *  - the DP tie-break (shorter last piece on equal total) matches the
 *    oracle's composite arg-min key;
 *  - inter-round pruning really shrinks the multi inventory;
 *  - the inventory default is sized (VocabAuto = unigramVocabFor).
 */
class UnigramTrainerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("unigram-trainer-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def outOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("train == apply: returned costs reproduce returned counts; full coverage") {
    val out = outOf(UnigramTrainer.train(docs, "text", 4, 16, 60, 2, 0.75))
    assert(out.nonEmpty)
    val costMap = out.map(t => (t._1, t._3)).toMap
    val words = UnigramTrainer.wordTable(docs, "text", 16)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val recomputed = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, wc) =>
      val pieces = UnigramTrainer.viterbiPieces(w, costMap, 4)
      assert(pieces.mkString("") == w, s"pieces of '$w' don't concatenate back")
      pieces.foreach(p => recomputed(p) = recomputed.getOrElse(p, 0L) + wc)
    }
    // r10 advice: the inventory retains never-chosen singles at cnt 0
    // (coverage); only singles may be zero-count, and the nonzero slice
    // is exactly what re-applying the costs reproduces
    val (zero, nonzero) = out.partition(_._2 == 0L)
    assert(zero.forall(_._1.length == 1),
      s"only single-char pieces may carry cnt 0: ${zero.filter(_._1.length > 1)}")
    assert(recomputed.toMap == nonzero.map(t => (t._1, t._2)).toMap,
      "applying the returned costs does not reproduce the returned counts")
    // production-encode coverage: the FULL training alphabet is in the
    // returned inventory, so any new text over it is segmentable
    val alphabet = words.iterator.flatMap(_._1.toSeq).map(_.toString).toSet
    val inv = out.map(_._1).toSet
    assert(alphabet.subsetOf(inv),
      s"training alphabet chars missing from inventory: ${alphabet -- inv}")
    val newWord = alphabet.toSeq.sorted.take(8).mkString("")
    assert(UnigramTrainer.viterbiPieces(newWord, costMap, 4).mkString("") == newWord,
      "a new word over the training alphabet must be coverable")
  }

  test("live EM: a constructed fixture flips a segmentation between rounds") {
    import spark.implicits._
    // seed substring frequencies make 'ababa' segment ab+aba in round 1
    // (f_ab+1=461, f_aba+1=261 beat every alternative product), but
    // round-1 usage counts (ab:10, aba:50, abab:200, ba:40) make
    // aba+ba the round-2 winner ((51)(41) > (11)(51) > (201)(1)) —
    // verified by the closed-form product comparison in each round
    val syn = (Seq.fill(10)("ababa") ++ Seq.fill(200)("abab") ++
      Seq.fill(40)("aba") ++ Seq.fill(40)("ba")).toDF("text")
    def counts(r: Int): Map[String, Long] =
      outOf(UnigramTrainer.train(syn, "text", 4, 16, 10, rounds = r, 0.75))
        .map(t => (t._1, t._2)).toMap
    val r1 = counts(1)
    val r2 = counts(2)
    // singles a/b are never chosen but stay in the inventory at cnt 0
    // (the r10-advice coverage contract)
    assert(r1 == Map("a" -> 0L, "b" -> 0L,
        "ab" -> 10L, "aba" -> 50L, "abab" -> 200L, "ba" -> 40L),
      s"round-1 segmentation drifted: $r1")
    assert(r2 == Map("a" -> 0L, "b" -> 0L,
        "aba" -> 50L, "ba" -> 50L, "abab" -> 200L),
      s"round-2 segmentation drifted: $r2")
    assert(r1 != r2, "the EM flip this fixture exists to exercise vanished")
  }

  test("tie-break: equal-cost segmentations choose the shorter last piece") {
    // [a b] and [ab] both cost 10; the composite key (total*8 + j)
    // prefers j=1 at the last position — the oracle's arg_min mirror
    val cost = Map("a" -> 5L, "b" -> 5L, "ab" -> 10L)
    assert(UnigramTrainer.viterbiPieces("ab", cost, 4).toSeq == Seq("a", "b"))
    // strict improvement still wins over the tie rule
    assert(UnigramTrainer.viterbiPieces("ab", Map("a" -> 5L, "b" -> 5L, "ab" -> 9L), 4)
      .toSeq == Seq("ab"))
  }

  test("pruning: the shrunk round-2 inventory drops low-count multis") {
    import spark.implicits._
    val syn = (Seq.fill(10)("ababa") ++ Seq.fill(200)("abab") ++
      Seq.fill(40)("aba") ++ Seq.fill(40)("ba")).toDF("text")
    // multiVocab=3 seeds only the top-3 substring-frequency multis
    // (ab:460, ba:300, aba:260 — abab never enters); round 1 counts
    // ab:410, aba:50, ba:40, and the shrink to ceil(3*0.34)=2 multis
    // drops 'ba' for round 2 — 'ba' the word must fall back to singles
    val out = outOf(UnigramTrainer.train(syn, "text", 4, 16, 3, 2, 0.34))
      .map(t => (t._1, t._2)).toMap
    assert(!out.contains("ba"), s"pruned piece resurfaced: $out")
    assert(out == Map("ab" -> 410L, "aba" -> 50L, "a" -> 40L, "b" -> 40L),
      s"post-prune segmentation drifted: $out")
  }

  test("inventory default is sized: VocabAuto = unigramVocabFor(|vocab|)") {
    assert(UnigramTrainer.unigramVocabFor(31) == 40)
    assert(UnigramTrainer.unigramVocabFor(1000000) == 8000)
    assert(UnigramTrainer.unigramVocabFor(100000000000L) == 32000) // ceiling
    assert(UnigramTrainer.unigramVocabFor(1) == 16) // floor
    val n = UnigramTrainer.wordTable(docs, "text", 16).count()
    val auto = outOf(UnigramTrainer.train(docs, "text", 4, 16,
      UnigramTrainer.VocabAuto, 2, 0.75))
    val pinned = outOf(UnigramTrainer.train(docs, "text", 4, 16,
      UnigramTrainer.unigramVocabFor(n), 2, 0.75))
    assert(auto == pinned)
  }
}
