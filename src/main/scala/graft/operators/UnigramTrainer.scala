package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM (SentencePiece-style) subword tokenizer trainer (Kudo 2018,
 * "Subword Regularization: Improving Neural Network Translation Models
 * with Multiple Subword Candidates" — public method), the second
 * mainstream public tokenizer algorithm next to [[BpeTrainer]] (r9
 * verdict #3): seed a piece inventory from substring frequencies, then
 * iterate E-step (segment every word by its best piece decomposition
 * under current piece costs) and M-step (re-estimate piece costs from
 * the segmentation counts), shrinking the inventory between rounds.
 *
 * == The deterministic hard-EM variant, and why ==
 * The E-step is VITERBI (hard assignment), not forward-backward expected
 * counts: soft EM sums log-probabilities in floating point, whose
 * cross-engine summation-order parity is unprovable, while the Viterbi
 * DP below runs entirely over MICRO-SCALED INTEGER costs (round(-ln p x
 * 1e6) as BIGINT) — integer sums and comparisons are bit-identical in
 * any engine, so the whole training loop is oracle-able (q149 unrolls it
 * as materialized chained CTEs, the q78/q87/q138 pattern). Hard EM is
 * the documented approximation (Kudo's own implementation offers a
 * 1-best mode); the only float op per round is one ln per piece of
 * identical exact integers, under the repo's round-to-1e6 discipline.
 * Pruning "by loss contribution" takes its hard-EM form: a piece's loss
 * contribution under a Viterbi segmentation IS its usage count x cost,
 * so inter-round pruning keeps the top pieces by (count desc, piece
 * asc) and drops unused pieces (zero count = zero contribution);
 * single-char pieces are always retained for segmentation coverage.
 *
 * == Scale decomposition (the BpeTrainer discipline, held every round) ==
 * The corpus collapses ONCE into the distinct-word frequency table (the
 * Zipfian word key is only ever a partial-aggregated groupBy); seeding,
 * every E-step, and every M-step run over that VOCABULARY-sized table —
 * |V| rows, |V| x maxWordLen x maxPieceLen exploded substrings — never
 * the corpus. Per-round driver traffic is the piece-cost table
 * (inventory-sized, the aggregate-sized-collect rule). At 100 TB the
 * loop cost is independent of corpus size after the first aggregation.
 *
 * == Smoothing ==
 * Costs are add-one smoothed: cost(p) = round(-ln((c+1)/(tot+|V|)) x
 * 1e6). Retained-but-unused pieces (count 0) thus keep a finite cost —
 * no infinities anywhere, and the formula is identical in both engines.
 *
 * == Termination duality (the GraphRank/BpeTrainer pattern) ==
 * `rounds` is the fixed-round deterministic mode the oracle unrolls.
 * Between-round shrink is geometric (`shrink`); production callers can
 * run more rounds with the same contract — each round's decision data
 * is inventory-sized, so the driver never sees corpus-scale state.
 */
object UnigramTrainer {

  /** Sentinel default for `multiVocab`: resolve via [[unigramVocabFor]]
    * (the Dedup.CapAuto pattern — sized by default; oracles pin). */
  val VocabAuto: Int = -1

  /** Multi-char inventory sizing rule: 8 x sqrt(|distinct words|),
    * clamped to [16, 32000]. Heaps-flavored: the useful subword
    * inventory grows sublinearly with the word vocabulary (doubling the
    * vocabulary mostly re-uses existing morphemes); the ceiling is the
    * conventional production tokenizer size, the floor keeps tiny
    * corpora trainable. */
  def unigramVocabFor(nDistinctWords: Long): Int = {
    require(nDistinctWords > 0)
    val s = 8L * math.sqrt(nDistinctWords.toDouble).toLong
    math.max(16L, math.min(32000L, s)).toInt
  }

  /** Distinct-word frequency table — the one corpus-sized aggregation.
    * Words longer than `maxWordLen` are excluded (both engines, the
    * oracle's DP unroll bound); empty tokens never occur (whitespace
    * split yields non-empty runs between separators). */
  def wordTable(docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /**
   * Best-cost segmentation of one word under integer piece costs: DP
   * best(i) = min over j of best(i-j) + cost(word[i-j..i]), backtrace by
   * arg-min of the composite key (total x 8 + j) — total dominates, the
   * shorter last piece breaks ties; j <= maxPieceLen <= 7 keeps the key
   * collision-free. EXACTLY the recurrence the q149 oracle unrolls
   * (including the tie-break), so segmentations are engine-identical.
   * Fused per-word JVM kernel: the DP is genuinely sequential per word
   * (no codegen built-in exists), and it runs over the vocabulary-sized
   * word table only.
   */
  def viterbiPieces(
      word: String,
      cost: scala.collection.Map[String, Long],
      maxPieceLen: Int): Array[String] = {
    val L = word.length
    val INF = Long.MaxValue / 16
    val best = Array.fill(L + 1)(INF)
    best(0) = 0L
    var i = 1
    while (i <= L) {
      var j = 1
      val jm = math.min(maxPieceLen, i)
      while (j <= jm) {
        if (best(i - j) < INF) {
          cost.get(word.substring(i - j, i)) match {
            case Some(c) => if (best(i - j) + c < best(i)) best(i) = best(i - j) + c
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    require(best(L) < INF,
      s"word '$word' not coverable by the piece inventory (singles missing?)")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = L
    while (pos > 0) {
      var bj = -1
      var bkey = Long.MaxValue
      var j = 1
      val jm = math.min(maxPieceLen, pos)
      while (j <= jm) {
        if (best(pos - j) < INF) {
          cost.get(word.substring(pos - j, pos)) match {
            case Some(c) =>
              val key = (best(pos - j) + c) * 8 + j
              if (key < bkey) { bkey = key; bj = j }
            case None =>
          }
        }
        j += 1
      }
      out += word.substring(pos - bj, pos)
      pos -= bj
    }
    out.reverse.toArray
  }

  /** Add-one-smoothed micro-scaled integer costs of a count table —
    * positive, so Scala math.round (= HALF_UP) matches DuckDB's
    * half-away-from-zero round exactly. */
  private def costsOf(vc: Seq[(String, Long)]): Map[String, Long] = {
    val tot = vc.map(_._2).sum
    val nv = vc.size
    vc.iterator.map { case (p, c) =>
      (p, math.round(-math.log((c + 1.0) / (tot.toDouble + nv)) * 1e6))
    }.toMap
  }

  /**
   * Train; returns the final inventory as (piece, cnt, cost) — `cnt` the
   * final-round Viterbi usage count, `cost` the cost that PRODUCED that
   * segmentation (so applying [[viterbiPieces]] with the returned costs
   * reproduces `cnt` exactly: removing never-chosen candidates cannot
   * flip any arg-min under the unique composite tie-key —
   * UnigramTrainerSpec locks the property).
   */
  def train(
      docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 16,
      multiVocab: Int = VocabAuto, rounds: Int = 2,
      shrink: Double = 0.75): DataFrame =
    trainFromWordCounts(wordTable(docs, textCol, maxWordLen),
      maxPieceLen, multiVocab, rounds, shrink)

  /** [[train]] over a pre-aggregated (word, wc) table — the q93 one-pass
    * discipline: a caller that already built a per-doc tf table derives
    * the vocabulary from it instead of scanning the corpus again (q152).
    * Contract: `words0` is already length-filtered to the oracle's DP
    * unroll bound. */
  def trainFromWordCounts(
      words0: DataFrame,
      maxPieceLen: Int = 4,
      multiVocab: Int = VocabAuto, rounds: Int = 2,
      shrink: Double = 0.75): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 7
      && rounds >= 1 && shrink > 0 && shrink <= 1)
    val spark = words0.sparkSession
    import spark.implicits._
    val words = words0.select(col("word"), col("wc"))
      .ckptLazy // consumers: seeding + one job per round
    // all substrings up to maxPieceLen WITH multiplicity — pure codegen
    // (nested sequence transforms), no UDF before the aggregate
    val substrExpr =
      s"flatten(transform(sequence(1, length(word)), i -> " +
        s"transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), " +
        s"k -> substring(word, i, k - i + 1))))"
    val cand = words.select(col("wc"), explode(expr(substrExpr)).as("piece"))
      .groupBy("piece").agg(sum("wc").as("c"))
      .ckptLazy // consumers: singles, multi top-K
    val mV = if (multiVocab == VocabAuto) unigramVocabFor(words.count()) else multiVocab
    def collectCounts(df: DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // inventory-sized driver tables (the BpeTrainer decision-scalar rule)
    val singleCounts = collectCounts(cand.where(length(col("piece")) === 1))
    val singlePieces = singleCounts.map(_._1).toSet
    // global top-K = TakeOrderedAndProject, never a global window
    val seedMultis = collectCounts(cand.where(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece")).limit(mV))
    var vc: Seq[(String, Long)] = singleCounts ++ seedMultis
    var mCur = mV
    var costMap: Map[String, Long] = Map.empty
    var cnts: DataFrame = null
    for (r <- 1 to rounds) {
      costMap = costsOf(vc)
      val cm = costMap
      val mp = maxPieceLen
      val segUdf = udf((w: String) => viterbiPieces(w, cm, mp))
      cnts = words.select(col("wc"), explode(segUdf(col("word"))).as("piece"))
        .groupBy("piece").agg(sum("wc").as("c"))
        .ckptLazy // re-read: prune collect + output join
      if (r < rounds) {
        mCur = math.ceil(mCur * shrink).toInt
        val counted = collectCounts(cnts).toMap
        // singles always retained (coverage); multis pruned by hard-EM
        // loss contribution = usage count, ties on the piece string
        val nextSingles = singlePieces.toSeq.sorted
          .map(p => (p, counted.getOrElse(p, 0L)))
        val nextMultis = counted.iterator.filter(_._1.length > 1).toSeq
          .sortBy { case (p, c) => (-c, p) }.take(mCur)
        vc = nextSingles ++ nextMultis
      }
    }
    val costDf = costMap.toSeq.toDF("piece", "cost")
    val used = cnts.join(broadcast(costDf), "piece")
      .select(col("piece"), col("c").as("cnt"), col("cost"))
    // Coverage: single-char pieces never chosen in the final round stay
    // in the inventory with cnt 0, so viterbiPieces under the returned
    // model can encode ANY text over the training alphabet — the
    // returned map IS the round-`rounds` cost map (r10 advice: the
    // inner join silently dropped unused singles, making the production
    // encode path throw on characters absent from the usage counts).
    val zeroSingles = costDf.where(length(col("piece")) === 1)
      .join(cnts, Seq("piece"), "left_anti")
      .select(col("piece"), lit(0L).as("cnt"), col("cost"))
    used.unionByName(zeroSingles)
  }
}
