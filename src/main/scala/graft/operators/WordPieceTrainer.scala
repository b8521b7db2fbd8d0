package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WordPiece tokenizer training (Schuster & Nakajima 2012; the likelihood
 * variant documented publicly in the HuggingFace tokenizers course —
 * public method): like BPE, iteratively merge the best adjacent symbol
 * pair over the vocabulary, but the merge CHOICE maximizes
 * score(x, y) = count(xy) / (count(x) * count(y)) — pairs whose parts
 * are individually rare merge first. Continuation symbols carry the
 * `##` prefix (a word-initial "a" and an in-word "##a" are DIFFERENT
 * symbols with different counts — the real WordPiece alphabet), and a
 * merge of (x, ##y) produces x+y with y's marker stripped.
 *
 * == Integer-exact score discipline (the q149/q153 bridge applied to
 * ratios) ==
 * The score is a ratio of exact integers; ranking ratios across rows
 * can't cross-multiply pairwise in an ORDER BY, so the engine DEFINES
 * the selection as argmax of the micro-scaled integer
 * `(n * 10^12) div (cx * cy)` with ties broken by the pair string —
 * deterministic, identical in both engines (DuckDB `//` equals Spark
 * `div` on positives), so the whole K-round loop unrolls as chained
 * CTEs in the oracle exactly like q87's BPE. (Near-ties inside one
 * 1e-12 quantum resolve by pair order — the documented trade the
 * micro-scaling discipline makes everywhere else; BASELINE.md "Oracle
 * float/integer boundary discipline".) Counts at this corpus scale keep
 * `n * 10^12` far below 2^63; a 100 TB corpus would size the scale
 * constant down via [[scoreScaleFor]].
 *
 * == Scale shape ==
 * Identical to [[BpeTrainer]] (the classic decomposition, held every
 * round): ONE corpus-sized aggregation into the distinct-word frequency
 * table; each round is a vocabulary-sized pair count + symbol count +
 * one collected decision scalar + a narrow sentinel-replace. Corpus
 * size never enters the loop.
 *
 * Sentinel machinery, greedy replace semantics, and the fixed-K oracle
 * mode are [[BpeTrainer]]'s, reused directly (its scaladoc carries the
 * cross-engine replace argument; BpeTrainerSpec pins the run-of-4 case).
 * Words containing `#` are filtered with the sentinel chars so the
 * `##` marker stays unambiguous (symbol identity is marker + chars).
 */
object WordPieceTrainer {

  import BpeTrainer.{S, E}

  /** Score scale: merge scores rank as (n * ScoreScale) div (cx * cy). */
  val ScoreScale: Long = 1000000000000L

  /** [[ScoreScale]] sizing rule: keep n * scale below 2^62 for headroom.
    * At the default 10^12 that admits pair counts to ~4.6e6 weighted
    * billions — fine to ~10^6-doc corpora; larger corpora pass the value
    * this returns. */
  def scoreScaleFor(totalTokens: Long): Long = {
    require(totalTokens > 0)
    var s = ScoreScale
    while (s > 1L && totalTokens > (1L << 62) / s) s /= 10L
    s
  }

  /** One training step's record: rank is 1-based merge order; `score`
    * is the micro-scaled integer the selection maximized. */
  case class WpMerge(merge_rank: Int, pair: String, n: Long, score: Long)

  /** (word, freq) vocabulary with the WordPiece marker contract: the
    * [[BpeTrainer.vocabulary]] filters plus no literal `#`. */
  def vocabulary(words: DataFrame, wordCol: String = "word"): DataFrame =
    words
      .where(length(col(wordCol)) >= 2 &&
        !col(wordCol).contains(S) && !col(wordCol).contains(E) &&
        !col(wordCol).contains("#"))
      .groupBy(col(wordCol).as("word")).agg(count(lit(1)).as("freq"))

  /** Initial encoding: first char bare, continuations `##`-prefixed —
    * each a sentinel-wrapped symbol. */
  def encodeChars(word: Column): Column =
    expr("array_join(transform(sequence(1, length(word)), " +
      s"i -> concat('$S', case when i = 1 then '' else '##' end, " +
      s"substring(word, i, 1), '$E')), '')")

  private def symbols(enc: Column): Column =
    split(expr("substring(enc, 2, length(enc) - 2)"), E + S)

  /** Per-symbol weighted counts over an encoded vocabulary — the score
    * denominator's source (vocabulary-sized, partial-aggregated). */
  def symbolCounts(encVocab: DataFrame): DataFrame =
    encVocab
      .select(col("freq"), explode(symbols(col("enc"))).as("sym"))
      .groupBy("sym").agg(sum("freq").as("c"))

  /** Merged symbol of pair "x ##y": x with y's marker stripped. */
  def mergedSymbol(pair: String): String = {
    val Array(x, y) = pair.split(" ", 2)
    x + y.stripPrefix("##")
  }

  /** Run the merge loop; returns (merge table, final encoded vocabulary).
    *
    * @param vocab    (word, freq) from [[vocabulary]]
    * @param merges   max merges K
    * @param minCount early-exit floor on the winning pair's raw count
    *                 (merging hapax pairs is pointless); 0 = fixed-K
    *                 deterministic oracle mode
    * @param scale    score scale ([[ScoreScale]]; size via
    *                 [[scoreScaleFor]] for very large corpora)
    */
  def trainWithVocab(
      vocab: DataFrame,
      merges: Int,
      minCount: Long = 2L,
      scale: Long = ScoreScale): (DataFrame, DataFrame) = {
    val spark = vocab.sparkSession
    // r12 overflow guard: every pair's weighted count n is bounded by the
    // corpus's total adjacent-symbol slots (sum of freq * (len-1)); if
    // n * scale could cross 2^62, non-ANSI Spark would WRAP silently
    // where the DuckDB oracle raises — fail loudly with the sizing-rule
    // remedy instead. One vocabulary-sized aggregate, once per train.
    val slotRow = vocab.agg(
        coalesce(sum(expr("freq * (length(word) - 1)")), lit(0L)),
        coalesce(sum(expr("freq * length(word)")), lit(0L)))
      .collect()(0)
    val pairSlots = math.max(1L, slotRow.getLong(0))
    require(scale <= (1L << 62) / pairSlots,
      s"scale=$scale overflows 2^62 at $pairSlots weighted pair slots; " +
        s"pass scale = scoreScaleFor($pairSlots) = ${scoreScaleFor(pairSlots)} " +
        "and mirror it in any cross-engine oracle SQL")
    // r13 (r12 advice): the guard above bounds the NUMERATOR n*scale
    // only; the denominator cx*cy is bounded by (total symbol
    // occurrences)^2, which silently wraps in non-ANSI Spark once the
    // corpus carries more than sqrt(2^63) ~ 3.03e9 weighted symbol
    // slots — same loud failure, same remedy class (shard the
    // vocabulary or pre-scale freq).
    val symSlots = math.max(1L, slotRow.getLong(1))
    require(symSlots <= 3037000499L, // floor(sqrt(2^63))
      s"$symSlots weighted symbol slots: a symbol-count product cx*cy " +
        "can cross 2^63 and wrap silently in non-ANSI Spark, diverging " +
        "from the oracle — shard the vocabulary or pre-scale freq " +
        "before training")
    // NB (r15): the BpeTrainer lazy-round change was TRIED here too and
    // measured SLOWER (q160 1.19 → 1.49 s, q161 1.56 → 2.27 s same
    // session) — unlike BPE's single-consumer rounds, the win plan
    // reads enc through TWO aggregate subtrees (pairCounts +
    // symbolCounts) plus a join, and folding the materialization into
    // that fused job beats AQE's stage-by-stage view; rounds stay
    // eager.
    var enc = vocab
      .select(encodeChars(col("word")).as("enc"), col("freq"))
      .ckptEager
    val out = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    var k = 1
    var stop = false
    while (k <= merges && !stop) {
      val pc = BpeTrainer.pairCounts(enc)
      val sc = symbolCounts(enc)
      // ONE collected decision scalar per round (the BpeTrainer rule):
      // symbol tables are vocabulary-sized, the two joins are
      // aggregate-against-aggregate
      val win = pc
        .withColumn("x", expr("element_at(split(pair, ' '), 1)"))
        .withColumn("y", expr("element_at(split(pair, ' '), 2)"))
        .join(sc.select(col("sym").as("x"), col("c").as("cx")), "x")
        .join(sc.select(col("sym").as("y"), col("c").as("cy")), "y")
        .withColumn("score", expr(s"(n * $scale) div (cx * cy)"))
        .orderBy(col("score").desc, col("pair")).limit(1)
        .select("pair", "n", "score").collect()
      if (win.isEmpty || win(0).getLong(1) < minCount) stop = true
      else {
        val pair = win(0).getString(0)
        out += WpMerge(k, pair, win(0).getLong(1), win(0).getLong(2))
        val Array(x, y) = pair.split(" ", 2)
        enc = enc
          .withColumn("enc", replace(col("enc"),
            lit(S + x + E + S + y + E), lit(S + mergedSymbol(pair) + E)))
          .ckptEager
        k += 1
      }
    }
    import spark.implicits._
    (out.toSeq.toDF("merge_rank", "pair", "n", "score"), enc)
  }

  /** [[trainWithVocab]], merge table only. */
  def train(vocab: DataFrame, merges: Int, minCount: Long = 2L,
            scale: Long = ScoreScale): DataFrame =
    trainWithVocab(vocab, merges, minCount, scale)._1

  /** [[vocabulary]] from an already-aggregated (word, count) table — the
    * q93/q152 one-pass discipline (a caller with a per-doc tf table
    * derives the vocabulary from it, no second corpus scan). Same
    * filter contract as [[vocabulary]]. */
  def vocabularyFromCounts(
      wordCounts: DataFrame, wordCol: String = "word",
      countCol: String = "cnt"): DataFrame =
    wordCounts
      .where(length(col(wordCol)) >= 2 &&
        !col(wordCol).contains(BpeTrainer.S) &&
        !col(wordCol).contains(BpeTrainer.E) &&
        !col(wordCol).contains("#"))
      .groupBy(col(wordCol).as("word")).agg(sum(col(countCol)).as("freq"))

  /** Symbol inventory of a trained encoding (the [[encodeGreedy]]
    * vocabulary): every distinct symbol of the final encoded vocabulary
    * — alphabet plus merged pieces. Inventory-sized driver collect. */
  def inventory(encVocab: DataFrame): Set[String] =
    encVocab.select(explode(symbols(col("enc"))).as("sym")).distinct()
      .collect().map(_.getString(0)).toSet

  /**
   * The PRODUCTION ENCODE path — WordPiece does NOT replay merges at
   * apply time; it greedily takes the LONGEST vocabulary piece matching
   * at each position (maximal munch, the published algorithm), with
   * continuations matched against their `##` forms. `vocabSet` is the
   * final symbol inventory ([[symbolCounts]] of the trained encoding's
   * symbols — alphabet plus every merged symbol). A position with no
   * matching piece emits the single-char symbol regardless (characters
   * of trained words are always in the alphabet; a genuinely novel
   * character is emitted in its position-marked single-char form —
   * `##`-prefixed at non-initial positions, matching the oracle's
   * COALESCE one-char advance — mirroring the unigram trainer's
   * coverage contract).
   */
  def encodeGreedy(word: String, vocabSet: Set[String]): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val prefix = if (i == 0) "" else "##"
      var len = word.length - i
      var hit = -1
      while (len >= 1 && hit < 0) {
        if (vocabSet.contains(prefix + word.substring(i, i + len))) hit = len
        else len -= 1
      }
      val take = if (hit < 0) 1 else hit
      out += prefix + word.substring(i, i + take)
      i += take
    }
    out.toArray
  }
}
