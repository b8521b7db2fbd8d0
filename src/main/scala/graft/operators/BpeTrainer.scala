package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-merge BPE tokenizer training (Sennrich, Haddow & Birch 2016,
 * "Neural Machine Translation of Rare Words with Subword Units" — public
 * method): iteratively count adjacent symbol pairs over the vocabulary,
 * merge the most frequent pair, repeat. Extends q85's single pair count
 * (the reference-free LLM-pipeline mandate) into the real trainer loop.
 *
 * == Scale decomposition ==
 * The classic one, held EVERY round: the corpus collapses into a
 * distinct-word frequency table once (the Zipfian word key is only ever a
 * partial-aggregated groupBy), and all per-round work — pair explode,
 * pair count, merge application — runs over that VOCABULARY-sized table
 * (|V| rows, |V| x avg_len exploded pairs), never the corpus. At 100 TB
 * the corpus is billions of rows but |V| stays O(millions); the loop cost
 * is independent of corpus size after the first aggregation.
 *
 * == Iterative-termination duality (the r5 GraphRank pattern) ==
 * Production mode stops when the best pair's count drops below
 * `minCount` (merging singletons is pointless — the standard stopping
 * heuristic); the decision scalar is ONE collected row per round
 * (aggregate-sized). `minCount = 0` runs exactly `merges` rounds —
 * the deterministic mode the DuckDB oracle unrolls as materialized
 * chained CTEs (q87, the q78 oracle pattern).
 *
 * == Merge application: sentinel-encoded greedy replace ==
 * A symbol sequence is one string with each symbol wrapped in \u0001
 * (start) / \u0002 (end): ["ab","c"] encodes as
 * "\u0001ab\u0002\u0001c\u0002". Applying merge (x, y) is then a plain
 * `replace` of "\u0001x\u0002\u0001y\u0002" with "\u0001xy\u0002" — and
 * because both Spark (UTF8String.replace) and DuckDB scan left-to-right
 * and resume AFTER the matched region, this is EXACTLY BPE's greedy
 * non-overlapping semantics ("aaaa" + (a,a) -> ["aa","aa"]; "aaa" ->
 * ["aa","a"]), identical in both engines (BpeTrainerSpec pins the
 * run-of-4 case). A naive space-separated form breaks on even runs (the
 * consumed separator erases the next match's leading boundary); the
 * per-symbol sentinels make every match consume exactly two whole
 * symbols. Symbols never contain whitespace (words are
 * whitespace-tokenized), and words containing the sentinel codepoints
 * themselves are filtered up front (control chars — absent from any real
 * corpus, but the filter makes the encoding injective unconditionally).
 *
 * No float anywhere: pair strings and counts are exact, so cross-engine
 * parity needs no rounding discipline.
 */
object BpeTrainer {

  /** Symbol start / end sentinels (SOH / STX control chars). */
  val S = "\u0001"
  val E = "\u0002"

  /** One training step's record: rank is 1-based merge order. */
  case class Merge(merge_rank: Int, pair: String, n: Long)

  /** Distinct-word frequency table from a corpus of whitespace-split
    * words: the ONE corpus-sized aggregation of the whole train loop.
    * Matches q85's vocabulary convention (single-char words carry no
    * pairs and are dropped). */
  def vocabulary(words: DataFrame, wordCol: String = "word"): DataFrame =
    words
      .where(length(col(wordCol)) >= 2 &&
        !col(wordCol).contains(S) && !col(wordCol).contains(E))
      .groupBy(col(wordCol).as("word")).agg(count(lit(1)).as("freq"))

  /** Initial sentinel encoding: every character its own symbol.
    * substring-based (not split-on-empty) so the oracle's
    * `list_transform(range(...), substr)` generates identically. */
  def encodeChars(word: Column): Column =
    expr("array_join(transform(sequence(1, length(word)), " +
      s"i -> concat('$S', substring(word, i, 1), '$E')), '')")

  /** Symbol list of an encoded sequence (strip the outer sentinels, split
    * on the end+start boundary; control chars are regex-literal). */
  private def symbols(enc: Column): Column =
    split(expr("substring(enc, 2, length(enc) - 2)"), E + S)

  /** Adjacent-pair explode + weighted count over an encoded vocabulary —
    * the per-round aggregation, exposed for the q87 plan guard (the
    * Generate must sit ABOVE the word-level aggregate: pairs explode over
    * the vocabulary, never the corpus). Pair key is "x y" (symbols are
    * whitespace-free, so the space join is unambiguous). */
  def pairCounts(encVocab: DataFrame): DataFrame =
    encVocab
      .select(col("freq"), symbols(col("enc")).as("syms"))
      // a fully-merged word has ONE symbol; Spark's sequence(1, 0) goes
      // DESCENDING (would hit index 0), so the single-symbol case must be
      // an explicit empty array (explode drops it) — DuckDB's exclusive
      // range(1, 1) is empty by construction
      .select(col("freq"), explode(expr(
        "case when size(syms) < 2 then slice(syms, 1, 0) else " +
          "transform(sequence(1, size(syms)-1), " +
          "i -> concat(element_at(syms, i), ' ', element_at(syms, i+1))) end")).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))

  /** Sentinel-encode a (word, freq) vocabulary. */
  def encode(vocab: DataFrame): DataFrame =
    vocab.select(encodeChars(col("word")).as("enc"), col("freq"))

  /** BYTE-LEVEL initial sentinel encoding (GPT-2's byte alphabet —
    * Radford et al. 2019 train BPE over raw bytes so no input is ever
    * OOV; their byte-to-printable-unicode table exists only to make
    * symbols displayable): each byte becomes its 2-hex-digit lowercase
    * code, the portable display alphabet BOTH engines can generate
    * (DuckDB `lpad(lower(to_hex(ord(c))), 2, '0')` — the fixture
    * contract is ASCII, where char == UTF-8 byte, the same bridge q150
    * already stands on). Hex symbols are whitespace-free by
    * construction, so the sentinel machinery, the "x y" pair keys and
    * the greedy `replace` semantics all apply UNCHANGED — a merged
    * symbol is just a longer hex string ("74 68" -> "7468" = "th"). */
  def encodeByteHex(word: Column): Column =
    expr("array_join(transform(sequence(1, length(word)), " +
      s"i -> concat('$S', lpad(lower(hex(ascii(substring(word, i, 1)))), 2, '0'), '$E')), '')")

  /** Run the merge loop; returns (merge table, final encoded vocabulary).
    * The merge table (merge_rank, pair, n) IS the trained tokenizer; the
    * final vocabulary's symbol sequences are the training by-product
    * (each word segmented under the learned merges).
    *
    * @param vocab    (word, freq) from [[vocabulary]]
    * @param merges   max merges K
    * @param minCount early-exit floor: stop when the best pair's count
    *                 falls below it; 0 = deterministic fixed-K (oracle
    *                 mode)
    */
  def trainWithVocab(
      vocab: DataFrame,
      merges: Int,
      minCount: Long = 2L): (DataFrame, DataFrame) =
    trainEncoded(encode(vocab), merges, minCount)

  /** [[trainWithVocab]] over an ALREADY sentinel-encoded (enc, freq)
    * table — the shared merge loop behind both alphabets (r13: char
    * symbols via [[encode]], byte-hex symbols via [[encodeByteHex]];
    * the loop itself never looks inside a symbol). */
  def trainEncoded(
      enc0: DataFrame,
      merges: Int,
      minCount: Long = 2L): (DataFrame, DataFrame) = {
    val spark = enc0.sparkSession
    // LAZY per-round checkpoints (r15): each round's winner collect is
    // the round's first action, so it materializes the checkpoint as
    // part of its own job — the eager form paid one extra scheduled job
    // per merge round for nothing. Live memory and lineage depth are
    // unchanged (each round still truncates at its boundary once
    // materialized).
    var enc = enc0.ckptLazy
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 1
    var stop = false
    while (k <= merges && !stop) {
      // ONE collected row per round — the aggregate-sized decision scalar
      val win = pairCounts(enc).orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (win.isEmpty || win(0).getLong(1) < minCount) stop = true
      else {
        val pair = win(0).getString(0)
        out += Merge(k, pair, win(0).getLong(1))
        val Array(x, y) = pair.split(" ", 2)
        enc = enc
          .withColumn("enc", replace(col("enc"),
            lit(S + x + E + S + y + E), lit(S + x + y + E)))
          .ckptLazy
        k += 1
      }
    }
    import spark.implicits._
    (out.toSeq.toDF("merge_rank", "pair", "n"), enc)
  }

  /** [[trainWithVocab]], merge table only. */
  def train(vocab: DataFrame, merges: Int, minCount: Long = 2L): DataFrame =
    trainWithVocab(vocab, merges, minCount)._1

  /** [[vocabulary]] from an already-aggregated (word, count) table —
    * lets a caller that also needs per-document counts pay ONE corpus
    * pass for both (q93: tf feeds the vocabulary AND the apply join).
    * Same filter contract as [[vocabulary]]. */
  def vocabularyFromCounts(
      wordCounts: DataFrame, wordCol: String = "word",
      countCol: String = "cnt"): DataFrame =
    wordCounts
      .where(length(col(wordCol)) >= 2 &&
        !col(wordCol).contains(S) && !col(wordCol).contains(E))
      .groupBy(col(wordCol).as("word")).agg(sum(col(countCol)).as("freq"))

  /**
   * The APPLY path — tokenize words under an already-trained merge list
   * (what production runs per corpus batch once training is done): the
   * K merges replay as K sentinel `replace`s in training order, a
   * stateless narrow per-row transform (merge list lives in the plan as
   * literals — no join, no state, nothing corpus-sized). Callers apply
   * it to the DISTINCT-word table and join back to per-doc counts, so
   * the replace chain runs |V| times, not once per corpus token.
   * Greedy left-to-right semantics are byte-identical to training's
   * (same `replace` kernel — the BpeTrainerSpec run-of-4 contract).
   */
  def applyMerges(words: DataFrame, wordCol: String, merges: Seq[String],
                  encoder: Column => Column = encodeChars): DataFrame =
    merges.foldLeft(words.withColumn("enc", encoder(col(wordCol)))) {
      (df, pair) =>
        val Array(x, y) = pair.split(" ", 2)
        df.withColumn("enc",
          replace(col("enc"), lit(S + x + E + S + y + E), lit(S + x + y + E)))
    }

  /** Token count of a sentinel-encoded sequence: one symbol per end
    * sentinel (single char, so two length calls — no split/array). */
  def symbolCount(enc: Column): Column =
    (length(enc) - length(replace(enc, lit(E), lit("")))).cast("long")
}
