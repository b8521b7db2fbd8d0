package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column builders for large-scale training-data pipelines:
 * tokenization, language-ID heuristic, quality scoring, fingerprinting.
 * Everything here is composed from built-in (codegen'd) SQL functions —
 * no UDFs — so plans stay inside whole-stage codegen and push down
 * through Catalyst untouched.
 */
object TextFunctions {

  /** The whitespace class, spelled explicitly: identical to Java's `\s`
    * ([ \t\n\x0B\f\r]) — and, unlike `\s`, identical in RE2/DuckDB too,
    * whose `\s` omits vertical tab. Every tokenizer here and every
    * oracle `string_split_regex` uses this same class, so a document
    * containing U+000B cannot silently tokenize differently across
    * engines. */
  val wsClass: String = "[ \\t\\n\\x0B\\f\\r]+"

  /** Whitespace tokenization (the `documents` fixture is single-space
    * separated; the class keeps it robust to runs of whitespace). */
  def tokens(text: Column): Column = split(text, wsClass)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word set — the unit for set-based similarity. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** GPT-2-style pre-tokenizer pattern, restricted to the portable regex
    * subset shared by Java regex and RE2: contraction suffixes, letter
    * runs, digit runs, single non-alphanumeric marks. Counting these
    * matches approximates a BPE tokenizer's unit count far better than
    * whitespace splitting (punctuation and numbers become their own
    * tokens), while staying a pure codegen'd `regexp_count` — no
    * vocabulary file, no UDF. */
  val bpeTokenPattern: String = "'(s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** BPE-ish token count: matches of [[bpeTokenPattern]]. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern))

  /** The GPT-2-style pre-token stream itself (r13, the byte-level BPE
    * pre-tokenizer): every match of [[bpeTokenPattern]], in order. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeTokenPattern), lit(0))

  /** Word n-gram shingles (default 3): positions i..i+n-1 joined by a
    * space. Empty array when the document is shorter than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array())
  }

  /** Distinct shingle set. */
  def shingleSet(text: Column, n: Int = 3): Column = array_distinct(shingles(text, n))

  /** Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /**
   * Crude n-gram/stopword language-ID heuristic: count hits of
   * language-marker words, predict the argmax, 'und' (undetermined) when
   * nothing matches. Deliberately simple and SQL-expressible so the same
   * logic runs in the DuckDB oracle; a production pipeline would swap in
   * a character-n-gram model via the same column contract.
   */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => size(split(padded, s" $w ")) - 1).reduce(_ + _)
    val en = hits(Seq("the", "a", "of"))
    val de = hits(Seq("der", "und", "die"))
    val es = hits(Seq("el", "la", "los"))
    val fr = hits(Seq("le", "les", "des"))
    when(greatest(en, de, es, fr) === 0, "und")
      .when(en >= greatest(de, es, fr), "en")
      .when(de >= greatest(es, fr), "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /**
   * Document quality score in [0,1]: mean of
   *  - length score: min(1, n_tokens/64)
   *  - alpha ratio: fraction of [a-z ] characters
   *  - mean-token-length score: min(1, avg_len/8)
   * Mirrors the usual length/punctuation/stopword-ratio heuristics of
   * web-scale corpus filtering.
   */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(lit(1.0), n / 64.0)
    val alpha = length(regexp_replace(text, "[^a-z ]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val avgTok = length(text).cast("double") / greatest(n, lit(1.0))
    val tokScore = least(lit(1.0), avgTok / 8.0)
    (lenScore + alpha + tokScore) / 3.0
  }

  /**
   * Gopher-style quality-rule bundle (Rae et al. 2021, the document
   * filters of Appendix A) composing the single q24 scalar into
   * per-rule booleans: word-count window, mean word length window,
   * symbol-to-word ratio, bullet-line and ellipsis-line fractions,
   * alphabetic-word fraction. Every comparison is INTEGER-exact
   * (threshold fractions cross-multiplied — `10*symbols <= words`
   * instead of a float ratio), so the same predicate evaluates
   * bit-identically in any engine with no rounding discipline needed.
   * The composite keep is the conjunction ([[gopherKeep]]).
   * Per-line counts ride `filter` HOFs over the doc's own line array —
   * bounded per row, no shuffle.
   */
  private val gopherMetricsUdf =
    udf((text: String) => GopherKernel.metrics(text))

  /** The eight Gopher metric counts as one fused-kernel column (the
    * interpreted HOF form measured +1.5 s per corpus pass at sf0.01 —
    * the ShingleKernel lesson again); subexpression elimination keeps
    * the kernel at ONE evaluation per row however many rules read it. */
  def gopherMetrics(text: Column): Column = gopherMetricsUdf(text)

  def gopherRules(text: Column): Seq[(String, Column)] =
    gopherRulesFromMetrics(gopherMetrics(text))

  /** Rule predicates over a [[gopherMetrics]] column — pure codegen
    * integer comparisons. */
  def gopherRulesFromMetrics(m: Column): Seq[(String, Column)] = {
    import GopherKernel._
    def g(i: Int): Column = element_at(m, i + 1)
    val nWords = g(N_WORDS)
    Seq(
      "r_word_count" -> (nWords >= 50 && nWords <= 100000),
      "r_mean_word_len" ->
        (g(N_WCHARS) >= nWords * 3 && g(N_WCHARS) <= nWords * 10),
      "r_symbol_ratio" -> ((g(N_HASH) + g(N_ELLIPSIS)) * 10 <= nWords),
      "r_bullet" -> (g(N_BULLET) * 10 <= g(N_LINES) * 9),
      "r_ellipsis_lines" -> (g(N_ELL_LINES) * 10 <= g(N_LINES) * 3),
      "r_alpha_words" -> (g(N_ALPHA_WORDS) * 5 >= nWords * 4))
  }

  /** The composite Gopher gate: every rule passes. */
  def gopherKeep(text: Column): Column =
    gopherRules(text).map(_._2).reduce(_ && _)

  /**
   * PII/sensitive-span shapes (C4/CCNet-style cleaning), restricted to
   * the regex subset identical in Java regex and RE2 so the DuckDB
   * oracle runs the LITERAL same patterns: character classes, bounded
   * repetition, word boundaries — no lookaround, no backreferences.
   * The four shapes are mutually non-overlapping by construction
   * (digit-group widths differ: phone 3-3-4, id 3-2-4; IPv4 needs four
   * dot-separated 1-3 digit groups; the email local part is anchored on
   * '@'), so detection counts are independent of redaction order.
   * Order of (name, pattern, replacement tag).
   */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("idnum", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<ID>"))

  /** Redact every PII shape (all occurrences; replacement tags contain
    * no digits, so later patterns cannot match across earlier
    * replacements). Pure codegen `regexp_replace` chain — no UDF. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, rx, tag)) =>
      regexp_replace(c, rx, tag)
    }

  /** Min-hash-style document fingerprint: lexicographic min of per-token
    * md5 hex digests. Stable across engines (md5 is standardized), cheap,
    * and a 1-permutation MinHash — documents sharing it are near-dup
    * candidates. */
  def fingerprint(text: Column): Column =
    array_min(transform(tokenSet(text), t => md5(t)))

  /** SimHash over the token multiset (term-frequency weighted), pure Scala
    * kernel — exercised via a UDF because bit-bucketed popcount folding has
    * no built-in equivalent. 60-bit width with md5-prefix token hashes
    * ([[PortableHash.md5LongOf]]) so a SQL engine can recompute the exact
    * signature: bit j is set iff the +/-1 votes of bit j across all token
    * instances sum positive. */
  def simhash60(tokens: Seq[String]): Long = {
    // one md5 per DISTINCT token, votes weighted by its count — same
    // signature as hashing every instance (votes are additive), md5
    // calls drop from token instances to per-doc vocabulary
    val counts = new java.util.HashMap[String, Int]()
    tokens.foreach(t => counts.merge(t, 1, (a, b) => a + b))
    val acc = new Array[Int](60)
    counts.forEach { (t, c) =>
      val h = PortableHash.md5LongOf(t, 15)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
