package graft.functions

/**
 * Fused per-row metric kernel for the q107 Gopher rule bundle: one pass
 * over the document computes all eight counts the rules compare. The
 * interpreted per-element HOF form (three `filter` lambdas + regexp
 * counts per row) measured +1.5 s on q97's single corpus pass at sf0.01
 * — the same 8-45x interpreted-vs-fused gap ShingleKernel closed for
 * the shingle queries (CLAUDE.md scale rule), so the counting moves
 * into one JVM call and the rule PREDICATES stay codegen'd integer
 * comparisons over the returned array.
 *
 * Definitions mirror the SQL oracle fragments exactly:
 *  - words: `split(text, wsClass, -1)` semantics (Java regex, the same
 *    engine Spark's `split` uses) — leading separators yield an empty
 *    first token, identical to DuckDB's string_split_regex;
 *  - lines: split on literal '\n' (keep trailing empties);
 *  - bullet line: `^ *[-*]` — spaces only, then '-' or '*';
 *  - ellipsis: non-overlapping "..." occurrences (what a regex scan
 *    counts); ellipsis line: endsWith("...");
 *  - alpha word: contains [A-Za-z].
 */
object GopherKernel {

  /** Metric indices in the returned array. */
  val N_WORDS = 0; val N_WCHARS = 1; val N_LINES = 2; val N_BULLET = 3
  val N_ELL_LINES = 4; val N_HASH = 5; val N_ELLIPSIS = 6; val N_ALPHA_WORDS = 7

  private val wsSplit = java.util.regex.Pattern.compile(TextFunctions.wsClass)

  def metrics(text: String): Array[Long] = {
    val out = new Array[Long](8)
    if (text == null) return out
    // single char scan: non-ws chars, '#', non-overlapping "..."
    var i = 0
    val n = text.length
    var dots = 0
    while (i < n) {
      val c = text.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (!isWs) out(N_WCHARS) += 1
      if (c == '#') out(N_HASH) += 1
      if (c == '.') {
        dots += 1
        if (dots == 3) { out(N_ELLIPSIS) += 1; dots = 0 }
      } else dots = 0
      i += 1
    }
    // words (split semantics identical to Spark's split / the oracle's
    // string_split_regex: limit -1 keeps trailing empties)
    val words = wsSplit.split(text, -1)
    out(N_WORDS) = words.length
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var j = 0
      var alpha = false
      while (j < word.length && !alpha) {
        val c = word.charAt(j)
        alpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        j += 1
      }
      if (alpha) out(N_ALPHA_WORDS) += 1
      w += 1
    }
    // lines on literal '\n'
    val lines = text.split("\n", -1)
    out(N_LINES) = lines.length
    var l = 0
    while (l < lines.length) {
      val line = lines(l)
      var j = 0
      while (j < line.length && line.charAt(j) == ' ') j += 1
      if (j < line.length && (line.charAt(j) == '-' || line.charAt(j) == '*'))
        out(N_BULLET) += 1
      if (line.endsWith("...")) out(N_ELL_LINES) += 1
      l += 1
    }
    out
  }
}
