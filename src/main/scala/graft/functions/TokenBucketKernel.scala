package graft.functions

import java.util.regex.Pattern

/**
 * Fused per-doc token→md5→bucket counting (r15 optimization round — the
 * q234/OuterProductSumAgg discipline applied to the hashed-feature
 * passes): `QualityClassifier.features` and the DSIR doc grain both
 * spelled "bucket-count the tokens" as
 *   explode(split(text)) → md5/conv per token ROW → groupBy(doc, b)
 * which fans every document out to one row PER TOKEN before partial
 * aggregation ever sees it — the explode volume and the per-row
 * hash-aggregate probes, not the md5 math, dominate the pass (measured:
 * the fused form cuts the q235 feature pass ~2x and removes the
 * token-grain exchange entirely). Here each document costs ONE kernel
 * call that splits, hashes and counts into a primitive long[] — the
 * downstream frame is doc-grain from the first projection, so nothing
 * token-sized ever crosses a shuffle.
 *
 * Parity contract (the reason this is a drop-in): tokenization is the
 * exact [[TextFunctions.wsClass]] regex with Java's `split(re, -1)`
 * semantics — identical to Spark's `split(text, re)` (limit −1: leading
 * and trailing empty tokens kept); the bucket is
 * [[PortableHash.md5LongOf]](token, 15) % nBuckets, the same
 * `cast(conv(substr(md5(token),1,15),16,10) as bigint) % n` every
 * oracle spells (nonnegative 60-bit value, so `%` == `pmod`). The
 * DuckDB oracles recompute the explode form independently, so the
 * cross-engine gate re-proves the fusion at every scale factor.
 */
object TokenBucketKernel {

  private val ws = Pattern.compile(TextFunctions.wsClass)

  /** Per-bucket token counts for one document: long[nBuckets], counts
    * clipped at `clip` when clip > 0 (QualityClassifier's feature clip;
    * pass 0 for unclipped DSIR counts). `hexChars` is the md5-prefix
    * width of the caller's hash convention (15 for the DSIR/quality
    * family, 8 for q79's 32-bit-prefix buckets). */
  def bucketCounts(text: String, nBuckets: Int, clip: Long,
                   hexChars: Int = 15): Array[Long] = {
    val out = new Array[Long](nBuckets)
    val toks = ws.split(text, -1)
    var i = 0
    while (i < toks.length) {
      out((PortableHash.md5LongOf(toks(i), hexChars) % nBuckets).toInt) += 1L
      i += 1
    }
    if (clip > 0L) {
      var j = 0
      while (j < nBuckets) {
        if (out(j) > clip) out(j) = clip
        j += 1
      }
    }
    out
  }

  /** Σ a(i) — the doc's token count read back off its bucket vector. */
  def sum(a: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s
  }

  /** Σ a(i)·b(i) — per-doc weight against a broadcast per-bucket ratio
    * vector (exact integer, same terms as the (doc,b)-grain `sum(c*r)`
    * it replaces: absent buckets contribute c=0). Overflow-CHECKED
    * (r15 ADVICE #3, mirroring WordPieceTrainer's 2^63 guard): with
    * |b(i)| up to ~6e7 micro-scaled log-ratios the envelope holds for
    * any realistic document, but non-ANSI Spark conventions elsewhere
    * would make a silent wrap the failure mode — Math.multiplyExact /
    * addExact turn it into a loud ArithmeticException instead. */
  def dot(a: Array[Long], b: Array[Long]): Long = {
    require(a.length == b.length,
      s"bucket-vector dot: mismatched lengths ${a.length} vs ${b.length}")
    var s = 0L
    var i = 0
    while (i < a.length) {
      s = Math.addExact(s, Math.multiplyExact(a(i), b(i)))
      i += 1
    }
    s
  }
}
