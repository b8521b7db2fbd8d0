package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Ckpt._
import graft.functions.{TextFunctions => TF}

/**
 * Distributed quality-classifier TRAINING (r14 verdict #3 — the
 * fastText-style quality filter every curation pipeline actually trains:
 * Gopher/FineWeb/DCLM train a small linear model over hashed token
 * features and keep docs the model scores well): logistic-style
 * regression over K hashed token-count features + bias, trained by
 * FIXED-ROUND full-batch gradient descent with the hard-sigmoid
 * surrogate σ̂(z) = clamp(z/4 + 1/2, 0, 1) (the piecewise-linear sigmoid
 * of the low-precision-training literature) so every quantity in the
 * loop is an exact integer on both engines — no exp() ever crosses the
 * engine boundary (the q188 ln-space rule, taken one step further).
 *
 * Scale shape (the BpeTrainer K-scalars rule, q187/q189/q232
 * discipline): the weight vector is a (K+1)-sized DRIVER BigInt scalar;
 * each round costs ONE partial-aggregated corpus pass over the
 * checkpointed doc-grain feature table (K+1 codegen'd conditional sums,
 * no join, no window, no UDF — the per-doc probability is a plain
 * integer expression over the round's weight LITERALS). The oracle
 * unrolls the fixed rounds as MATERIALIZED HUGEINT CTE chains.
 *
 * Integer discipline, end to end:
 *  - features x_j = min(#tokens hashing to bucket j, 31) — the clip
 *    bounds |z| and every gradient term;
 *  - label ym = 1e6·[round(quality,6) ≥ 0.8] (q225's target predicate);
 *  - micro-scaled weights wm (1e6·w): zm = Σ wm_j·x_j + wm_bias is an
 *    exact micro-scaled long (|zm| ≤ (K·31+1)·|wm|max ≪ 2^63);
 *  - pm = (clamp(zm, ±2e6) + 2e6) div 4 ∈ [0, 1e6] — the shifted
 *    truncating division keeps the operand NONNEGATIVE, where Spark
 *    `div` == DuckDB `//` (the r11 positives-only rule);
 *  - gradient g_j = Σ (pm − ym)·x_j: |per-doc| ≤ 3.1e7, so a long sum
 *    holds ~3e11 docs — past that the sums ride DECIMAL(38,0) (the
 *    r13 rule; flip the agg cast, nothing else changes);
 *  - update wm_j ← wm_j − sgn(g_j)·((|g_j|·lrNum) div (lrDen·n)):
 *    sign-split so the truncating division only ever sees nonnegative
 *    operands (the kmeansCtes discipline), exact in driver BigInt and
 *    in the oracle's HUGEINT.
 */
object QualityClassifier {

  /** hashed token buckets (weight index K is the bias). */
  val K = 8

  /** per-doc per-bucket count clip — bounds |z| and the gradient. */
  val Clip = 31L

  /** Fused per-doc bucket counter (r15 optimization — the kernel
    * replaces explode(split) + per-token md5 + a token-grain groupBy:
    * same counts, zero token-sized rows, zero exchange; parity proven by
    * the cross-engine gate, whose oracle still spells the explode form).
    * `isNotNull` mirrors the explode's null-drop: `split(NULL)` is NULL
    * and `explode(NULL)` emitted no rows, so null-text docs never had a
    * feature row. */
  private val bucketCountsUdf =
    udf((text: String) => graft.functions.TokenBucketKernel.bucketCounts(text, K, Clip))

  /** doc-grain feature frame: (doc_id, ym, x0..x{K-1}), one corpus pass,
    * no shuffle (quality score and the kernel share one projection; the
    * K element_at reads collapse to one kernel call via codegen
    * subexpression elimination — the gopherMetrics pattern). */
  def features(docs: DataFrame): DataFrame =
    docs
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        (round(TF.qualityScore(col("text")), 6) >= 0.8).as("is_target"),
        bucketCountsUdf(col("text")).as("xs"))
      .select(col("doc_id") +:
        when(col("is_target"), 1000000L).otherwise(0L).as("ym") +:
        (0 until K).map(j => element_at(col("xs"), j + 1).as(s"x$j")): _*)

  /** micro-scaled hard-sigmoid probability as ONE integer SQL fragment
    * over columns x0..x{K-1}, with the round's weights folded in as
    * literals — interpolated VERBATIM into the DuckDB oracle (the q194
    * shared-fragment rule), so the two engines cannot diverge. */
  def pmSql(w: Array[Long]): String = {
    require(w.length == K + 1, s"expected ${K + 1} weights, got ${w.length}")
    val zm = (0 until K).map(j => s"${w(j)}L * x$j").mkString(" + ") +
      s" + ${w(K)}L"
    s"((greatest(least($zm, 2000000L), -2000000L) + 2000000L) div 4)"
  }

  /** Oracle twin of [[pmSql]]: same expression with HUGEINT weight
    * column references from the one-row weights CTE alias `w`. */
  def pmOracleSql(wAlias: String): String = {
    val zm = (0 until K).map(j => s"$wAlias.w$j * f.x$j").mkString(" + ") +
      s" + $wAlias.w$K"
    s"((greatest(least($zm, 2000000), -2000000) + 2000000) // 4)"
  }

  /** feat = the checkpointed feature table (consumers: every round's
    * gradient pass + any eval); weights(r) = micro-scaled weights AFTER
    * r rounds (weights(0) = init zeros). */
  final case class Trained(feat: DataFrame, n: Long, weights: Seq[Array[Long]])

  def train(docs: DataFrame, roundsN: Int = 3,
            lrNum: Long = 1L, lrDen: Long = 256L): Trained = {
    require(roundsN >= 0 && lrNum > 0 && lrDen > 0)
    val feat = features(docs).ckptLazy // consumers: R gradient passes + eval
    val n = feat.count() // doubles as the checkpoint materialization
    require(n > 0, "quality-classifier training needs a nonempty corpus")
    var w = Array.fill(K + 1)(0L)
    val hist = Vector.newBuilder[Array[Long]]
    hist += w.clone()
    for (_ <- 1 to roundsN) {
      // pm in its own projection so the (K+1) gradient sums read a
      // column, not K+1 re-evaluations of the weight polynomial
      val withPm = feat.select(
        col("ym") +: (0 until K).map(j => col(s"x$j")) :+
          expr(pmSql(w)).as("pm"): _*)
      val gExprs = (0 until K).map(j =>
        sum(expr(s"(pm - ym) * x$j")).as(s"g$j")) :+
        sum(expr("pm - ym")).as(s"g$K")
      val row = withPm.agg(gExprs.head, gExprs.tail: _*).head()
      val den = BigInt(lrDen) * n
      val next = new Array[Long](K + 1)
      var j = 0
      while (j <= K) {
        val gj = BigInt(row.getLong(j))
        val step = (gj.abs * lrNum) / den
        next(j) = (BigInt(w(j)) - BigInt(gj.signum) * step).toLong
        j += 1
      }
      w = next
      hist += w.clone()
    }
    Trained(feat, n, hist.result())
  }
}
