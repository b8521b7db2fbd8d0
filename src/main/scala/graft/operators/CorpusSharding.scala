package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-parameterized hash-sharded prefix sums — the primitive behind
 * greedy sequence packing (q61) and token-budget subsampling (q59).
 *
 * Both queries ride a deterministic md5 order and a running token sum.
 * A running sum is ONE window partition per key — with few huge keys
 * (16 fixed hex shards, or one partition per language) that serializes
 * a corpus-scale stage through a handful of tasks. The fix in both
 * cases is the same shape as `Similarity.lshBitsFor`: make the shard
 * count a PARAMETER sized to the corpus, not a fixture constant.
 *
 * - `packShards`: packing within 16^p hash shards; p chosen by
 *   `shardHexCharsFor` so each shard's serialized pass stays
 *   executor-sized at any corpus size. The shard id is part of the
 *   output contract (packs are emitted per shard), so p is semantic —
 *   conservation invariants (every doc in exactly one pack, token mass
 *   preserved) hold for every p (ShardingSpec).
 * - `tokenBudgetPrefix`: the per-language greedy budget prefix computed
 *   two-level — per-(lang, shard) running sums plus a shard-offset
 *   join — which is EXACTLY the single-window answer for every p,
 *   because the global (h, doc_id) order is shard-major: the shard is
 *   the leading hex chars of h, so concatenating shards in shard order
 *   reproduces the global hash order. p only changes the parallelism
 *   (ShardingSpec proves p=1 and p=2 give identical output).
 */
object CorpusSharding {

  /** Hex-prefix length so one shard holds ~`targetDocsPerShard` docs:
    * smallest p with 16^p >= nDocs / targetDocsPerShard (min 1). A 1B-doc
    * corpus at the 1M-docs-per-shard default gives p=3 (4,096 shards);
    * the sf0.1 fixture gives p=1 — the value the oracle pins. */
  def shardHexCharsFor(nDocs: Long, targetDocsPerShard: Long = 1000000L): Int = {
    val shardsNeeded = math.max(1.0, nDocs.toDouble / targetDocsPerShard)
    math.max(1, math.ceil(math.log(shardsNeeded) / math.log(16.0)).toInt)
  }

  private def withHashShard(docs: DataFrame, tokenCount: Column, prefixHexChars: Int,
                            extraCols: Seq[String] = Nil): DataFrame =
    docs
      .select(col("doc_id") +: extraCols.map(col) :+ tokenCount.as("toks")
        :+ md5(col("doc_id").cast("string").cast("binary")).as("h"): _*)
      .withColumn("shard", substring(col("h"), 1, prefixHexChars))

  /** Greedy sequence packing: docs in md5 order, pack_id = running-sum
    * div packTokens, packed independently within 16^prefixHexChars hash
    * shards so the pass parallelizes and a coordinator-free writer can
    * emit shards independently. Returns (shard, pack_id, n_docs,
    * n_tokens, fill). */
  def packShards(docs: DataFrame, tokenCount: Column, prefixHexChars: Int,
                 packTokens: Long): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    withHashShard(docs, tokenCount, prefixHexChars)
      .withColumn("cum_before", coalesce(
        sum("toks").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div $packTokens"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
        round(sum("toks").cast("double") / packTokens.toDouble, 6).as("fill"))
  }

  /** Per-language greedy token-budget prefix, two-level: (1) per-(lang,
    * shard) partial running sums, (2) aggregate-sized shard totals give
    * each shard its prefix offset and each language its budget, (3) the
    * offset joins back (broadcast — 16^p * n_langs rows). cum_before =
    * offset + within-shard running sum equals the single-window global
    * cumulative sum for every p. Returns the kept docs with (doc_id,
    * lang, toks, budget). `budgetDenom` keeps 1/denom of each
    * language's token mass. */
  def tokenBudgetPrefix(docs: DataFrame, tokenCount: Column, prefixHexChars: Int,
                        budgetDenom: Long): DataFrame =
    hashOrderPrefix(docs, tokenCount, prefixHexChars,
      expr(s"(sum(st) over (partition by lang)) div $budgetDenom"))

  /** [[weightedBudgetPrefix]] with the stratum KEY a parameter (r13 —
    * q173 strata are k-means cells, not languages; the two-level core
    * never cared what the stratum means). `budgets` is an
    * aggregate-sized (strataCol, budget) frame. */
  def weightedBudgetPrefixBy(docs: DataFrame, tokenCount: Column,
                             prefixHexChars: Int, budgets: DataFrame,
                             strataCol: String): DataFrame =
    hashOrderPrefixWith(docs, tokenCount, prefixHexChars,
      offsets => offsets.join(broadcast(budgets), Seq(strataCol)), strataCol)

  /** Stratified head — mixture REBALANCING: keep the first `nPerStratum`
    * docs of each language in deterministic md5 order (e.g. downsample
    * every language to the smallest language's size). Same two-level
    * machinery with a unit token count, so `cum_before < n` is exactly
    * `row_number() <= n` over the per-language hash order. */
  def stratumHead(docs: DataFrame, prefixHexChars: Int, nPerStratum: Long): DataFrame =
    hashOrderPrefix(docs, lit(1L), prefixHexChars, lit(nPerStratum))

  /** Per-language prefix against EXTERNAL budgets — the weight-driven
    * sampler composition (q88): `budgets` is an aggregate-sized
    * (lang, budget-in-tokens) frame from an upstream computation (e.g.
    * temperature mixture weights), broadcast into the offset join.
    * Languages absent from `budgets` are dropped; a budget exceeding a
    * language's token mass keeps the whole language (upweighting
    * saturates — epoch repetition, not subsampling, is the tool past
    * 1.0). Same two-level core, so shard-major order IS the global
    * md5 order at any prefix width. */
  def weightedBudgetPrefix(docs: DataFrame, tokenCount: Column, prefixHexChars: Int,
                           budgets: DataFrame): DataFrame =
    hashOrderPrefixWith(docs, tokenCount, prefixHexChars,
      offsets => offsets.join(broadcast(budgets), Seq("lang")))

  /** Shared two-level core: `budgetCol` is evaluated against the
    * aggregate-sized per-(lang, shard) totals frame (column `st`, window
    * over `lang` allowed), so a budget can be a corpus-derived expression
    * (q59's 20% of token mass) or a constant (q68's per-stratum head).
    *
    * LIFECYCLE: the sharded base feeds both the totals aggregation and
    * the main pass, so it is materialized ONCE behind a lazy
    * `localCheckpoint` (computed with the first action, plan truncated).
    * Unlike `persist()`, the checkpoint blocks live outside the catalog
    * cache and are released by the ContextCleaner as soon as the
    * returned plan is dropped — the operator owns its lifecycle and
    * long-lived sessions calling it repeatedly accumulate nothing
    * (ShardingSpec asserts the catalog cache stays empty). */
  private def hashOrderPrefix(docs: DataFrame, tokenCount: Column, prefixHexChars: Int,
                              budgetCol: Column): DataFrame =
    hashOrderPrefixWith(docs, tokenCount, prefixHexChars,
      _.withColumn("budget", budgetCol), "lang")

  /** `attachBudget` attaches a `budget` column to the aggregate-sized
    * per-(lang, shard) offsets frame (column `st` and window-over-lang
    * expressions allowed, as is a broadcast join against an external
    * aggregate-sized frame). */
  private def hashOrderPrefixWith(docs: DataFrame, tokenCount: Column, prefixHexChars: Int,
                                  attachBudget: DataFrame => DataFrame,
                                  strataCol: String = "lang"): DataFrame = {
    val base = withHashShard(docs, tokenCount, prefixHexChars, Seq(strataCol))
      .ckptLazy
    val shardTotals = base.groupBy(strataCol, "shard").agg(sum("toks").as("st"))
    val wOff = Window.partitionBy(strataCol).orderBy("shard")
    val offsets = attachBudget(shardTotals
      .withColumn("offset", coalesce(
        sum("st").over(wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))))
      .select(strataCol, "shard", "offset", "budget")
    val wIn = Window.partitionBy(strataCol, "shard").orderBy("h", "doc_id")
    base
      .withColumn("cum_in_shard", coalesce(
        sum("toks").over(wIn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), Seq(strataCol, "shard"))
      .withColumn("cum_before", col("offset") + col("cum_in_shard"))
      .where(col("cum_before") < col("budget"))
      .select("doc_id", strataCol, "toks", "budget")
  }

  /** DESCENDING-SCORE global token-budget prefix (r14 verdict #4 — the
    * importance-resampling selection step: keep the highest-scoring docs
    * until a global token budget is spent). Two-level like the hash
    * prefix, but the shard is the ORDER'S OWN leading bits (the r4
    * rule): integer scores band into `nBuckets` equal-width buckets over
    * the observed [lo, hi] range, and bucket-major (ascending bucket =
    * descending score) order IS the global (score desc, doc_id) order
    * because the bucket is a pure function of the score — equal scores
    * can never straddle a boundary, so the single-window answer is
    * reproduced for EVERY nBuckets (ShardingSpec proves 4 == 256).
    * Per-bucket running sums + an (≤nBuckets)-row offset join; the only
    * global window runs over the aggregate-sized bucket-totals frame.
    *
    * Skew: a bucket holds at most its score band's mass; a degenerate
    * corpus where most docs share ONE score value concentrates that band
    * in one partition — bounded by the largest equal-score class, which
    * for micro-scaled weight SUMS (q225's wm) is vanishingly small.
    *
    * `docs` must carry (doc_id, score, toks) via the given columns;
    * `budget` is a one-row (budget) frame (aggregate-sized, broadcast).
    * Returns kept docs (doc_id, score, toks, budget). */
  def scoreBudgetPrefix(docs: DataFrame, scoreCol: Column, tokenCount: Column,
                        nBuckets: Int, budget: DataFrame): DataFrame =
    scoreBudgetCums(docs, Seq("score" -> scoreCol), tokenCount, nBuckets, budget)
      .where(col("cum_before_score") < col("budget_score"))
      .select(col("doc_id"), col("s_score").as("score"), col("toks"),
        col("budget_score").as("budget"))

  /** Multi-score kept-FLAG variant (r15 optimization round): q239/q243
    * run the SAME budget selection under two/three different scores over
    * one doc-grain input, then left-join each kept set back — which paid
    * the base/banded checkpoints, the extent aggregate and a doc-grain
    * equi-join PER SCORE. Here all scores share one checkpointed base,
    * ONE extent aggregate (min/max of every score in one pass) and one
    * banded frame; each score keeps its own per-bucket running-sum
    * window (the per-score bucket is a different partition key — those
    * exchanges are inherent), and the kept flag is computed in place, so
    * no join back is needed. Returns ALL input docs as
    * (doc_id, <name>...) with flag columns 1L/0L — exactly the
    * left-join + na.fill(0) shape, proven flag-identical to N
    * independent [[scoreBudgetPrefix]] calls by ShardingSpec. */
  def scoreBudgetFlags(docs: DataFrame, scores: Seq[(String, Column)],
                       tokenCount: Column, nBuckets: Int, budget: DataFrame,
                       passThrough: Seq[String] = Nil): DataFrame = {
    val cums = scoreBudgetCums(docs, scores, tokenCount, nBuckets, budget,
      passThrough)
    cums.select(col("doc_id") +: passThrough.map(col) ++: scores.map {
      case (n, _) =>
        when(col(s"cum_before_$n") < col(s"budget_$n"), 1L).otherwise(0L).as(n)
    }: _*)
  }

  /** Shared core: per score `n`, the exact global descending-(score,
    * doc_id) running token sum `cum_before_n` (two-level: equal-width
    * score bands + per-band windows + an offsets join) and the broadcast
    * `budget_n`, all at doc grain. One base checkpoint and ONE combined
    * extent aggregate serve every score. */
  private def scoreBudgetCums(docs: DataFrame, scores: Seq[(String, Column)],
                              tokenCount: Column, nBuckets: Int,
                              budget: DataFrame,
                              passThrough: Seq[String] = Nil): DataFrame = {
    require(nBuckets >= 2, s"scoreBudgetPrefix needs >= 2 buckets, got $nBuckets")
    require(scores.nonEmpty)
    val base = docs
      .select(col("doc_id") +: passThrough.map(col) ++:
        tokenCount.cast("long").as("toks") +:
        scores.map { case (n, c) => c.cast("long").as(s"s_$n") }: _*)
      .ckptLazy // consumers: extent agg, banded pass
    val ext = base.agg(
      min(s"s_${scores.head._1}").as(s"lo_${scores.head._1}"),
      scores.tail.map { case (n, _) => min(s"s_$n").as(s"lo_$n") } ++
        scores.map { case (n, _) => max(s"s_$n").as(s"hi_$n") }: _*)
    // (hi - score) ∈ [0, hi - lo]: the shifted numerator keeps the
    // truncating div on NONNEGATIVE operands (the r11 rule); monotone
    // nonincreasing in score, so ascending bucket = descending score.
    // Width-form banding, NOT (hi-score)*nBuckets div range: md5-
    // derived scores span ~2^60 and the product form overflows long
    // (the r15 q239 bug) — width = range div nBuckets + 1 keeps every
    // operand <= the raw range and still lands buckets in [0, nBuckets)
    val banded = scores.foldLeft(base.crossJoin(broadcast(ext))) {
        case (df, (n, _)) => df.withColumn(s"bucket_$n",
          expr(s"(hi_$n - s_$n) div ((hi_$n - lo_$n) div ${nBuckets}L + 1)"))
      }
      .select(col("doc_id") +: passThrough.map(col) ++: col("toks") +:
        scores.flatMap { case (n, _) =>
          Seq(col(s"s_$n"), col(s"bucket_$n")) }: _*)
      .ckptLazy // consumers: per-score bucket totals, main pass
    scores.foldLeft(banded) { case (df, (n, _)) =>
      val wOff = Window.orderBy(s"bucket_$n")
      val offsets = banded.groupBy(s"bucket_$n").agg(sum("toks").as("st"))
        .withColumn(s"offset_$n", coalesce(
          sum("st").over(wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .crossJoin(broadcast(budget.select(col("budget").as(s"budget_$n"))))
        .select(s"bucket_$n", s"offset_$n", s"budget_$n")
      val wIn = Window.partitionBy(s"bucket_$n")
        .orderBy(col(s"s_$n").desc, col("doc_id"))
      df.withColumn(s"cum_in_$n", coalesce(
          sum("toks").over(wIn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .join(broadcast(offsets), Seq(s"bucket_$n"))
        .withColumn(s"cum_before_$n", col(s"offset_$n") + col(s"cum_in_$n"))
    }
  }
}
