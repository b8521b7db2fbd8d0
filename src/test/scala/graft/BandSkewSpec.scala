package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Proof for the r10 verdict's top item: `Dedup.hammingBandPairs`' capped
 * (production) path must size its buckets with a partial-aggregated
 * groupBy joined back — NEVER a Window over (chunk, chunk_val). A hot
 * boilerplate template shares all four 15-bit chunks, so its chunk_val
 * is exactly the Zipfian key the r4 lesson bans from window partitioning:
 * a window puts the whole B-row bucket in ONE task with no partial
 * aggregation and no AQE rescue. The groupBy collapses the hot bucket
 * map-side (one row per map partition per bucket crosses the shuffle)
 * and the stats table — bounded by the 4 x 2^15 chunk-value space —
 * broadcasts, so corpus rows never shuffle for sizing at all.
 *
 * Assertions (mirroring HotTokenSpec's exchange-metric probe):
 *  1. On a 1M-doc fixture where one signature covers 99.9% of docs, the
 *     bucket-stats aggregate's shuffle carries <1% of the 4M chunk rows.
 *  2. The executed CapAuto plan contains NO WindowExec anywhere.
 *  3. Correctness on the skewed fixture: every hot doc is connected to
 *     the bucket representative at hamming 0 (star edges preserve
 *     connectivity through the cap).
 */
class BandSkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("band-skew-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectPlans(a.executedPlan)
    case q: QueryStageExec => q +: collectPlans(q.plan)
    case other =>
      other +: (other.children ++ other.subqueries).flatMap(collectPlans)
  }

  /** First non-wrapper node under codegen/adapter/stage shells — used to
    * find the exchange whose DIRECT input is the bucket-stats partial
    * aggregate (the cold self-join's exchanges also contain that
    * aggregate somewhere in their subtree via the broadcast build side,
    * so a deep contains-check would over-match). */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => unwrap(w.child)
    case i: InputAdapter => unwrap(i.child)
    case q: QueryStageExec => unwrap(q.plan)
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case other => other
  }

  test("capped band path: hot bucket collapses map-side, no Window in the plan") {
    val n = 1000000L
    val nHot = 999000L
    // 99.9% of docs share one signature (the viral template); the rest
    // get spread-bit distinct signatures (id * 0x40000001 covers bits
    // 0..49, so cold chunk buckets stay small).
    val sig = spark.range(0, n, 1, 8).select(
      col("id").as("doc"),
      when(col("id") < nHot, lit(42L))
        .otherwise(col("id") * lit(0x40000001L)).as("sim"))
    val res = graft.operators.Dedup.hammingBandPairs(
      sig, maxHamming = 3, hotBucketCap = graft.operators.Dedup.CapAuto)
    res.write.mode("overwrite").format("noop").save()

    // 3. connectivity: the hot bucket's star edges pair every non-rep
    // hot doc with the rep (doc 0, the min (doc, sim) struct) at hamming 0
    val hotEdges = res.where(col("doc_a") === 0L && col("hamming") === 0)
    assert(hotEdges.count() == nHot - 1,
      "star edges must connect every hot doc to the representative")

    val plans = collectPlans(res.queryExecution.executedPlan)
    // 2. the banned pattern stays gone
    assert(plans.collect { case w: WindowExec => w }.isEmpty,
      "hammingBandPairs' capped path regressed to a (chunk, chunk_val) window")

    // 1. the bucket-stats aggregate's own exchange collapsed map-side:
    // ~1 row per (map partition, bucket), not one per chunk row
    val statsExchanges = plans.collect {
      case e: ShuffleExchangeLike => (e, unwrap(e.child))
    }.collect {
      case (e, a: BaseAggregateExec)
        if a.groupingExpressions.map(_.name).toSet == Set("chunk", "chunk_val") => e
    }
    assert(statsExchanges.nonEmpty, "expected the bucket-stats aggregate shuffle")
    val shuffled = statsExchanges.map(_.metrics("shuffleRecordsWritten").value).sum
    val chunkRows = 4 * n
    assert(shuffled < chunkRows / 100,
      s"expected map-side combine to collapse the hot bucket; " +
        s"$shuffled of $chunkRows chunk rows crossed the stats shuffle")
  }
}
