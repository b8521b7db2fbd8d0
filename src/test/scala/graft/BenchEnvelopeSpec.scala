package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Runtime-regression gate (the r8 verdict's companion to PlanGuardSpec's
 * plan-shape gate): every query must complete within 3x its committed
 * clean-min envelope at sf0.01 (BENCH_ENVELOPE.json, regenerated via
 * scripts/make_envelope.py — which only ever tightens entries, so a
 * noisy regeneration can't relax the gate).
 *
 * Timing discipline mirrors Bench: noise on a shared host is strictly
 * additive, so the estimator is the MIN over runs — one warm pass, one
 * timed pass, and only a breach buys two more timed passes before the
 * failure is believed. The 3x margin (vs Bench's 2x "noisy" flag)
 * absorbs the spec environment's looser control (shared suite JVM,
 * whatever master the first suite pinned); a genuine 3x runtime
 * regression on a warm re-run is a code problem, not weather.
 *
 * The completeness assertion is the maintenance contract: a new query
 * without an envelope entry fails the build until the envelope is
 * regenerated with it.
 */
class BenchEnvelopeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bench-envelope-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"
  private val sfKey = "sf0.01"

  private def timeOnce(name: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sf).write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    sec
  }

  test("every query has a committed envelope entry (maintenance contract)") {
    val env = BenchEnvelope.load().getOrElse(sfKey, Map.empty)
    val missing = SparkEntry.queries.keySet -- env.keySet
    assert(missing.isEmpty,
      s"queries without a $sfKey envelope entry (regenerate via scripts/make_envelope.py): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("no query's clean min exceeds 3x its committed envelope at sf0.01") {
    val env = BenchEnvelope.load().getOrElse(sfKey, Map.empty)
    assert(env.nonEmpty, "BENCH_ENVELOPE.json must carry an sf0.01 section")
    val breaches = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      env.get(name).flatMap { limit0 =>
        val limit = 3.0 * limit0
        timeOnce(name) // warm: JIT + codegen + page cache, untimed
        val first = timeOnce(name)
        val best =
          if (first <= limit) first
          else math.min(first, (1 to 2).map(_ => timeOnce(name)).min)
        if (best > limit) Some(f"$name: $best%.2fs > 3x envelope ${limit0}%.2fs") else None
      }
    }
    assert(breaches.isEmpty, "runtime envelope breaches:\n" + breaches.mkString("\n"))
  }
}
