package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FalsePositiveFilter

/**
 * r13 verdict #5 — the last documented reference-fidelity gap, closed:
 * `FalsePositiveFilter.matchCounts(refSeriesMode = "concat")` run over
 * the RAW observation rows (src/test/resources/fp_obs_golden.csv, dumped
 * by scripts/e2e_compare/gen_fp_golden.py from the reference's own
 * `split_references_and_anomalies` output) must reproduce every match
 * count and keep flag the reference's `false_positive_filter` computed
 * over its listdir-ordered cross-trace concatenated series
 * (fp_match_golden.csv) — including the counts that only exist BECAUSE
 * of concatenation (exclusion zones and candidate windows crossing
 * trace boundaries). MatchKernelSpec proves the KERNEL reproduces the
 * counts from the reference's ready-made arrays; this spec proves the
 * distributed OPERATOR builds the same arrays from the table.
 */
class FpConcatGoldenSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fp-concat-golden-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resourceLines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"$name missing from test resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    finally in.close()
  }

  test("concat-mode matchCounts reproduces every reference count and keep flag, " +
      "boundary-straddling patterns included") {
    val traceOrder = resourceLines("/fp_trace_order.txt").filter(_.nonEmpty)
    assert(traceOrder.size >= 2, "golden must span multiple traces")

    // golden expectations: case id is "<window_key>:<feature>@<maxd>"
    val expected = resourceLines("/fp_match_golden.csv").tail.map { l =>
      val f = l.split(",", -1)
      val id = f(0)
      val at = id.lastIndexOf('@')
      val colon = id.lastIndexOf(':', at)
      val wk = id.substring(0, colon)
      val feat = id.substring(colon + 1, at)
      val maxd = id.substring(at + 1).toDouble
      (maxd, wk, feat) -> (f(2).toInt, f(3) == "1")
    }.toMap
    val maxds = expected.keySet.map(_._1)
    assert(maxds.size == 2, s"expected two max_distance sweeps, got $maxds")

    val obsUrl = getClass.getResource("/fp_obs_golden.csv")
    assert(obsUrl != null, "fp_obs_golden.csv missing from test resources")
    val obs = spark.read.option("header", "true").csv(obsUrl.toString)
      .select(col("window_key"), col("trace_id"),
        col("ano_id").cast("long").as("ano_id"),
        col("timestamp").cast("long").as("timestamp"),
        col("type_data").cast("int").as("type_data"),
        col("feature"), col("value").cast("double").as("value"))
    // the reference's cols_to_visit order — INCLUDING its bookkeeping
    // columns (original_filename coerces to float via Python's
    // underscore separator: float("1_1") == 11.0), whose match counts
    // participate in the argmin fallback and so shape the keep flags
    val featIdx = Map("f0" -> 0, "f1" -> 1, "f2" -> 2, "f3" -> 3,
      "original_filename" -> 4, "timestamp" -> 5, "ano_id" -> 6)

    for (maxd <- maxds.toSeq.sorted) {
      val got = FalsePositiveFilter.matchCounts(
          obs, featIdx, maxDistance = maxd, matchCountKeep = 5,
          patternFromRefWindow = true,
          refSeriesMode = "concat", traceOrder = traceOrder)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getInt(2), r.getBoolean(3))).toMap
      val cases = expected.collect { case ((`maxd`, wk, ft), v) => (wk, ft) -> v }
      assert(cases.nonEmpty)
      assert(got.keySet == cases.keySet,
        s"window/feature sets differ at maxd=$maxd")
      for (((wk, ft), (wantN, wantKept)) <- cases) {
        val (gotN, gotKept) = got((wk, ft))
        assert(gotN == wantN,
          s"$wk:$ft@$maxd: operator count $gotN != reference $wantN")
        assert(gotKept == wantKept,
          s"$wk:$ft@$maxd: operator kept $gotKept != reference $wantKept")
      }
    }

    // and the divergence the per-trace scale path documents is REAL on
    // this fixture: at least one (window, feature, maxd) count differs
    // between the two modes (the boundary phantom / cross-boundary
    // exclusion), which is exactly why concat mode exists
    val maxd0 = maxds.min
    val per = FalsePositiveFilter.matchCounts(
        obs, featIdx, maxDistance = maxd0, matchCountKeep = 5,
        patternFromRefWindow = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val conc = FalsePositiveFilter.matchCounts(
        obs, featIdx, maxDistance = maxd0, matchCountKeep = 5,
        patternFromRefWindow = true,
        refSeriesMode = "concat", traceOrder = traceOrder)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(per.keySet == conc.keySet)
    val diffs = per.keySet.count(k => per(k) != conc(k))
    info(s"per-trace vs concat count diffs at maxd=$maxd0: $diffs of ${per.size}")
  }
}
