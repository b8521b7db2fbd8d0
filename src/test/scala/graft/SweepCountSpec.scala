package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SweepCount

/**
 * The sweep-count contract: active(t) = #(start <= t) - #(end < t)
 * computed two-level (time-shard offsets + per-shard running sums) must
 * equal the brute-force per-probe count for every shard width — the
 * shard is the leading bits of the time, so shard-major order IS the
 * global order. This is the operator that answers cross-entity interval
 * concurrency without materializing (probe x interval) pairs.
 */
class SweepCountSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sweep-count-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("two-level sweep equals brute force for every shard width, ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // random intervals + probes, with deliberate boundary collisions:
    // probes landing exactly on starts and ends exercise the tie order
    val intervals = (1 to 400).map { _ =>
      val s = rnd.nextInt(100000).toLong
      (s, s + 1 + rnd.nextInt(20000).toLong)
    }
    val probes = ((1 to 200).map(i => (i.toLong, rnd.nextInt(120000).toLong)) ++
      intervals.take(20).zipWithIndex.map { case ((s, _), i) => (1000L + i, s) } ++
      intervals.slice(20, 40).zipWithIndex.map { case ((_, e), i) => (2000L + i, e) } ++
      intervals.slice(40, 60).zipWithIndex.map { case ((_, e), i) => (3000L + i, e + 1) })
      .toVector
    val expected = probes.map { case (id, t) =>
      id -> intervals.count { case (s, e) => s <= t && t <= e }.toLong
    }.toMap

    val iDf = intervals.toDF("start", "end")
    val pDf = probes.toDF("probe_id", "t")
    for (shard <- Seq(1000L, 7777L, 1000000L)) {
      val got = SweepCount.activeIntervals(iDf, pDf, shard)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"shard width $shard diverges from brute force")
    }
  }

  test("markerRank: inclusive counts the equal-time marker, strict does not") {
    import spark.implicits._
    val markers = Seq(10L, 20L, 20L, 30L).toDF("time")
    val probes = Seq((1L, 20L), (2L, 25L), (3L, 9L)).toDF("probe_id", "t")
    val incl = SweepCount.markerRank(markers, probes, strict = false, 1000L, "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strict = SweepCount.markerRank(markers, probes, strict = true, 1000L, "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incl == Map(1L -> 3L, 2L -> 3L, 3L -> 0L)) // both 20s counted at t=20
    assert(strict == Map(1L -> 1L, 2L -> 3L, 3L -> 0L)) // neither 20 counted strictly
  }
}
