package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sweep counting — the scale-safe form of cross-entity interval
 * questions: "how many intervals (of ANYONE) contain time t". A join
 * answers it by materializing (probe x overlapping-interval) pairs,
 * which grows with probes x concurrency — quadratic in scale factor.
 * The sweep form never forms a pair:
 *
 *   active(t) = #(start <= t) - #(end < t)
 *
 * Each term is a RANK in one global time order, computed the same
 * two-level way as [[CorpusSharding]]'s prefix sums: markers and probes
 * shard by a fixed time width, per-shard marker counts (aggregate-sized
 * — one row per shard) give each shard its prefix offset, and a
 * per-shard running sum finishes the rank. The global order is
 * shard-major by construction (the shard IS the leading bits of the
 * time), so the two-level result equals the single-window global
 * running sum for EVERY shard width (SweepCountSpec), and no task ever
 * sees more than one shard's rows.
 */
object SweepCount {

  /** Count, for each probe row, the markers at-or-before (`strict =
    * false`) or strictly-before (`strict = true`) its time.
    *
    * @param markers one column `time` (long)
    * @param probes  columns `probe_id`, `t` (long)
    * @return (probe_id, <outCol>) */
  def markerRank(markers: DataFrame, probes: DataFrame, strict: Boolean,
                 shardUs: Long, outCol: String): DataFrame = {
    // at equal time, inclusive counting sorts markers BEFORE probes,
    // strict counting sorts them AFTER — the running sum at the probe
    // row then includes exactly the markers the predicate admits
    val mOrd = if (strict) 1 else 0
    val u = markers
      .select(col("time"), lit(1L).as("delta"),
        lit(null).cast("long").as("probe_id"), lit(mOrd).as("ord"))
      .unionByName(probes.select(col("t").as("time"), lit(0L).as("delta"),
        col("probe_id"), lit(1 - mOrd).as("ord")))
      .withColumn("shard", expr(s"time div $shardUs"))
    val perShard = u.groupBy("shard").agg(sum("delta").as("sd"))
    // the offset window runs over ONE row per shard — aggregate-sized at
    // any corpus size, the same shape as CorpusSharding's offsets
    val offsets = perShard
      .withColumn("offset", coalesce(
        sum("sd").over(Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "offset")
    val wIn = Window.partitionBy("shard").orderBy("time", "ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.join(broadcast(offsets), Seq("shard"))
      .withColumn("cnt", sum("delta").over(wIn) + col("offset"))
      .where(col("probe_id").isNotNull)
      .select(col("probe_id"), col("cnt").as(outCol))
  }

  /** For each probe time, the number of intervals [start, end]
    * (inclusive bounds) containing it — no pair ever materializes.
    *
    * @param intervals columns `start`, `end` (long)
    * @param probes    columns `probe_id`, `t` (long)
    * @return (probe_id, n_active) */
  def activeIntervals(intervals: DataFrame, probes: DataFrame,
                      shardUs: Long): DataFrame = {
    val started = markerRank(intervals.select(col("start").as("time")),
      probes, strict = false, shardUs, "n_started")
    val ended = markerRank(intervals.select(col("end").as("time")),
      probes, strict = true, shardUs, "n_ended")
    started.join(ended, Seq("probe_id"))
      .select(col("probe_id"), (col("n_started") - col("n_ended")).as("n_active"))
  }
}
