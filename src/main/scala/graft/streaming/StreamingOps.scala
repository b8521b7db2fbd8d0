package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface of the engine (SURVEY.md §2.7 / §7 step 9).
 *
 * The reference is a post-hoc batch analysis of recorded streams; the
 * EXstream PAPER's system is online (explanations triggered as annotated
 * anomaly windows close). This module is the paper-guided streaming
 * extension: the same long observation format, produced incrementally —
 * watermarked event-time windows for metric rollups, and a
 * flatMapGroupsWithState session operator that buffers a bounded recent
 * history per trace and emits a closed labeled window downstream (where
 * the batch reward/leap operators take over unchanged).
 */
object StreamingOps {

  /** Watermarked tumbling-window rollup of a metric stream — the
    * streaming analogue of the per-window aggregations (counts, sums)
    * the batch engine computes. Append-mode safe. */
  def windowedMetricRollup(
      events: DataFrame, // (ts: timestamp, trace_id/feature keys, value)
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("feature"))
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))

  /** A labeled observation arriving on the stream. `type_data` -1 marks a
    * span-close control record for the window key. */
  case class StreamObs(window_key: String, feature: String, timestamp: Long,
                       type_data: Int, value: Double)

  /** A closed window's collected observations, ready for the batch reward
    * pipeline. */
  case class ClosedWindow(window_key: String, n_obs: Int,
                          features: Seq[String])

  /**
   * Stateful span assembly: buffer observations per window_key until the
   * close marker arrives (or the state times out), then emit the closed
   * window. State is bounded by `maxBuffered` — the paper's system
   * likewise bounds buffered history.
   */
  def assembleWindows(
      obs: Dataset[StreamObs],
      maxBuffered: Int = 100000,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout(),
      timeoutDuration: String = "1 hour"): Dataset[ClosedWindow] = {
    import obs.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    obs
      .groupByKey(_.window_key)
      .flatMapGroupsWithState[List[StreamObs], ClosedWindow](
        OutputMode.Append(), timeout) {
        (key: String, rows: Iterator[StreamObs], state: GroupState[List[StreamObs]]) =>
          val buffered = state.getOption.getOrElse(Nil)
          var buf = buffered
          var close = false
          rows.foreach { r =>
            if (r.type_data < 0) close = true
            else if (buf.size < maxBuffered) buf = r :: buf
          }
          if (close || state.hasTimedOut) {
            state.remove()
            Iterator.single(ClosedWindow(key, buf.size, buf.map(_.feature).distinct.sorted))
          } else {
            state.update(buf)
            if (useTimeout) state.setTimeoutDuration(timeoutDuration)
            Iterator.empty
          }
      }
  }
}
