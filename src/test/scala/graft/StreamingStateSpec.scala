package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/**
 * STREAMING STATE ENVELOPE (r12 verdict #7: batch queries carry
 * time+bytes envelopes, the 16 streaming operators had no
 * regression-gated state measurements): for each stateful operator
 * class, run a deterministic fixture and read the state store's OWN
 * telemetry (`StreamingQueryProgress.stateOperators` — numRowsTotal /
 * memoryUsedBytes), then gate:
 *
 *  - state ROWS exactly — they are a deterministic function of the
 *    fixture and the operator's state keying, and each assertion IS
 *    the operator's boundedness claim (sketch state counts WINDOWS not
 *    users; MG state counts SHARDS not tokens; watermark dedup counts
 *    keys INSIDE the horizon and provably evicts after it);
 *  - state BYTES under a generous cap (512 KiB per operator on these
 *    fixtures) — not a tight envelope (store overhead is JVM/version
 *    dependent) but a regression gate that catches a state key
 *    accidentally growing corpus-sized.
 *
 * The harvested values are committed as the streaming state table in
 * BASELINE.md (the RtbfScaleSpec measure-don't-claim discipline).
 */
class StreamingStateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-state-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val BytesCap = 512L * 1024

  /** (numRowsTotal, memoryUsedBytes) summed across the query's state
    * operators, from the most recent progress that carries any. */
  private def stateOf(q: StreamingQuery): (Long, Long) = {
    val p = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .getOrElse(fail("no state operator progress recorded"))
    (p.stateOperators.map(_.numRowsTotal).sum,
      p.stateOperators.map(_.memoryUsedBytes).sum)
  }

  private def report(name: String, rows: Long, bytes: Long): Unit =
    info(f"$name%-28s state_rows=$rows%6d state_bytes=$bytes%8d")

  test("windowed rollup: state rows = live (feature, window) groups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingOps.windowedMetricRollup(
      input.toDF().toDF("ts", "feature", "value"),
      watermark = "1 minute", windowLen = "1 minute")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ss_rollup").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime
    def ts(s: Int) = new java.sql.Timestamp(t0 + s * 1000L)
    // 3 groups: (cpu, w1), (mem, w1), (cpu, w2) — 5 events
    input.addData((ts(0), "cpu", 1.0), (ts(5), "cpu", 3.0), (ts(10), "mem", 7.0),
      (ts(70), "cpu", 2.0), (ts(75), "cpu", 4.0))
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("windowedMetricRollup", rows, bytes)
    assert(rows == 3L, s"expected 3 live groups, got $rows")
    assert(bytes < BytesCap)
  }

  test("windowed distinct users: state rows = windows, NOT users (sketch-bounded)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = StreamingOps.windowedDistinctUsers(
      input.toDF().toDF("ts", "user_id"),
      watermark = "1 minute", windowLen = "1 minute")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ss_hll").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime
    def ts(s: Int) = new java.sql.Timestamp(t0 + s * 1000L)
    // 200 distinct users in window 1, one user in window 2
    input.addData((0 until 200).map(u => (ts(u % 50), u.toLong)): _*)
    input.addData((ts(70), 9999L))
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("windowedDistinctUsers", rows, bytes)
    assert(rows == 2L, s"state must count WINDOWS (2), not 201 users — got $rows")
    assert(bytes < BytesCap)
  }

  test("ingest dedup: state rows = distinct keys in the horizon, evicted past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamingOps.dedupIngest(
      input.toDF().toDF("ts", "text"), "text", "ts", watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ss_dedup").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime
    def ts(s: Int) = new java.sql.Timestamp(t0 + s * 1000L)
    // 60 docs, 20 distinct texts, all inside the watermark
    input.addData((0 until 60).map(i => (ts(i), s"doc_${i % 20}")): _*)
    q.processAllAvailable()
    val (rows1, bytes1) = stateOf(q)
    report("dedupIngest (in horizon)", rows1, bytes1)
    assert(rows1 == 20L, s"expected 20 distinct keys, got $rows1")
    // jump event time 10 hours: the old keys age out of the watermark
    // (eviction lands on the batch AFTER the watermark advances)
    input.addData((new java.sql.Timestamp(t0 + 10L * 3600 * 1000), "fresh_a"))
    q.processAllAvailable()
    input.addData((new java.sql.Timestamp(t0 + 10L * 3600 * 1000 + 60000), "fresh_b"))
    q.processAllAvailable()
    val (rows2, bytes2) = stateOf(q)
    q.stop()
    report("dedupIngest (past horizon)", rows2, bytes2)
    assert(rows2 <= 2L, s"old keys must evict past the watermark, got $rows2")
    assert(bytes1 < BytesCap && bytes2 < BytesCap)
  }

  test("MG heavy hitters: state rows = shards, regardless of distinct tokens") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val hh = StreamingOps.heavyHittersIngest(input.toDS(), capacity = 3, shards = 2)
    val q = hh.writeStream.outputMode("update")
      .format("memory").queryName("ss_mg").start()
    // 1000 instances over 100 distinct tokens through 2 shards of cap 3
    input.addData((0 until 1000).map(i => s"tok_${i % 100}"): _*)
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("heavyHittersIngest", rows, bytes)
    assert(rows == 2L, s"MG state must be one row per SHARD (2), got $rows")
    assert(bytes < BytesCap)
  }

  test("session rollup: state rows = open sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val sess = StreamingOps.sessionRollup(
      input.toDF().toDF("ts", "user_id"), gap = "10 minutes", watermark = "1 minute")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("ss_sess").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime
    def ts(s: Int) = new java.sql.Timestamp(t0 + s * 1000L)
    // 3 users, one open session each (events 5s apart)
    input.addData((ts(0), 1L), (ts(5), 1L), (ts(0), 2L), (ts(3), 3L))
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("sessionRollup", rows, bytes)
    assert(rows == 3L, s"expected 3 open sessions, got $rows")
    assert(bytes < BytesCap)
  }

  test("uniform sample: state rows = strata, independent of stream length") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val sample = StreamingOps.uniformSampleIngest(
      input.toDF().toDF("lang", "doc_id"), "lang", "doc_id", k = 3)
    val q = sample.writeStream.outputMode("update")
      .format("memory").queryName("ss_usample").start()
    // 400 docs across 5 strata with a 3-doc sample each
    input.addData((0 until 400).map(i => (s"lang_${i % 5}", i.toLong)): _*)
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("uniformSampleIngest", rows, bytes)
    assert(rows == 5L, s"state must be one row per STRATUM (5), got $rows")
    assert(bytes < BytesCap)
  }

  test("inter-arrival stats: state rows = live (user, event_type) keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = StreamingOps.interarrivalStatsIngest(
        input.toDF().toDF("user_id", "event_type", "us", "event_id"))
      .writeStream.outputMode("update")
      .format("memory").queryName("ss_gaps").start()
    // 300 events over 10 users x 2 event types = 20 live keys
    input.addData((0 until 300).map(i =>
      ((i % 10).toLong, s"t${(i / 10) % 2}",
        1700000000000000L + i * 1000000L, i.toLong)): _*)
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("interarrivalStatsIngest", rows, bytes)
    assert(rows == 20L,
      s"state must be one row per live (user, event_type) key (20), got $rows")
    assert(bytes < BytesCap)
  }

  test("explanation-at-close: state rows = OPEN windows, removed at close") {
    import spark.implicits._
    import graft.streaming.StreamingOps.StreamObs
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamObs]
    val exps = StreamingOps.explainOnClose(input.toDS(), Seq("f1"))
    val q = exps.writeStream.outputMode("append")
      .format("memory").queryName("ss_explain").start()
    input.addData(
      StreamObs("w1", "f1", 1L, 0, 1.0), StreamObs("w1", "f1", 2L, 1, 5.0),
      StreamObs("w2", "f1", 1L, 0, 2.0))
    q.processAllAvailable()
    val (rows1, bytes1) = stateOf(q)
    report("explainOnClose (2 open)", rows1, bytes1)
    assert(rows1 == 2L, s"expected 2 open windows, got $rows1")
    // close w1: its buffer must leave the store
    input.addData(StreamObs("w1", "", 3L, -1, 0.0))
    q.processAllAvailable()
    val (rows2, bytes2) = stateOf(q)
    q.stop()
    report("explainOnClose (1 closed)", rows2, bytes2)
    assert(rows2 == 1L, s"closed window must drop its state, got $rows2")
    assert(bytes1 < BytesCap && bytes2 < BytesCap)
  }

  test("funnel attribution: state rows = users with live registers") {
    import spark.implicits._
    import graft.streaming.StreamingOps.FunnelEvent
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val baseUs = 1700000000000000L
    val q = StreamingOps.funnelAttribution(input.toDS(), watermarkDelay = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("ss_funnel").start()
    input.addData(
      FunnelEvent(1L, 1L, baseUs, "click"),
      FunnelEvent(2L, 2L, baseUs + 1000000L, "click"),
      FunnelEvent(3L, 3L, baseUs + 2000000L, "view"))
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("funnelAttribution", rows, bytes)
    assert(rows == 3L, s"expected 3 users with live registers, got $rows")
    assert(bytes < BytesCap)
  }

  test("stream-stream attribution join: state rows = buffered rows in the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
    val joined = StreamingOps.attributeToClick(
      clicks.toDF().toDF("ts", "user_id", "click_id"),
      purchases.toDF().toDF("ts", "user_id", "purchase_id", "value"),
      horizon = "1 hour", watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime
    def ts(s: Int) = new java.sql.Timestamp(t0 + s * 1000L)
    clicks.addData((ts(0), 1L, 100L), (ts(5), 2L, 101L))
    purchases.addData((ts(60), 1L, 500L, 9.99))
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("attributeToClick", rows, bytes)
    // all 3 events sit inside the horizon: both sides stay buffered
    assert(rows == 3L, s"expected 3 buffered rows, got $rows")
    assert(bytes < BytesCap)
  }

  test("cusum ingest: state rows = live keys (two longs each, constant per key)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingOps.cusumIngest(
        input.toDF().toDF("key", "seq", "v"), mum = 1000000L, sm = 500000L)
      .writeStream.outputMode("update")
      .format("memory").queryName("ss_cusum").start()
    // 90 observations over 3 keys = 3 live CUSUM registers
    input.addData((0 until 90).map(i =>
      (s"k${i % 3}", i.toLong, (i % 7).toLong)): _*)
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("cusumIngest", rows, bytes)
    assert(rows == 3L, s"state must be one row per live key (3), got $rows")
    assert(bytes < BytesCap)
  }

  test("cross-source contamination ingest: state rows = distinct hashes " +
      "(one long each), NOT arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val q = StreamingOps.crossSourceContamIngest(
        input.toDF().toDF("doc_id", "source", "text", "seq"),
        Map("a" -> 0, "b" -> 1, "c" -> 2))
      .writeStream.outputMode("update")
      .format("memory").queryName("ss_contam").start()
    // 120 arrivals over 3 sources but only 10 distinct texts: state is
    // the per-HASH mask (10 rows), constant however often a hash recurs
    input.addData((0 until 120).map(i =>
      (i.toLong, s"${('a' + i % 3).toChar}", s"text-${i % 10}", i.toLong)): _*)
    q.processAllAvailable()
    val (rows, bytes) = stateOf(q)
    q.stop()
    report("crossSourceContamIngest", rows, bytes)
    assert(rows == 10L, s"state must be one row per distinct hash (10), got $rows")
    assert(bytes < BytesCap)
  }
}
