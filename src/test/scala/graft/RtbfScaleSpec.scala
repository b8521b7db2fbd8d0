package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * r10 verdict #3: [[Dedup.rtbfApply]]'s incrementality as a MEASUREMENT,
 * not a claim. RtbfSpec proves incremental == full; this spec proves the
 * WORK scales with the deletion, not the corpus: the same fixed 10-doc
 * deletion batch against a 100k-doc and a 1M-doc registry (identical
 * per-doc structure — one pair partner, one shared shingle), total
 * shuffle bytes written across every job the apply triggers read off a
 * task-metrics listener. A 10× corpus must NOT mean 10× shuffle: the
 * pass-through side rides broadcast anti-joins (narrow), and everything
 * that shuffles (affected edges, re-attributed shingles, tiny distincts)
 * is deletion-sized. Measured numbers land in BASELINE.md.
 */
class RtbfScaleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("rtbf-scale-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Build an n-doc registry (pairs (2j, 2j+1), shingle h=2j shared per
    * pair), apply the FIXED deletion {0,2,...,18}, and return the total
    * shuffle bytes written by the apply's jobs. Inputs ride EAGER
    * localCheckpoints so their generation never enters the measurement. */
  private def applyShuffleBytes(n: Long): Long = {
    val clusters = spark.range(0, n, 1, 4)
      .select(col("id").as("doc_id"),
        (col("id") - pmod(col("id"), lit(2L))).as("cluster_id"))
      .localCheckpoint()
    val pairs = spark.range(0, n / 2, 1, 4)
      .select((col("id") * 2).as("doc_a"), (col("id") * 2 + 1).as("doc_b"))
      .localCheckpoint()
    val postings = spark.range(0, n, 1, 4)
      .select((col("id") - pmod(col("id"), lit(2L))).as("h"),
        col("id").as("doc_id"))
      .localCheckpoint()
    val firstOcc = spark.range(0, n / 2, 1, 4)
      .select((col("id") * 2).as("h"), (col("id") * 2).as("doc_id"))
      .localCheckpoint()
    val deleted = spark.range(0, 10)
      .select((col("id") * 2).as("doc_id")).localCheckpoint()

    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (nc, nf) = Dedup.rtbfApply(clusters, pairs, postings, firstOcc, deleted)
      nc.queryExecution.toRdd.foreach(_ => ())
      nf.queryExecution.toRdd.foreach(_ => ())
      // semantics spot-check: deleted docs gone, their pair partners
      // became singletons, their shingles re-attributed to the partner
      val cl = nc.where(col("doc_id") < 20).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L until 20L by 2).forall(d => !cl.contains(d)))
      assert((1L until 20L by 2).forall(d => cl(d) == d))
      val fo = nf.where(col("h") < 20).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L until 20L by 2).forall(h => fo(h) == h + 1))
      // listener bus drains asynchronously; give it a beat
      Thread.sleep(1500)
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  test("fixed deletion: 10x corpus growth costs <2.5x apply shuffle bytes") {
    val small = applyShuffleBytes(100000L)
    val big = applyShuffleBytes(1000000L)
    info(s"apply shuffle bytes: 100k-doc corpus = $small, 1M-doc corpus = $big")
    assert(big < math.max(small, 1024L) * 5 / 2,
      s"apply shuffle grew with the corpus: $small -> $big bytes for 10x docs")
  }
}
