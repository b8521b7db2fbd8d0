package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/**
 * The Misra-Gries guarantee, asserted live: replay a skewed token
 * stream through [[StreamingOps.heavyHittersIngest]] and check, per
 * shard against per-shard TRUE counts,
 *  1. every token with true count > n_shard/(capacity+1) is present;
 *  2. every estimate sits within [true - n_shard/(capacity+1), true];
 *  3. no shard ever holds more than `capacity` counters (the bounded-
 *     state point of the sketch);
 * then feeds a SECOND batch and re-checks — the summary is a running
 * state, not a per-batch one.
 */
class StreamingHeavyHitterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-mg-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val capacity = 8
  private val shards = 4

  // skewed fixture: two heavies, a mid, and a singleton tail far wider
  // than capacity x shards
  private def batch1: Seq[String] =
    Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++ Seq.fill(25)("mid") ++
      (1 to 200).map(i => s"tail$i")
  private def batch2: Seq[String] =
    Seq.fill(150)("hot") ++ Seq.fill(40)("mid2") ++ (201 to 320).map(i => s"tail$i")

  private def shardOf(t: String): Int = math.floorMod(t.hashCode, shards)

  private def checkGuarantee(
      rows: Array[StreamingOps.MgEntry], seen: Seq[String]): Unit = {
    val trueCounts = seen.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val byShard = rows.groupBy(_.shard)
    byShard.foreach { case (sh, es) =>
      assert(es.length <= capacity, s"shard $sh exceeded capacity: ${es.length}")
      assert(es.map(_.token).distinct.length == es.length)
    }
    val shardTotals = seen.groupBy(shardOf).map { case (s, xs) => (s, xs.size.toLong) }
    trueCounts.foreach { case (t, cnt) =>
      val sh = shardOf(t)
      val bound = shardTotals(sh) / (capacity + 1)
      val est = byShard.getOrElse(sh, Array.empty).find(_.token == t).map(_.est)
      if (cnt > bound)
        assert(est.isDefined, s"'$t' (true $cnt > bound $bound in shard $sh) missing")
      est.foreach { e =>
        assert(e <= cnt, s"'$t' overestimated: $e > $cnt")
        assert(e >= cnt - bound, s"'$t' under bound: $e < $cnt - $bound")
      }
    }
    // the emitted n_shard matches the true shard totals
    byShard.foreach { case (sh, es) =>
      assert(es.map(_.n_shard).distinct.toSeq == Seq(shardTotals(sh)))
    }
  }

  test("sharded Misra-Gries: presence + error bound + bounded state, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingOps.heavyHittersIngest(input.toDS(), capacity, shards)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("mg").start()

    input.addData(batch1: _*)
    q.processAllAvailable()
    // update mode: latest emission per (shard, token) — batch 1 is the
    // only emission so far
    val r1 = spark.table("mg").as[StreamingOps.MgEntry].collect()
    checkGuarantee(r1, batch1)
    assert(r1.exists(_.token == "hot") && r1.exists(_.token == "warm"),
      "the two heavies must survive batch 1")

    input.addData(batch2: _*)
    q.processAllAvailable()
    val all = spark.table("mg").as[StreamingOps.MgEntry].collect()
    // keep the LATEST row per (shard, token): max n_shard wins
    val r2 = all.groupBy(e => (e.shard, e.token))
      .map(_._2.maxBy(_.n_shard)).toArray
      // drop tokens evicted by batch 2 (their stale batch-1 rows remain
      // in the memory sink; the live summary is the latest emission of
      // each shard)
      .filter(e => e.n_shard == (batch1 ++ batch2).count(t => shardOf(t) == e.shard))
    checkGuarantee(r2, batch1 ++ batch2)
    assert(r2.exists(_.token == "hot"), "the heavy must survive both batches")
    q.stop()
  }
}
