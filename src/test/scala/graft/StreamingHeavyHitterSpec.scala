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
    // the documented consumer contract, nothing shard-total-shaped: keep
    // the LATEST row per (shard, token) by n_shard, drop est = 0
    // tombstones — eviction retractions make this sufficient
    val r2 = all.groupBy(e => (e.shard, e.token))
      .map(_._2.maxBy(_.n_shard)).toArray
      .filter(_.est > 0)
    checkGuarantee(r2, batch1 ++ batch2)
    assert(r2.exists(_.token == "hot"), "the heavy must survive both batches")
    // every batch-1 survivor absent from the live summary was retracted
    // by an explicit tombstone, not silently dropped
    val live = r2.map(e => (e.shard, e.token)).toSet
    r1.filter(e => !live.contains((e.shard, e.token))).foreach { e =>
      assert(all.exists(t => t.shard == e.shard && t.token == e.token &&
        t.est == 0L && t.n_shard > e.n_shard),
        s"evicted '${e.token}' in shard ${e.shard} has no tombstone")
    }
    q.stop()
  }

  test("streaming size parameters are sizing rules, not constants (r9 verdict #1)") {
    // MG capacity is a precision contract: eps -> ceil(1/eps) - 1
    assert(StreamingOps.mgCapacityFor(0.01) == 99)
    assert(StreamingOps.mgCapacityFor(0.1) == 9)
    assert(StreamingOps.mgCapacityFor(0.001) == 999)
    // tighter error never shrinks capacity
    assert(StreamingOps.mgCapacityFor(0.005) >= StreamingOps.mgCapacityFor(0.01))
    // CDC modulus = expected chunk length, sized from document shape;
    // the default resolves to the value the q115 oracle pins (16)
    assert(StreamingOps.cdcModulusFor() == 16)
    assert(StreamingOps.cdcModulusFor(2048, 32) == 64)
    assert(StreamingOps.cdcModulusFor(8, 32) == 4) // floor
    // and the operator defaults route through the rules (SizeAuto)
    assert(StreamingOps.SizeAuto == -1)
  }

  test("mergeHeavyHitters: global presence + summed error bound from raw sink rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingOps.heavyHittersIngest(input.toDS(), capacity, shards)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("mg_merge").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    val seen = batch1 ++ batch2
    val trueCounts = seen.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    // a large k makes the view exhaustive so presence can be asserted
    val merged = StreamingOps.mergeHeavyHitters(
      spark.table("mg_merge").as[StreamingOps.MgEntry], capacity, k = 10000)
      .collect()
    q.stop()
    val errBound = merged.head.err_bound
    // the summed bound is what the mergeable-summary property promises
    val shardTotals = seen.groupBy(shardOf).map { case (_, xs) => xs.size.toLong }
    assert(errBound == shardTotals.map(_ / (capacity + 1)).sum)
    assert(merged.head.n_total == seen.size.toLong)
    val byToken = merged.map(e => (e.token, e.est)).toMap
    trueCounts.foreach { case (t, cnt) =>
      if (cnt > errBound)
        assert(byToken.contains(t), s"'$t' (true $cnt > global bound $errBound) missing")
      byToken.get(t).foreach { e =>
        assert(e <= cnt, s"'$t' overestimated globally: $e > $cnt")
        assert(e >= cnt - errBound, s"'$t' below global bound: $e < $cnt - $errBound")
      }
    }
    // top-K ordering: estimates descend
    val topdown = merged.map(_.est)
    assert(topdown.zip(topdown.tail).forall { case (a, b) => a >= b })
  }
}
