package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/**
 * r10 verdict #4: the ANN-audit constants promoted to the repo's
 * sizing-rule discipline. Three proofs:
 *  - [[Similarity.twoLevelTopK]] is ANSWER-INVARIANT in the shard count
 *    (the ShardingSpec/SweepCountSpec property for the top-k shape):
 *    identical (query, id) sets for shards in {1, 3, 32, 1000}, checked
 *    against a driver-side exact top-k including a tie fixture;
 *  - [[Similarity.topkShardsFor]] defaults are sized: floor 32, grows
 *    with the corpus (~1 shard per 4M rows), capped so the re-rank
 *    stage stays aggregate-sized;
 *  - [[Similarity.auditQueryDraw]] is a deterministic md5-order prefix:
 *    stable across runs, independent of row order, no contiguous-id
 *    assumption (drawn from a gap-ful id space).
 */
class AnnAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ann-audit-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("twoLevelTopK: identical result for any shard count, ties included") {
    import spark.implicits._
    // 3 queries x 200 ids; dist has deliberate ties (dist = id % 7) so
    // the (dist, id) tie-break is exercised across shard boundaries
    val scored = (for {
      q <- 0 until 3
      id <- 0 until 200
    } yield (q.toLong, id.toLong, ((id * (q + 3)) % 7).toLong))
      .toDF("query_id", "vid", "dist")
    val expected = (for (q <- 0 until 3) yield {
      val ids = (0 until 200).map(id => (((id * (q + 3)) % 7).toLong, id.toLong))
        .sorted.take(5).map(_._2)
      ids.map(id => (q.toLong, id))
    }).flatten.toSet
    for (shards <- Seq(1, 3, 32, 1000)) {
      val got = Similarity.twoLevelTopK(scored, "query_id", "vid", "dist", 5, shards)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"shards=$shards diverged from exact top-5")
    }
  }

  test("topkShardsFor: sized floor, corpus growth, re-rank cap") {
    // floor: small corpora stay at 32 shards
    assert(Similarity.topkShardsFor(8, 0) == 32)
    assert(Similarity.topkShardsFor(8, 4 << 20) == 32)
    // growth: ~1 shard per 4M corpus rows once past the floor
    assert(Similarity.topkShardsFor(8, 400L << 20) == 100)
    // cap: many queries bound the re-rank stage (nQueries*shards*k rows)
    assert(Similarity.topkShardsFor(1000000, 400L << 20) == 32)
    // monotone in corpus size at fixed queries
    val g = Seq(1L << 20, 1L << 25, 1L << 30, 1L << 35)
      .map(Similarity.topkShardsFor(8, _))
    assert(g == g.sorted)
  }

  test("auditQueryDraw: md5-order prefix, row-order independent, gap-ful ids ok") {
    import spark.implicits._
    // deliberately NON-contiguous ids (x7, offset) — the draw must not
    // assume 0..N-1 the way the old `vid < 8` filter did
    val ids = (0 until 50).map(i => i.toLong * 7 + 3)
    val qv = ids.map(id => (id, Seq(id, id + 1))).toDF("vid", "q")
    val a = Similarity.auditQueryDraw(qv, 8)
    val b = Similarity.auditQueryDraw(qv.orderBy(rand(42)), 8)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq, "draw depends on row order")
    assert(a.length == 8 && a.map(_._1).distinct.length == 8)
    // matches the definition: first 8 ids by (md5("q:" ++ id), id)
    val expect = ids.map { id =>
      (graft.functions.PortableHash.md5LongOf(s"q:$id", 15), id)
    }.sorted.take(8).map(_._2).sorted
    assert(a.map(_._1).toSeq == expect)
    // vectors ride along
    assert(a.forall { case (id, v) => v.toSeq == Seq(id, id + 1) })
  }
}
