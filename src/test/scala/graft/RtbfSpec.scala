package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/**
 * Semantics lock for [[Dedup.rtbfApply]] (q151 — RTBF execution):
 * incremental post-deletion state equals a driver-computed FULL
 * recompute on a fixture engineered to exercise every branch:
 *  - a deleted BRIDGE doc splits its cluster into singletons;
 *  - a deleted canonical REPRESENTATIVE re-elects the min survivor;
 *  - an untouched cluster passes through byte-identical;
 *  - a deleted singleton simply disappears;
 *  - shingle owners re-attribute to the min survivor, fully-deleted
 *    shingles retire, surviving owners stay untouched.
 * (The q151 ORACLE re-proves incremental == full cross-engine at every
 * driver gate; this spec is the branch-explicit unit form.)
 */
class RtbfSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("rtbf-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("incremental rtbfApply equals the full recompute on the branch fixture") {
    import spark.implicits._
    val allDocs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L)
    // path 1-2-3 (2 is a bridge), triangle 4-5-6, singletons 7/8,
    // triangle 9-10-11 (9 is the canonical rep)
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (9L, 10L), (10L, 11L), (9L, 11L)).toDF("doc_a", "doc_b")
    val deleted = Seq(2L, 7L, 9L).toDF("doc_id")
    val postings = Seq(
      (101L, 2L), (101L, 3L), (101L, 5L), // owner 2 deleted -> 3
      (102L, 2L), (102L, 7L),             // all owners deleted -> retired
      (103L, 1L),                         // untouched owner
      (104L, 7L), (104L, 8L)              // owner 7 deleted -> 8
    ).toDF("h", "doc_id")
    val firstOcc = postings.groupBy("h")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
    val clustersFull = {
      val cl = Dedup.dupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      allDocs.map(d => (d, cl.getOrElse(d, d))).toDF("doc_id", "cluster_id")
    }

    val (nc, nf) = Dedup.rtbfApply(clustersFull, pairs, postings, firstOcc, deleted)
    val gotClusters = nc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotFirst = nf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // full recompute on the driver: components of surviving pairs +
    // self-clusters for surviving docs
    val del = Set(2L, 7L, 9L)
    val survPairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (9L, 10L), (10L, 11L), (9L, 11L))
      .filter { case (a, b) => !del(a) && !del(b) }
    val parent = scala.collection.mutable.Map(
      allDocs.filterNot(del).map(d => d -> d): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    survPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectClusters = allDocs.filterNot(del).map(d => d -> find(d)).toMap
    assert(gotClusters == expectClusters, s"got $gotClusters expected $expectClusters")
    // the named branches, explicitly
    assert(gotClusters(1L) == 1L && gotClusters(3L) == 3L) // bridge split
    assert(gotClusters(10L) == 10L && gotClusters(11L) == 10L) // rep re-elected
    assert(gotClusters(4L) == 4L && gotClusters(5L) == 4L && gotClusters(6L) == 4L) // untouched
    assert(!gotClusters.contains(7L) && !gotClusters.contains(2L)) // deleted gone

    val expectFirst = Map(101L -> 3L, 103L -> 1L, 104L -> 8L) // 102 retired
    assert(gotFirst == expectFirst, s"got $gotFirst expected $expectFirst")

    // r12 broadcast guard: a mega-cluster deletion must NOT force a
    // corpus-scale broadcast — cap 0 exercises the shuffle-join fallback
    // on every survivor-sized side and the answers are identical.
    val (nc0, nf0) = Dedup.rtbfApply(clustersFull, pairs, postings, firstOcc,
      deleted, maxBroadcastMembers = 0L)
    assert(nc0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expectClusters)
    assert(nf0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expectFirst)
  }
}
