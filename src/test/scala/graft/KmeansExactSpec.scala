package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/**
 * Semantics locks for the integer-exact fixed-round Lloyd trainer behind
 * q153 (the spec-only -> oracled upgrade of the k-means family):
 *  - full equality with a driver-side naive replica (same init rule,
 *    integer L2, min-cid ties, toward-zero division) on a mixed fixture;
 *  - planted well-separated blobs are recovered exactly (sizes = blob
 *    sizes, centroids = integer blob means);
 *  - the empty-cluster guard keeps the seed centroid (k > distinct
 *    locations — the COALESCE branch probed live, the q121 lesson).
 */
class KmeansExactSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("kmeans-exact-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5Long(id: Long): BigInt = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    BigInt(hex, 16)
  }

  private def naive(
      vecs: Map[Long, Array[Long]], k: Int, rounds: Int): (Array[Array[Long]], Array[Long]) = {
    val seeds = vecs.keys.toSeq.sortBy(id => (md5Long(id), id)).take(k)
    var cents = seeds.map(vecs(_).clone).toArray
    var sizes = Array.fill(k)(0L)
    for (_ <- 1 to rounds) {
      val asg = vecs.map { case (id, v) =>
        id -> (0 until k).minBy(c =>
          (cents(c).zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, c))
      }
      val next = Array.tabulate(k) { c =>
        val members = vecs.collect { case (id, v) if asg(id) == c => v }
        if (members.isEmpty) cents(c)
        else {
          val n = members.size
          Array.tabulate(cents(c).length)(p => members.map(_(p)).sum / n)
        }
      }
      sizes = Array.tabulate(k)(c => asg.count(_._2 == c).toLong)
      cents = next
    }
    (cents, sizes)
  }

  private def toDf(vecs: Map[Long, Array[Long]]) = {
    import spark.implicits._
    // floats with .0001 margin so floor(v*1024) reproduces the longs
    vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(x => (x.toDouble + 0.0001f) / 1024.0f).map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("operator equals the driver-side naive replica exactly") {
    val rng = new scala.util.Random(11)
    val vecs = (1L to 60L).map(id =>
      id -> Array.fill(6)((rng.nextInt(4000) - 2000).toLong)).toMap
    val (gc, gs) = Similarity.kmeansTrainExact(toDf(vecs), "vec_id", "embedding",
      k = 4, rounds = 3)
    val (nc, ns) = naive(vecs, 4, 3)
    assert(gc.map(_.toSeq).toSeq == nc.map(_.toSeq).toSeq,
      s"centroids diverge: ${gc.map(_.toSeq).toSeq} vs ${nc.map(_.toSeq).toSeq}")
    assert(gs.toSeq == ns.toSeq)
  }

  test("planted well-separated blobs recovered exactly") {
    val rng = new scala.util.Random(5)
    // three blobs at +/-100k scale with +/-100 jitter. Lloyd from a
    // two-seeds-in-one-blob init can stably misassign (the classic
    // local optimum — observed live with arbitrary id->blob mapping),
    // so the fixture places the three SMALLEST-md5 ids in distinct
    // blobs: the md5-order init then seeds one centroid per blob and a
    // correct trainer must recover the planted structure exactly.
    val blobCenters = Seq(Array(100000L, 0L, 0L), Array(0L, 100000L, 0L),
      Array(-100000L, -100000L, 50000L))
    val blobSizes = Seq(10, 15, 20)
    val ids = (1L to blobSizes.sum.toLong).toSeq
    val seedIds = ids.sortBy(id => (md5Long(id), id)).take(3)
    val restIds = ids.filterNot(seedIds.contains)
    val blobIds: Seq[Seq[Long]] = {
      var rest = restIds
      blobSizes.zipWithIndex.map { case (n, bi) =>
        val (take, drop) = rest.splitAt(n - 1)
        rest = drop
        seedIds(bi) +: take
      }
    }
    val idBlob = blobIds.zipWithIndex.flatMap { case (is, bi) => is.map(_ -> bi) }.toMap
    val vecs = idBlob.map { case (id, bi) =>
      id -> blobCenters(bi).map(_ + rng.nextInt(201) - 100)
    }
    val (gc, gs) = Similarity.kmeansTrainExact(toDf(vecs), "vec_id", "embedding",
      k = 3, rounds = 3)
    assert(gs.sorted.toSeq == Seq(10L, 15L, 20L), s"sizes ${gs.toSeq}")
    // each centroid is the exact integer mean of one blob
    val blobMeans = blobIds.map { is =>
      val members = is.map(vecs)
      Array.tabulate(3)(p => members.map(_(p)).sum / members.size).toSeq
    }.toSet
    assert(gc.map(_.toSeq).toSet == blobMeans, s"centroids ${gc.map(_.toSeq).toSeq}")
  }

  test("pqTrainExact == independent per-subspace kmeansTrainExact (compositional lock)") {
    import org.apache.spark.sql.functions.{col, expr}
    // the PQ trainer's whole claim: subspaces are INDEPENDENT integer
    // Lloyd runs sharing seeds and passes — so slicing the vectors and
    // running the plain trainer per slice must reproduce it exactly
    val rng = new scala.util.Random(23)
    val vecs = (1L to 50L).map(id =>
      id -> Array.fill(8)((rng.nextInt(4000) - 2000).toLong)).toMap
    val df = toDf(vecs)
    val (pc, ps) = Similarity.pqTrainExact(df, "vec_id", "embedding",
      nSub = 2, k = 3, rounds = 3)
    for (sub <- 0 until 2) {
      val sliced = df.select(col("vec_id"),
        expr(s"slice(embedding, ${sub * 4 + 1}, 4)").as("embedding"))
      val (kc, ks) = Similarity.kmeansTrainExact(sliced, "vec_id", "embedding",
        k = 3, rounds = 3)
      assert(pc(sub).map(_.toSeq).toSeq == kc.map(_.toSeq).toSeq,
        s"subspace $sub codebook diverges from the standalone trainer")
      assert(ps(sub).toSeq == ks.toSeq)
    }
  }

  test("pq reconstruction error is exactly zero when vectors ARE the codebook") {
    // k distinct vectors, one each: md5-order seeding picks all of them,
    // round 1 assigns each to itself -> every chosen distance is 0
    val vecs = (1L to 4L).map(id =>
      id -> Array(id * 10000L, -id * 5000L, id * 1000L, 0L)).toMap
    val df = toDf(vecs)
    val (cents, _) = Similarity.pqTrainExact(df, "vec_id", "embedding",
      nSub = 2, k = 4, rounds = 2)
    import org.apache.spark.sql.functions.lit
    val err = Similarity.pqReconstructionError(
        df.withColumn("label", lit("x")), "vec_id", "embedding", "label", cents)
      .collect()
    assert(err.length == 1 && err(0).getLong(2) == 0L,
      s"expected zero reconstruction error: ${err.toSeq}")
  }

  test("ADC distance equals exact distance when vectors sit on their codes (q156 kernel)") {
    // corpus at exactly k distinct locations: every vector IS its code
    // centroid after training, so the asymmetric distance (query ->
    // code centroid) equals the true distance and ADC ranking == exact
    // ranking — the live-path sanity behind q156's recall audit (on
    // noise fixtures recall is legitimately near zero; this pins that
    // the mechanism, not the fixture, drives it)
    val locs = Seq(Array(40000L, 0L, -20000L, 8000L), Array(0L, 30000L, 0L, -9000L),
      Array(-50000L, -10000L, 25000L, 0L), Array(10000L, 10000L, 10000L, 10000L))
    // md5-order seeding again (the blob-test lesson): the 4 smallest-md5
    // ids must cover all 4 locations or a location has no code
    val ids = (1L to 12L).toSeq
    val seedIds = ids.sortBy(id => (md5Long(id), id)).take(4)
    val restIds = ids.filterNot(seedIds.contains)
    val idLoc = (seedIds.zipWithIndex ++
      restIds.zipWithIndex.map { case (id, i) => (id, i % 4) }).toMap
    val vecs = ids.map(id => id -> locs(idLoc(id)).clone).toMap
    val df = toDf(vecs)
    val (cents, _) = Similarity.pqTrainExact(df, "vec_id", "embedding",
      nSub = 2, k = 4, rounds = 3)
    val query = Array(5000L, -2000L, 3000L, 100L)
    def exact(x: Array[Long]) = query.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum
    def adc(x: Array[Long]) = {
      val codes = Similarity.pqNearestCodes(x, cents)
      (0 until 2).map { s =>
        val cent = cents(s)(codes(s))
        (0 until 2).map(i => {
          val d = query(s * 2 + i) - cent(i); d * d
        }).sum
      }.sum
    }
    vecs.values.foreach { x =>
      assert(adc(x) == exact(x), s"ADC != exact on an on-code vector ${x.toSeq}")
    }
  }

  test("empty-cluster guard: k above distinct locations keeps seed centroids") {
    // 30 points at only TWO distinct locations, k = 4: two clusters end
    // empty and must retain their (seed-vector) centroids with size 0
    val vecs = (1L to 30L).map(id =>
      id -> (if (id % 2 == 0) Array(50000L, 0L) else Array(-50000L, 0L))).toMap
    val (gc, gs) = Similarity.kmeansTrainExact(toDf(vecs), "vec_id", "embedding",
      k = 4, rounds = 3)
    assert(gs.count(_ == 0L) == 2, s"expected 2 empty clusters: ${gs.toSeq}")
    assert(gs.sum == 30L)
    // the naive replica agrees on the degenerate case too
    val (nc, ns) = naive(vecs, 4, 3)
    assert(gc.map(_.toSeq).toSeq == nc.map(_.toSeq).toSeq && gs.toSeq == ns.toSeq)
  }
}
