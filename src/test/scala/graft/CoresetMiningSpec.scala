package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/**
 * Semantics locks for the r11 data-selection/training trio, checked
 * against driver-side recomputations on the live sf0.001 tables:
 *  - q162 k-center: the greedy invariants (coverage radius
 *    non-increasing, seed at distance 0) AND the round-2 pick equals
 *    the brute-force farthest-from-seed;
 *  - q163 batch perceptron: round-1 weights equal the full-corpus
 *    Σ y·x (w₀=0 makes every doc misclassified — the batch rule as a
 *    set sum, which is also the order-independence proof), and training
 *    is LIVE (later rounds change the weights);
 *  - q164 hard negatives: every returned pair is same-cell and
 *    different-label with dense ranks and non-decreasing ADC per anchor
 *    (cells recomputed independently through the shared kernels).
 */
class CoresetMiningSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("coreset-mining-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q162: greedy invariants + round-2 pick is the brute-force farthest from the seed") {
    val out = SparkEntry.queries("q162_kcenter_coreset")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == (1 to 8))
    assert(out.map(_._2).distinct.length == 8)
    assert(out(0)._3 == 0L)
    // coverage radius never increases once the greedy is running
    val radii = out.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a },
      s"coverage radii increased: ${radii.toSeq}")

    // independent recompute of round 2: farthest vector from the seed
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val seedQ = vecs.find(_._1 == out(0)._2).get._2
    def l2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val far = vecs.filter(_._1 != out(0)._2)
      .map { case (id, q) => (l2(q, seedQ), id) }
      .reduce((a, b) =>
        if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
    assert((out(1)._2, out(1)._3) == (far._2, far._1),
      s"round-2 pick ${out(1)} != brute-force farthest $far")
  }

  test("q163: round-1 weights are the full-corpus sum of y*x; training is live") {
    val out = SparkEntry.queries("q163_perceptron_langid")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 3 * 65)
    val w1 = out.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    val w3 = out.filter(_._1 == 3).map(t => t._2 -> t._3).toMap

    // driver recompute: with w0 = 0 every margin is 0, so every doc is
    // misclassified and w1[b] = sum over ALL docs of y * x[b] — a set
    // sum, independent of any row order by construction
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
    val expected = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.foreach { r =>
      val y = if (r.getString(1) == "en") 1L else -1L
      val toks = r.getString(2).split(graft.functions.TextFunctions.wsClass, -1)
      toks.foreach { t =>
        val h = md.digest(t.getBytes("UTF-8"))
        val b = (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % 64
        expected(b) += y
      }
      expected(64L) += y // bias
    }
    assert(w1 == expected.toMap ++ (0L to 64L).filterNot(expected.contains)
        .map(_ -> 0L).toMap,
      "round-1 weights diverge from the driver set-sum")
    assert(w1 != w3, "rounds 2-3 changed nothing — training is vacuous")
  }

  test("q164: pairs are same-cell, different-label, densely ranked by ADC") {
    val out = SparkEntry.queries("q164_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // independent cell assignment through the shared kernels
    val (cellCents, _) = Similarity.kmeansTrainExact(
      embs, "vec_id", "embedding", k = 8, rounds = 3)
    val cellWrap = Array(cellCents)
    val cells = embs
      .select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) ->
        Similarity.pqNearestCodes(r.getSeq[Long](1).toArray, cellWrap)(0)).toMap
    out.foreach { case (a, _, n, _) =>
      assert(labels(a) != labels(n), s"pair ($a,$n) shares label ${labels(a)}")
      assert(cells(a) == cells(n), s"pair ($a,$n) crosses cells")
      assert(a != n)
    }
    out.groupBy(_._1).foreach { case (a, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length),
        s"anchor $a ranks not dense: ${rows.map(_._2).toSeq}")
      assert(rows.length <= 4)
      val adcs = sorted.map(_._4)
      assert(adcs.zip(adcs.drop(1)).forall { case (x, y) => x <= y },
        s"anchor $a ADC not non-decreasing: ${adcs.toSeq}")
    }
  }

  test("hardNegativesAdc CellsAuto rides ivfCellsFor: cells grow with the corpus") {
    assert(Similarity.ivfCellsFor(1 << 20) == 1024)
    // same-cell pair volume corpus*targetCellSize stays linear in n
    val g = Seq(1L << 16, 1L << 22, 1L << 28).map(Similarity.ivfCellsFor(_))
    assert(g == g.sorted && g.distinct == g)
  }
}
