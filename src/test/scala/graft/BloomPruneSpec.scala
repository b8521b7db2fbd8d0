package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The q67 Bloom-prune contract: the pre-filter must be answer-preserving
 * (Bloom filters have no false negatives, so the exact semi-join still
 * sees every true hit) while actually discarding the overwhelming share
 * of the corpus shingle stream map-side — the property that lets
 * decontamination scale past the point where the held-out set fits a
 * broadcast hash set.
 */
class BloomPruneSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bloom-prune-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bloom prune: zero false negatives, heavy pruning, q67 == q45 exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val shingleSetUdf = udf((text: String) =>
      graft.functions.ShingleKernel.shingleStrings(text, 3))
    val heldout = docs.where(col("doc_id") % 97 === 0)
      .select(explode(shingleSetUdf(col("text"))).as("shingle")).distinct().cache()
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
      .select(explode(shingleSetUdf(col("text"))).as("shingle"))

    val bf = heldout.stat.bloomFilter("shingle", math.max(1000L, heldout.count()), 0.01)
    // no false negatives: every held-out shingle passes the filter
    val misses = heldout.collect().count(r => !bf.mightContain(r.getString(0)))
    assert(misses == 0, s"$misses held-out shingles missed by the Bloom filter")

    // the prune discards the overwhelming share of the corpus stream
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((x: String) => bfB.value.mightContain(x))
    val total = corpus.count()
    val surviving = corpus.where(mightContain(col("shingle"))).count()
    assert(surviving.toDouble / total < 0.2,
      s"prune too weak: $surviving of $total shingles survive")

    // and the full queries agree row for row at fixture scale
    val q45 = SparkEntry.queries("q45_decontamination")(spark, sf).collect().map(_.toSeq)
    val q67 = SparkEntry.queries("q67_bloom_decontaminate")(spark, sf).collect().map(_.toSeq)
    assert(q45.toSeq == q67.toSeq)
    heldout.unpersist()
    spark.catalog.clearCache()
  }
}
