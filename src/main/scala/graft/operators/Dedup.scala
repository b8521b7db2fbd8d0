package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Deduplication operators for training-data pipelines, in increasing
 * fuzziness: exact (hash groupBy), n-gram Jaccard (blocked self-join),
 * MinHash+LSH (shingle -> minhash -> band -> bucket join), SimHash
 * (bit-signature band join).
 *
 * Scale design: every variant avoids the quadratic all-pairs join — exact
 * dedup is a single hash aggregation; Jaccard is blocked on a cheap key;
 * MinHash/SimHash candidate generation goes through band buckets
 * (shuffle keyed on (band, hash), cost ~ O(docs x bands)), and only
 * bucket-mates are verified exactly. That is the shape that survives 100 TB:
 * no broadcast of the corpus, no cross join, skew bounded by bucket width.
 */
object Dedup {

  /** Exact duplicate groups via content hash. Returns per-doc rows with
    * the group size (dup_count > 1 = duplicated). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("content_hash")
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("dup_count", count(lit(1)).over(w))
      .select(col(idCol), col("content_hash"), col("dup_count"))
  }

  /**
   * Exact word-n-gram Jaccard over candidate pairs blocked on `blockCol`
   * (e.g. source/domain/length-bucket). O(pairs-within-block), exact.
   */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withSets = docs.select(
      col(idCol).as("doc_a"), col(blockCol).as("block"),
      shingleSet(col(textCol), n).as("set_a"))
    val right = withSets.select(
      col("doc_a").as("doc_b"), col("block"), col("set_a").as("set_b"))
    withSets.join(right, Seq("block"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /**
   * MinHash + LSH near-dup candidate pairs, verified with exact Jaccard
   * over distinct shingle sets.
   *
   * @param k     signature length (hash permutations)
   * @param bands LSH bands (rows per band = k/bands); with k=64, bands=16
   *              the candidate threshold is ~ (1/16)^(1/4) ~ 0.5
   */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands

    val sig = docs.select(
      col(idCol).as("doc"),
      shingleSet(col(textCol), shingleN).as("shingles"))
      .where(size(col("shingles")) > 0)
      .withColumn("sig",
        array((0 until k).map(s =>
          array_min(transform(col("shingles"), t => seededTokenHash(t, s)))): _*))

    // band hash per (doc, band): xxhash64 over the band's signature slice
    val banded = sig.select(
      col("doc"), col("shingles"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((b * rows until (b + 1) * rows).map(i => element_at(col("sig"), i + 1)): _*)
      }: _*)).as(Seq("band", "band_hash")))

    // candidates: pairs sharing any (band, band_hash) bucket
    val left = banded.select(col("band"), col("band_hash"),
      col("doc").as("doc_a"), col("shingles").as("set_a"))
    val right = banded.select(col("band"), col("band_hash"),
      col("doc").as("doc_b"), col("shingles").as("set_b"))
    left.join(right, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "set_a", "set_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /**
   * SimHash near-dup pairs: 64-bit TF-weighted signature; candidates share
   * one of four 16-bit chunks (guarantees recall for hamming <= 3 by
   * pigeonhole); verified by popcount hamming distance.
   */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val simUdf = udf((ts: Seq[String]) => simhash64(ts))
    val sig = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("toks"))
      .withColumn("sim", simUdf(col("toks")))
      .drop("toks")
    val chunked = sig.select(
      col("doc"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "chunk_val")))
    val left = chunked.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_a"), col("sim").as("sim_a"))
    val right = chunked.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_b"), col("sim").as("sim_b"))
    val hamming = udf((a: Long, b: Long) => hammingDistance(a, b))
    left.join(right, Seq("chunk", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", hamming(col("sim_a"), col("sim_b")))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
