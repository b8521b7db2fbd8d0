package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Baseline: brute-force cosine top-k — exact, a broadcast of the (small)
 * query set against a full scan of the corpus; per-row work is one fused
 * `aggregate(zip_with(...))` dot product that stays in codegen (no UDF).
 *
 * Scale path: random-hyperplane LSH — each vector is reduced to a
 * `nBits`-bit signature; the join is keyed on the signature bucket, so
 * the corpus is shuffled once by bucket instead of cross-joined. Probing
 * neighbors within a bucket is exact cosine. This is the standard
 * bucketed-ANN layout that survives a 1000-executor corpus: candidate
 * generation is O(corpus), verification is O(bucket²) with bucket width
 * controlled by nBits.
 */
object Similarity {

  /** Element-wise dot product of two float-array columns, computed in
    * double precision (deterministic left-to-right summation). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /**
   * Exact brute-force cosine top-k: for each query vector, the k nearest
   * corpus vectors (excluding itself).
   *
   * @param corpus  (idCol, vecCol)
   * @param queries (idCol, vecCol) — expected small; broadcast
   */
  def bruteForceKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // small single-file inputs are one split; the per-row dot-product work
    // is the cost, so spread the corpus before the broadcast join
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism, col("neighbor_id"))
      .withColumn("c_norm", l2Norm(col("c_vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", l2Norm(col("q_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("c_vec"), col("q_vec")) / (col("c_norm") * col("q_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim):
    * xxhash64 scaled to [-1, 1). No RNG state — reproducible anywhere. */
  private def hyperplaneComponent(bit: Int, dim: Column): Column =
    (xxhash64(lit(bit), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane signature: one bit per hyperplane = sign of the
    * projection. Returns an integer bucket id in [0, 2^nBits). */
  def lshSignature(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * hyperplaneComponent(b, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * Bucketed ANN near-duplicate pairs: vectors sharing an LSH bucket are
   * verified with exact cosine. Recall is tuned by nBits (fewer bits =
   * bigger buckets = higher recall, more verification work).
   */
  def lshNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 8, minCosine: Double = 0.9): DataFrame = {
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshSignature(col("vec"), nBits))
      .withColumn("norm", l2Norm(col("vec")))
    val left = sig.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("norm").as("norm_a"))
    val right = sig.select(col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("norm").as("norm_b"))
    left.join(right, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .where(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact all-pairs near-duplicates above a cosine threshold (the oracle
    * for the LSH variant; quadratic — use only at validation scale). */
  def exactNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val withNorm = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism, col("id_a"))
      .withColumn("norm_a", l2Norm(col("vec_a")))
    val right = withNorm.select(col("id_a").as("id_b"),
      col("vec_a").as("vec_b"), col("norm_a").as("norm_b"))
    withNorm.crossJoin(right)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .where(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
