package graft.operators

import graft.Ckpt._
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
    * double precision (deterministic left-to-right summation). This is the
    * composable HOF reference form; the operators below use the codegen'd
    * [[graft.plans.FloatVecOps]] expression, which computes the identical
    * left-to-right sum ~10x faster (HOFs evaluate interpreted). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Codegen'd dot over two array<float> columns resolved by NAME. */
  private def fdot(df: DataFrame, a: String, b: String): Column =
    graft.plans.FloatVecOps.floatDot(df.sparkSession, a, b)

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
      .withColumn("c_norm", sqrt(fdot(corpus, "c_vec", "c_vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", sqrt(fdot(queries, "q_vec", "q_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", fdot(corpus, "c_vec", "q_vec") / (col("c_norm") * col("q_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /**
   * Deterministic +/-1 hyperplane sign for (table, bit, dim): the low bit
   * of the md5 prefix of "hp:t:b:i". Rademacher hyperplanes have the same
   * angle-collision law as Gaussian ones, and — combined with the
   * power-of-two quantization below — keep the whole signature in exact
   * integer arithmetic: no float summation order to disagree on, so an
   * independent SQL engine reproduces every bucket bit-for-bit.
   */
  def hyperplaneSign(table: Int, bit: Int, dim: Int): Long =
    if ((graft.functions.PortableHash.md5LongOf(s"hp:$table:$bit:$dim", 15) & 1L) == 1L) 1L
    else -1L

  /** Sign matrix of one table: signs(bit)(dim). */
  def hyperplaneSigns(table: Int, nBits: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nBits, dim)((b, i) => hyperplaneSign(table, b, i))

  /** Power-of-two quantization: floor(x * 1024) is exact for float input
    * (the mantissa only shifts), so both engines land on the same integer. */
  def quantized(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1024.0)))

  /** Bucket id of `qvec` (a quantized vector) in one hash table: bit b =
    * sign of the projection onto the table's b-th +/-1 hyperplane. Integer
    * dot product — order-independent, cross-engine exact. */
  def lshBucket(qvec: Column, table: Int, nBits: Int, dim: Int): Column =
    (0 until nBits).map { b =>
      val signs = typedLit(hyperplaneSigns(table, nBits, dim)(b).toSeq)
      val proj = aggregate(
        zip_with(qvec, signs, (x, s) => x * s), lit(0L), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val signsCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Array[Long]]]]()

  /**
   * Fused JVM kernel for all `tables` bucket ids of one vector —
   * bit-identical to `quantized` + [[lshBucket]] (floor(x*1024) is exact
   * for float input; the +/-1 dots are integer arithmetic), but one UDF
   * call per row instead of tables x nBits interpreted HOF folds per row
   * (the column form was the measured bulk of q30's wall-clock).
   */
  def lshBucketsOf(vec: Array[Float], tables: Int, nBits: Int): Array[Long] = {
    val dim = vec.length
    val signs = signsCache.computeIfAbsent((tables, nBits, dim),
      _ => Array.tabulate(tables)(t => hyperplaneSigns(t, nBits, dim)))
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = math.floor(vec(i).toDouble * 1024.0).toLong; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        val s = signs(t)(b)
        var proj = 0L
        i = 0
        while (i < dim) { proj += q(i) * s(i); i += 1 }
        if (proj >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /**
   * Multi-table bucketed ANN near-duplicate pairs: `tables` independent
   * hash tables of `nBits` random-hyperplane bits each; vectors sharing a
   * bucket in ANY table become candidates (union, deduped on ids), then
   * exact cosine verifies. Per-pair recall at bit-collision probability p
   * is 1 - (1 - p^nBits)^tables — tune nBits ~ log2(corpus/bucket-target)
   * and tables to the recall target; a single table is a quiet quadratic
   * (one 2^nBits-way split of the corpus) at 100x scale.
   *
   * Shuffle shape: only (table, bucket, id) rows travel through the
   * candidate join; vectors are re-attached to the surviving distinct
   * pairs, so the fat payload crosses the wire once per doc.
   */
  /**
   * Deployment default for `nBits`: ceil(log2(ceil(corpus / targetBucket))).
   * Expected bucket occupancy is corpus / 2^nBits, and exact verification
   * does O(bucket²) cosine work per bucket per table — so nBits MUST grow
   * with the corpus or every bucket becomes a quiet quadratic. The q30
   * fixture value is this formula at its defaults (500 docs, target 32 →
   * 4 bits, ~31/bucket); at 1B docs the same target gives 25 bits.
   * Recompute `tables` for the recall target after changing nBits
   * (per-pair recall = 1 - (1 - p^nBits)^tables).
   */
  def lshBitsFor(corpusSize: Long, targetBucketSize: Long = 32): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, (corpusSize + targetBucketSize - 1) / targetBucketSize) - 1))
  }

  def lshNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      nBits: Int = 4, tables: Int = 24, minCosine: Double = 0.9): DataFrame = {
    // fan the per-vector bucket hashing out of the single file split; the
    // fused kernel computes all tables' buckets in one call per row.
    // Null vectors bucket nowhere (empty explode — the column form's
    // null-propagation equivalent); a vector whose length contradicts the
    // declared dim would silently diverge from any SQL reconstruction
    // built from `dim`, so that is an error, not a guess
    val bucketsUdf = udf { (vec: Seq[Float]) =>
      if (vec == null) Array.emptyLongArray
      else {
        require(vec.length == dim,
          s"embedding length ${vec.length} != declared dim $dim")
        lshBucketsOf(vec.toArray, tables, nBits)
      }
    }
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism, col("id"))
      .withColumn("buckets", bucketsUdf(col("vec")))

    val banded = sig.select(col("id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val candidates = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val vecs = sig.select(col("id"), col("vec"), sqrt(fdot(sig, "vec", "vec")).as("norm"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b")), "id_b")
      .withColumn("cosine", fdot(sig, "vec_a", "vec_b") / (col("norm_a") * col("norm_b")))
      .where(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /**
   * Spherical k-means (Lloyd's, fixed iterations) for IVF centroids,
   * trained on a bounded deterministic sample of the corpus — the
   * production counterpart of the md5-sample centroids in [[ivfKnn]].
   *
   * Scale shape: the sample is `sampleSize` rows REGARDLESS of corpus
   * size (md5-ordered, so any engine picks the same rows), collected once;
   * training is O(sampleSize x nCentroids x dim x iterations) driver-side
   * — the standard train-small/broadcast-model layout (the model is
   * nCentroids x dim floats, kilobytes). Nothing corpus-sized ever reaches
   * the driver. Deterministic end to end: md5-ordered init (identical to
   * the oracle-mode centroid choice), argmax assignment with
   * first-centroid tie-break, empty cells keep their previous centroid.
   */
  def trainIvfCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, sampleSize: Int = 8192, iterations: Int = 10): Seq[Array[Float]] = {
    val sample: Array[Array[Float]] = corpus
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(sampleSize)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "trainIvfCentroids: empty corpus")
    val k = math.min(nCentroids, sample.length)
    val dim = sample(0).length
    val norms = sample.map { v =>
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i).toDouble * v(i); i += 1 }
      math.sqrt(s)
    }
    var cents: Array[Array[Double]] = Array.tabulate(k)(c => sample(c).map(_.toDouble))
    var iter = 0
    while (iter < iterations) {
      val cnorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var r = 0
      while (r < sample.length) {
        val v = sample(r)
        var best = 0; var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i).toDouble * cents(c)(i); i += 1 }
          val den = norms(r) * cnorms(c)
          val cos = if (den == 0.0) -2.0 else d / den
          if (cos > bestCos) { bestCos = cos; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        r += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
      iter += 1
    }
    cents.toSeq.map(_.map(_.toFloat))
  }

  /**
   * IVF (inverted-file) ANN top-k: the corpus is partitioned into Voronoi
   * cells around `nCentroids` centroid vectors; a query probes only its
   * `nProbe` nearest cells and verifies exact cosine inside them — the
   * other (nCentroids - nProbe)/nCentroids of the corpus is never touched,
   * which is the pruning that makes ANN sub-linear at 100 TB.
   *
   * Default centroids are the `nCentroids` corpus vectors with the
   * smallest md5(id): a deterministic sample, so an independent engine
   * reproduces the exact cell structure (the oracle path). Pass
   * `trainedCentroids` (from [[trainIvfCentroids]]) for the production
   * path — k-means cells carve the space to the data's actual density,
   * which measurably lifts recall at the same probe budget; the
   * partition/probe mechanics are identical either way.
   *
   * Shuffle shape: assignment is a broadcast of the centroid set against
   * one corpus scan; the nearest-cell argmax is a groupBy with map-side
   * combine, so only one (id, cell, vec) row per document crosses the
   * wire. Queries (small) are broadcast to the assigned corpus for
   * verification — the corpus is never re-shuffled or cross-joined.
   *
   * (Doc applies to [[ivfCells]] + [[ivfKnn]] below; the assignment half
   * lives in [[ivfCells]] so [[semDedup]] shares the exact cell
   * structure.)
   */
  /** The Voronoi-cell assignment shared by [[ivfKnn]] and [[semDedup]]:
    * returns (normalized centroid table, per-vector assignment
    * `(id, cell, vec, norm)`). Centroid choice and the argmax tie-break
    * (cos DESC, smaller cid) follow [[ivfKnn]]'s documented convention so
    * an independent engine reproduces the exact cell structure. */
  def ivfCells(
      corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
      trainedCentroids: Option[Seq[Array[Float]]] = None): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val cents = trainedCentroids match {
      case Some(model) =>
        import spark.implicits._
        model.zipWithIndex
          .map { case (v, i) => (i.toLong, v.toSeq) }
          .toDF("cid", "c_vec")
      case None =>
        corpus
          .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
          .limit(nCells)
          .select(col(idCol).as("cid"), col(vecCol).as("c_vec"))
    }
    val centsN = cents.withColumn("c_norm", sqrt(fdot(cents, "c_vec", "c_vec")))

    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .withColumn("norm", sqrt(fdot(corpus, "vec", "vec")))
    // nearest cell per corpus vector: max (cos, -cid) struct = cos DESC
    // with ties to the smaller centroid id, partial-aggregated map-side
    val asgn = c.crossJoin(broadcast(centsN))
      .withColumn("cos", fdot(c, "vec", "c_vec") / (col("norm") * col("c_norm")))
      .groupBy("id")
      .agg(
        max(struct(col("cos"), (-col("cid")).as("neg_cid"))).as("m"),
        first("vec").as("vec"), first("norm").as("norm"))
      .select(col("id"), (-col("m.neg_cid")).as("cell"), col("vec"), col("norm"))
    (centsN, asgn)
  }

  /** Cell-count sizing rule for [[semDedup]] (the `lshBitsFor` companion):
    * cells scale WITH the corpus so the per-cell pair work stays
    * O(targetCellSize) per vector and the whole pass stays linear — a
    * fixed cell count would make every cell a quiet quadratic at 100×. */
  def ivfCellsFor(corpusSize: Long, targetCellSize: Long = 1024): Int = {
    require(corpusSize > 0 && targetCellSize > 0)
    math.max(1, ((corpusSize + targetCellSize - 1) / targetCellSize).toInt)
  }

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication" — public method): embedding
   * near-duplicate PRUNING with the quadratic bounded by clustering.
   * Vectors are assigned to Voronoi cells ([[ivfCells]]); cosine pairs are
   * examined only WITHIN a cell, and of any near-duplicate pair (cosine ≥
   * `minCosine` after the repo's round-6-before-threshold rule) the larger
   * id is marked dominated — `keep = false`. Cross-cell near-dups are
   * deliberately out of scope (the method's documented recall trade: cells
   * catch the dense semantic clusters that matter for training-data
   * volume).
   *
   * Scale shape: the only quadratic is per-cell, and [[ivfCellsFor]] sizes
   * the cell count so cells stay O(targetCellSize) regardless of corpus
   * size; the pair join ships (id, vec, norm) keyed by cell — skewed cells
   * split by AQE (joins, unlike windows, are runtime-splittable). Output:
   * one (vec_id := id, cell, keep) row per corpus vector.
   */
  def semDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, minCosine: Double,
      trainedCentroids: Option[Seq[Array[Float]]] = None): DataFrame = {
    // multi-consumer intermediate (pair join probe + build, final join) —
    // lazy localCheckpoint per the repo cache-lifecycle rule
    val asgn = ivfCells(corpus, idCol, vecCol, nCells, trainedCentroids)
      ._2.ckptLazy
    val a = asgn.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("norm").as("norm_a"))
    val b = asgn.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("norm").as("norm_b"))
    val pairs = a.join(b, "cell").where(col("id_b") < col("id_a"))
    val dominated = pairs
      .withColumn("cosine",
        round(fdot(pairs, "vec_a", "vec_b") / (col("norm_a") * col("norm_b")), 6))
      .where(col("cosine") >= minCosine)
      .select(col("id_a").as("id")).distinct()
    asgn.select("id", "cell")
      .join(dominated.withColumn("dom", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cell"), col("dom").isNull.as("keep"))
  }

  def ivfKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int, nCentroids: Int, nProbe: Int,
      trainedCentroids: Option[Seq[Array[Float]]] = None): DataFrame = {
    val (centsN, asgn) = ivfCells(corpus, idCol, vecCol, nCentroids, trainedCentroids)

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", sqrt(fdot(queries, "q_vec", "q_vec")))
    val pw = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centsN))
      .withColumn("cos", fdot(q, "q_vec", "c_vec") / (col("q_norm") * col("c_norm")))
      .withColumn("rn", row_number().over(pw))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"), col("q_vec"), col("q_norm"))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id").asc)
    asgn.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", fdot(asgn, "vec", "q_vec") / (col("norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("cosine"))
  }

  /** Sentinel default for `dfCap` in the inverted-index operators
    * ([[sparseCosinePairs]], [[containmentPairs]]): resolve via
    * [[dfCapFor]] from a broadcast corpus count instead of running with
    * an absolute constant — the `Dedup.CapAuto` pattern (r9 verdict #1:
    * production entry points must be sized BY DEFAULT; oracle paths pin
    * explicit values). */
  val DfCapAuto: Long = -1L

  /** [[dfCapFor]]'s corpus fraction: a shingle in more than 0.1% of
    * documents is a stop-shingle — its idf weight is near zero, so
    * pruning it barely moves any cosine while removing the Zipfian head
    * that drives posting-list pair fan-out. */
  val DfStopFraction: Double = 0.001

  /** [[dfCapFor]]'s floor: below ~20k docs the fraction rounds toward
    * zero and would prune every shingle; 20 keeps small-corpus recall
    * (and is the value the q108/q113 oracles pin at fixture scale). */
  val DfFloorCap: Long = 20L

  /** Posting-list df-cap sizing rule (the `lshBitsFor` companion for the
    * inverted-index operators): cap = max(floorCap, nDocs × stopFraction).
    * A posting list of length df yields df²/2 candidate pairs, so the cap
    * bounds per-shingle pair fan-out at cap × postings / 2; the
    * corpus-fraction form keeps the cap meaning "non-discriminative head"
    * as the corpus grows (an absolute cap at 100× scale would prune
    * shingles that are still rare). Callers that need STRICTLY linear
    * pair volume (cap constant in N) pin an absolute cap instead — the
    * fraction form admits O(stopFraction × N) fan-out per shingle, the
    * documented trade for scale-invariant semantics. */
  def dfCapFor(nDocs: Long,
      stopFraction: Double = DfStopFraction,
      floorCap: Long = DfFloorCap): Long = {
    require(nDocs > 0 && stopFraction > 0 && floorCap > 0)
    math.max(floorCap, (nDocs.toDouble * stopFraction).toLong)
  }

  /** [[dfCapFor]] as a column over a broadcast `n_docs` count — how
    * `DfCapAuto` resolves without a separate driver count job. */
  private def dfCapCol(dfCap: Long): Column =
    if (dfCap == DfCapAuto)
      greatest(lit(DfFloorCap), (col("n_docs") * lit(DfStopFraction)).cast("long"))
    else lit(dfCap)

  /**
   * Sparse TF-IDF cosine top-K pairs via an inverted index — the
   * IR-canonical weighted-similarity shape (distinct from dense-embedding
   * kNN and unweighted set Jaccard): documents as idf-weighted
   * `shingleN`-gram vectors, pairwise cosine computed through df-capped
   * posting lists. The scale story IS the df cap ([[dfCapFor]]): capping
   * df bounds pair volume at cap × posting count, and the pruned
   * stop-shingles leave the vector space entirely (dot AND norm — the
   * cosine is exact in the pruned space, not an approximation of the
   * unpruned one). Weights are micro-scaled integers (round(idf × 1e6)),
   * so dots and norms are exact integer sums in any order; df counts ride
   * a partial-aggregated groupBy, never a window over the Zipfian
   * shingle key. Output: (doc_a, doc_b, cosine) — top `topK` by cosine
   * desc via TakeOrderedAndProject.
   */
  def sparseCosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, dfCap: Long = DfCapAuto, topK: Int = 20): DataFrame = {
    val shUdf = udf((text: String) =>
      graft.functions.ShingleKernel.shingleStrings(text, shingleN))
    val sh = docs.select(col(idCol).as("doc_id"), explode(shUdf(col(textCol))).as("sh"))
      .ckptLazy // two consumers: df counts, postings
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val ndocs = docs.agg(count(lit(1)).as("n_docs"))
    val kept = dfreq.crossJoin(broadcast(ndocs)).where(col("df") <= dfCapCol(dfCap))
    val postings = sh.join(kept, Seq("sh"))
      .withColumn("wq", expr(
        "cast(round((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000000, 0) as bigint)"))
      .select(col("sh"), col("doc_id"), col("wq"))
      .ckptLazy // two consumers: norms, pair join
    val norms = postings.groupBy("doc_id").agg(sum(col("wq") * col("wq")).as("nrm"))
    val pairs = postings.as("a").join(postings.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wq") * col("b.wq")).as("dot"))
    pairs
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("dot").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(topK)
  }

  /**
   * Asymmetric containment pairs (excerpt/quotation duplicates) blocked
   * on RARE shingles: candidates share at least one shingle with df ≤
   * the cap ([[dfCapFor]] by default — recall needs only ONE shared rare
   * shingle), then exact set verification keeps pairs with containment =
   * |∩| / min(|A|,|B|) ≥ `minContainment` but Jaccard < `maxJaccard` —
   * exactly the length-asymmetric pairs Jaccard-LSH banding structurally
   * misses (collision probability decays with Jaccard). Verify joins are
   * id-keyed equi-joins against one checkpointed set table. Output:
   * (doc_a, doc_b, n_a, n_b, containment, jaccard), unordered.
   */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, dfCap: Long = DfCapAuto,
      minContainment: Double = 0.8, maxJaccard: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val hsetUdf = udf((text: String) =>
      graft.functions.ShingleKernel.md5ShingleSet(text, shingleN))
    val sets = docs.select(col(idCol).as("doc"), hsetUdf(col(textCol)).as("hset"))
      .where(size(col("hset")) > 0)
      // materialize the hashing behind an exchange (the q27 lesson)
      .repartition(spark.sparkContext.defaultParallelism, col("doc"))
      .ckptLazy // consumers: postings, two verify fetches
    val po = sets.select(col("doc"), explode(col("hset")).as("h"))
    // the corpus count exists only on the sized path — a pinned cap
    // (the oracle entry point) adds no count job
    val dfreq = po.groupBy("h").agg(count(lit(1)).as("df"))
    val rare = (if (dfCap == DfCapAuto)
        dfreq.crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      else dfreq)
      .where(col("df") <= dfCapCol(dfCap)).select("h")
    val rarePo = po.join(rare, Seq("h"))
    val candidates = rarePo.select(col("h"), col("doc").as("doc_a"))
      .join(rarePo.select(col("h"), col("doc").as("doc_b")), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
    val inter = graft.plans.LongSetOps
      .longIntersectSize(spark, "set_a", "set_b").cast("double")
    candidates
      .join(sets.select(col("doc").as("doc_a"), col("hset").as("set_a")), "doc_a")
      .join(sets.select(col("doc").as("doc_b"), col("hset").as("set_b")), "doc_b")
      .withColumn("li", inter)
      .withColumn("containment",
        round(col("li") / least(size(col("set_a")), size(col("set_b"))), 6))
      .withColumn("jaccard",
        round(col("li") / (size(col("set_a")) + size(col("set_b")) - col("li")), 6))
      .where(col("containment") >= minContainment && col("jaccard") < maxJaccard)
      .select(col("doc_a"), col("doc_b"),
        size(col("set_a")).cast("long").as("n_a"),
        size(col("set_b")).cast("long").as("n_b"),
        col("containment"), col("jaccard"))
  }

  /**
   * INTEGER-EXACT fixed-round Lloyd k-means (the q138 integer-iteration
   * discipline applied to clustering): vectors ride the floor(v*1024)
   * bridge, distances are exact integer L2 sums, assignment ties break
   * to the smaller centroid id, and centroid updates are truncating
   * integer divisions of exact sums (toward zero — DuckDB mirrors with
   * a sign-split `//`). Every round is therefore bit-identical in any
   * engine, which makes the trainer ORACLE-ABLE (q153 unrolls the same
   * rounds as chained CTEs) — where float Lloyd's summation-order
   * nondeterminism is the reason the IVF trainer
   * ([[trainIvfCentroids]]) was spec-only. Init is the md5-order first
   * K vectors (the q88/q128 deterministic draw). Empty clusters keep
   * their previous centroid (COALESCE in the oracle).
   *
   * Scale shape: per round, ONE narrow assignment pass over the corpus
   * (a fused integer kernel with the K x D centroid table in the task
   * closure) and one partial-aggregated (cid, pos) groupBy; driver
   * traffic is the K x D centroid matrix per round (the
   * BpeTrainer/GraphRank decision-scalar rule). Returns (centroids,
   * cluster sizes of the final assignment).
   */
  def kmeansTrainExact(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): (Array[Array[Long]], Array[Long]) =
    kmeansTrainExactQuantized(
      corpus.select(col(idCol).as("vid"), quantized(col(vecCol)).as("q"))
        .ckptLazy, // consumers: init pick + per-round passes
      k, rounds)

  /** [[kmeansTrainExact]] over an ALREADY-QUANTIZED (vid, q: array<long>)
    * table (r13, the r11 #6 / r12 #3 sizing-pass audit: callers that
    * already own a checkpointed quantized table — hardNegativesAdc —
    * train from it instead of re-scanning + re-quantizing the corpus).
    * Caller owns multi-consumer protection (localCheckpoint) of `qv`. */
  def kmeansTrainExactQuantized(
      qv: DataFrame, k: Int, rounds: Int): (Array[Array[Long]], Array[Long]) = {
    require(k > 0 && rounds >= 1)
    val init = qv.select(col("vid"), col("q"),
        expr("cast(conv(substr(md5(cast(cast(vid as string) as binary)), 1, 15), 16, 10) as bigint)")
          .as("m"))
      .orderBy("m", "vid").limit(k).collect()
    require(init.length == k, s"corpus smaller than k=$k")
    var cents: Array[Array[Long]] = init.map(_.getSeq[Long](1).toArray)
    val dim = cents(0).length
    var sizes: Array[Long] = Array.fill(k)(0L)
    for (_ <- 1 to rounds) {
      val bc = cents.map(_.clone)
      val assignUdf = udf((q: Array[Long]) => {
        var best = 0
        var bd = Long.MaxValue
        var c = 0
        while (c < bc.length) {
          val cent = bc(c)
          var dsum = 0L
          var i = 0
          while (i < cent.length) {
            val df0 = q(i) - cent(i)
            dsum += df0 * df0
            i += 1
          }
          if (dsum < bd) { bd = dsum; best = c } // strict <: ties keep min cid
          c += 1
        }
        best
      })
      val stats = qv.withColumn("cid", assignUdf(col("q")))
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "vq")))
        .groupBy("cid", "pos").agg(sum("vq").as("sv"), count(lit(1)).as("n"))
        .collect() // K x D rows — aggregate-sized
      val sums = Array.fill(k, dim)(0L)
      val ns = Array.fill(k)(0L)
      stats.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        sums(c)(p) = r.getLong(2)
        if (p == 0) ns(c) = r.getLong(3)
      }
      // Java / truncates toward zero = the oracle's sign-split `//`
      cents = Array.tabulate(k)(c =>
        if (ns(c) > 0) Array.tabulate(dim)(p => sums(c)(p) / ns(c)) else bc(c))
      sizes = ns
    }
    (cents, sizes)
  }

  /**
   * INTEGER-EXACT product-quantization codebook training (Jégou, Douze &
   * Schmid 2011, "Product Quantization for Nearest Neighbor Search" —
   * public method): the vector splits into `nSub` contiguous subspaces
   * and each subspace trains its own K-centroid codebook — a vector then
   * encodes as nSub small codes (the memory-compression step IVF cells
   * don't provide). Training is [[kmeansTrainExact]]'s integer Lloyd run
   * for ALL subspaces in the same per-round passes: one fused kernel
   * computes every subspace's nearest code per vector, and one
   * partial-aggregated (sub, cid, pos) groupBy feeds the K x D driver
   * update — adding subspaces adds NO passes. Same determinism story
   * (integer L2, min-cid ties, sign-split truncating updates, md5-order
   * shared seeds, empty codes keep their seed), so q154 oracles the
   * whole trainer cross-engine with a `sub` column threaded through the
   * unrolled CTEs.
   *
   * @return (cents(sub)(cid)(posInSub), sizes(sub)(cid) of the final
   *         assignment)
   */
  def pqTrainExact(
      corpus: DataFrame, idCol: String, vecCol: String,
      nSub: Int = 4, k: Int = 8, rounds: Int = 3)
      : (Array[Array[Array[Long]]], Array[Array[Long]]) =
    pqTrainExactQuantized(
      corpus.select(col(idCol).as("vid"), quantized(col(vecCol)).as("q"))
        .ckptLazy, // consumers: init pick + per-round passes
      nSub, k, rounds)

  /** [[pqTrainExact]] over an ALREADY-QUANTIZED (vid, q: array<long>)
    * table — the residual-encoding entry (r10 verdict #2): IVFADC trains
    * its codebooks on r = q − cellCentroid(cell(q)), an integer
    * subtraction under the floor(v*1024) bridge, so the whole exactness
    * story extends to residuals with no new float discipline. Caller owns
    * multi-consumer protection (localCheckpoint) of `qv`. */
  def pqTrainExactQuantized(
      qv: DataFrame, nSub: Int, k: Int, rounds: Int)
      : (Array[Array[Array[Long]]], Array[Array[Long]]) = {
    require(nSub > 0 && k > 0 && rounds >= 1)
    val init = qv.select(col("vid"), col("q"),
        expr("cast(conv(substr(md5(cast(cast(vid as string) as binary)), 1, 15), 16, 10) as bigint)")
          .as("m"))
      .orderBy("m", "vid").limit(k).collect()
    require(init.length == k, s"corpus smaller than k=$k")
    val dim = init.head.getSeq[Long](1).length
    require(dim % nSub == 0, s"dim=$dim not divisible by nSub=$nSub")
    val subDim = dim / nSub
    var cents: Array[Array[Array[Long]]] = Array.tabulate(nSub) { s =>
      init.map(_.getSeq[Long](1).slice(s * subDim, (s + 1) * subDim).toArray)
    }
    var sizes: Array[Array[Long]] = Array.fill(nSub, k)(0L)
    for (_ <- 1 to rounds) {
      val bc = cents.map(_.map(_.clone))
      val assignUdf = udf((q: Array[Long]) => pqNearestCodes(q, bc))
      val stats = qv.withColumn("cids", assignUdf(col("q")))
        .select(col("cids"), posexplode(col("q")).as(Seq("pos", "vq")))
        .withColumn("sub", (col("pos") / lit(subDim)).cast("int"))
        .withColumn("cid", element_at(col("cids"), col("sub") + 1))
        .groupBy("sub", "cid", "pos")
        .agg(sum("vq").as("sv"), count(lit(1)).as("n"))
        .collect() // nSub x K x subDim rows — aggregate-sized
      val sums = Array.fill(nSub, k, subDim)(0L)
      val ns = Array.fill(nSub, k)(0L)
      stats.foreach { r =>
        val s = r.getInt(0); val c = r.getInt(1); val p = r.getInt(2)
        sums(s)(c)(p - s * subDim) = r.getLong(3)
        if (p == s * subDim) ns(s)(c) = r.getLong(4)
      }
      cents = Array.tabulate(nSub)(s => Array.tabulate(k)(c =>
        if (ns(s)(c) > 0) Array.tabulate(subDim)(p => sums(s)(c)(p) / ns(s)(c))
        else bc(s)(c)))
      sizes = ns
    }
    (cents, sizes)
  }

  /** Per-query ADC lookup table (Jégou et al. 2011 §V, the real ADC
    * scoring shape — r10 verdict #8): lut(sub)(code) = integer
    * ||q_sub − cent(sub)(code)||², precomputed ONCE per query so scoring
    * a candidate's code word costs nSub table lookups instead of a
    * dim-wide walk (O(nSub) vs O(dim) per corpus row). The per-sub
    * distances are the SAME integer terms the direct walk sums, so ADC
    * totals — and therefore oracle hashes — are unchanged by
    * construction. */
  def adcLut(qq: Array[Long], cents: Array[Array[Array[Long]]])
      : Array[Array[Long]] = {
    val nSub = cents.length
    val subDim = cents(0)(0).length
    Array.tabulate(nSub) { s =>
      Array.tabulate(cents(s).length) { c =>
        val cent = cents(s)(c)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val df0 = qq(s * subDim + i) - cent(i)
          d += df0 * df0
          i += 1
        }
        d
      }
    }
  }

  /** Nearest code per subspace under integer L2, ties to the smaller
    * code id — the shared PQ encode kernel ([[pqTrainExact]] rounds,
    * corpus encoding for ADC search). Deterministic; the oracle mirrors
    * it with a row_number over (dist, cid). */
  def pqNearestCodes(q: Array[Long], cents: Array[Array[Array[Long]]]): Array[Int] = {
    val nSub = cents.length
    val k = cents(0).length
    val subDim = cents(0)(0).length
    Array.tabulate(nSub) { s =>
      var best = 0
      var bd = Long.MaxValue
      var c = 0
      while (c < k) {
        val cent = cents(s)(c)
        var dsum = 0L
        var i = 0
        while (i < subDim) {
          val df0 = q(s * subDim + i) - cent(i)
          dsum += df0 * df0
          i += 1
        }
        if (dsum < bd) { bd = dsum; best = c } // ties keep min cid
        c += 1
      }
      best
    }
  }

  /**
   * PQ reconstruction-error audit under trained codebooks (the
   * sketch-next-to-exact theme of q123/q125/q140: the compression's cost
   * as DATA): each vector encodes to its nearest code per subspace and
   * the chosen integer L2 distances SUM to the exact reconstruction
   * error — all-integer end to end (per-dim mean is a truncating
   * division), so the audit needs no float discipline at all. One
   * narrow kernel pass; output is label-sized.
   */
  def pqReconstructionError(
      corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      cents: Array[Array[Array[Long]]]): DataFrame = {
    val nSub = cents.length
    val k = cents(0).length
    val subDim = cents(0)(0).length
    val dim = nSub * subDim
    val errUdf = udf((q: Array[Long]) => {
      var total = 0L
      var s = 0
      while (s < nSub) {
        var bd = Long.MaxValue
        var c = 0
        while (c < k) {
          val cent = cents(s)(c)
          var dsum = 0L
          var i = 0
          while (i < subDim) {
            val df0 = q(s * subDim + i) - cent(i)
            dsum += df0 * df0
            i += 1
          }
          if (dsum < bd) bd = dsum
          c += 1
        }
        total += bd
        s += 1
      }
      total
    })
    corpus.select(col(labelCol).as("label"),
        errUdf(quantized(col(vecCol))).as("err"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum("err").as("total_err"))
      .select(col("label"), col("n_vecs"), col("total_err"),
        expr(s"total_err div (n_vecs * $dim)").as("err_per_dim"))
  }

  /** Two-level top-k shard-count sizing rule (the `lshBitsFor`/`dfCapFor`
    * companion for the per-query ranking stage — r10 verdict #3: the
    * audit queries' literal 32 promoted to the repo's sizing-rule
    * discipline): enough shards that one (query, shard) window partition
    * holds ≤ ~4M corpus rows, at least 32 for parallelism, capped so the
    * re-rank stage (nQueries × shards × k rows) stays aggregate-sized.
    * The ANSWER is invariant in the shard count — each query's true
    * top-k survives any per-shard filtering ≥ k (AnnAuditSpec proves
    * it) — so this tunes task size only. */
  def topkShardsFor(nQueries: Long, corpusSize: Long): Int = {
    require(nQueries > 0 && corpusSize >= 0)
    val bySize = math.max(32L, (corpusSize + (1L << 22) - 1) / (1L << 22))
    val reRankCap = math.max(32L, 4000000L / nQueries)
    math.min(bySize, reRankCap).toInt
  }

  /** Per-query top-k ids, TWO-LEVEL (the few-key-window discipline): a
    * per-(query, id-hash-shard) window filters to k survivors per shard,
    * then the ≤ shards×k winners re-rank in one tiny per-query window —
    * a direct per-query window would put one query's whole corpus
    * partition in a single task. Ties break on (dist, id) both levels,
    * so the result is exactly the global top-k for ANY shards ≥ 1. */
  def twoLevelTopK(scored: DataFrame, queryCol: String, idCol: String,
                   distCol: String, k: Int, shards: Int): DataFrame = {
    require(k > 0 && shards > 0)
    val w1 = Window.partitionBy(col(queryCol), col("__shard"))
      .orderBy(col(distCol), col(idCol))
    val w2 = Window.partitionBy(col(queryCol)).orderBy(col(distCol), col(idCol))
    scored.withColumn("__shard", pmod(col(idCol), lit(shards.toLong)).cast("int"))
      .withColumn("__rn", row_number().over(w1)).where(col("__rn") <= k)
      .withColumn("__rn2", row_number().over(w2)).where(col("__rn2") <= k)
      .select(col(queryCol), col(idCol))
  }

  /** Deterministic md5-order audit-query draw (r10 verdict #3: the
    * hardcoded `vid < 8` replaced by the q128/q153 draw pattern — no
    * contiguous-id assumption, reproducible in any engine): the first
    * `n` ids of `qv` (vid, q) in md5("q:" ++ vid) order, collected as
    * driver scalars (n × dim — aggregate-sized). The "q:" salt decouples
    * the draw from the k-means seed draw, which orders by the unsalted
    * md5 of the same ids. */
  def auditQueryDraw(qv: DataFrame, n: Int): Array[(Long, Array[Long])] = {
    require(n > 0)
    qv.select(col("vid"), col("q"),
        expr("cast(conv(substr(md5(cast(concat('q:', cast(vid as string)) " +
          "as binary)), 1, 15), 16, 10) as bigint)").as("m"))
      .orderBy("m", "vid").limit(n).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
  }

  /** Sentinel: resolve the hard-negative cell count via [[ivfCellsFor]]
    * (the CapAuto pattern — the same sizing rule semDedup rides, so
    * same-cell pair volume stays linear in the corpus); oracle-adjacent
    * callers pin an explicit value. */
  val CellsAuto: Int = -1

  /**
   * ANN-MINED HARD NEGATIVES (the ANCE/DPR recipe — q164's operator
   * surface): for every anchor, the `kNeg` nearest DIFFERENT-`labelCol`
   * vectors among its own IVF cell's members, ranked by PQ ADC.
   * Trains q153 cells + q154 codebooks internally; every distance is
   * integer ADC so the whole mine is oracle-able cross-engine.
   *
   * Scale shape: the per-anchor lookup is the N×nSub×k distance TABLE
   * (the pqd4 grain — one narrow kernel pass, never N driver closures);
   * candidate volume is Σ|cell|²×nSub, bounded by [[ivfCellsFor]]'s
   * target cell size at [[CellsAuto]]; the rank window partitions by
   * anchor (N keys, cell-bounded partitions — not a few-key window).
   */
  def hardNegativesAdc(
      corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      kNeg: Int = 4, cells: Int = CellsAuto,
      nSub: Int = 4, k: Int = 8, rounds: Int = 3): DataFrame = {
    require(kNeg > 0)
    // ONE corpus scan total (r13, closing r11 #6 / r12 #3): the
    // checkpointed quantized table is built FIRST; the CellsAuto sizing
    // count runs on it and so DOUBLES as the checkpoint materialization
    // (the rtbfApply pattern) — both trainings and the anchor/member
    // projections then read checkpointed blocks instead of re-scanning
    // and re-quantizing the corpus (previously: a standalone
    // corpus.count() plus two quantizing scans).
    val qv = corpus.select(col(idCol).as("vid"), col(labelCol).as("lbl"),
        quantized(col(vecCol)).as("q"))
      .ckptLazy // consumers: sizing count, 2 trainings, anchors, members
    val nCells =
      if (cells == CellsAuto) ivfCellsFor(qv.count()) else cells
    val qvPlain = qv.select("vid", "q")
    val (cellCents, _) = kmeansTrainExactQuantized(qvPlain, nCells, rounds)
    val (cents, _) = pqTrainExactQuantized(qvPlain, nSub, k, rounds)
    val cellWrap = Array(cellCents)
    val cellUdf = udf((q: Array[Long]) => pqNearestCodes(q, cellWrap)(0))
    val lutUdf = udf((q: Array[Long]) => {
      val lut = adcLut(q.toArray, cents)
      for (s2 <- lut.indices; c <- lut(s2).indices)
        yield (s2, c, lut(s2)(c))
    })
    val anchors = qv
      .select(col("vid").as("anchor_id"), col("lbl").as("la"),
        cellUdf(col("q")).as("cell"), explode(lutUdf(col("q"))).as("t"))
      .select(col("anchor_id"), col("la"), col("cell"),
        col("t._1").as("sub"), col("t._2").as("cid"), col("t._3").as("dist"))
    val codesUdf = udf((q: Array[Long]) => pqNearestCodes(q, cents).toSeq)
    val members = qv
      .select(col("vid").as("neg_id"), col("lbl").as("lb"),
        cellUdf(col("q")).as("cell"),
        posexplode(codesUdf(col("q"))).as(Seq("sub", "cid")))
    val w = Window.partitionBy("anchor_id").orderBy(col("adc"), col("neg_id"))
    members.join(anchors, Seq("cell", "sub", "cid"))
      .where(col("anchor_id") =!= col("neg_id") && col("la") =!= col("lb"))
      .groupBy("anchor_id", "neg_id").agg(sum("dist").as("adc"))
      .withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= kNeg)
      .select("anchor_id", "neg_rank", "neg_id", "adc")
  }

  /** Exact all-pairs near-duplicates above a cosine threshold (the oracle
    * for the LSH variant; quadratic — use only at validation scale). */
  def exactNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val withNorm = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism, col("id_a"))
      .withColumn("norm_a", sqrt(fdot(corpus, "vec_a", "vec_a")))
    val right = withNorm.select(col("id_a").as("id_b"),
      col("vec_a").as("vec_b"), col("norm_a").as("norm_b"))
    withNorm.crossJoin(right)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", fdot(corpus, "vec_a", "vec_b") / (col("norm_a") * col("norm_b")))
      .where(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
