package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * A1/M2/M3/M4 (SURVEY.md §2.5, §2.8): correlation-clustering feature dedup
 * — `correlated_features_filter`
 * (`/root/reference/exstream/correlation_filtering.py:7-67`).
 *
 * All pairwise Pearson correlations are computed in ONE distributed
 * aggregation pass (k(k-1)/2 `corr` aggregates — k is the feature count,
 * dozens at most, so the aggregate row is tiny); graph building and
 * connected components run driver-side on the k x k result, which is the
 * right placement: the data-sized work is the scan, the graph is O(k²).
 *
 * Deliberate divergences (SURVEY §4a quirks 4/5/7):
 *  - correlations are computed over feature columns only (the reference
 *    feeds metadata columns into `df.corr()` but never reads those entries);
 *  - the cluster representative is the member with the smallest original
 *    column index — the reference uses `set.pop()`, which is
 *    nondeterministic across processes;
 *  - the returned list is feature names only (the reference appends a
 *    nested `["type_data"]` that would crash downstream pandas).
 */
object CorrelationFilter {

  /**
   * @param wide      one row per observation, feature columns present
   * @param featureOrder feature columns in original (insertion) order
   * @return selected feature names, in original column order
   */
  def selectFeatures(
      wide: DataFrame,
      featureOrder: Seq[String],
      correlationThreshold: Double,
      cluster: Boolean): Seq[String] = {
    if (!cluster || featureOrder.size <= 1) return featureOrder

    // zero-variance features have undefined correlation (pandas yields NaN ->
    // no edge); excluding them up front keeps `corr` from dividing by zero
    // under Spark ANSI mode while preserving the no-edge semantics.
    val stds = wide.agg(
      stddev_samp(col(featureOrder.head)).as("s0"),
      featureOrder.tail.map(f => stddev_samp(col(f)).as(s"s_$f")): _*).head()
    val varying: Set[Int] = featureOrder.indices.filter { i =>
      !stds.isNullAt(i) && stds.getDouble(i) > 0.0
    }.toSet

    val pairs = for {
      i <- featureOrder.indices if varying(i)
      j <- 0 until i if varying(j)
    } yield (i, j)
    if (pairs.isEmpty) return featureOrder
    val aggs = pairs.map { case (i, j) =>
      corr(col(featureOrder(i)), col(featureOrder(j))).as(s"c_${i}_$j")
    }
    val row = wide.agg(aggs.head, aggs.tail: _*).head()

    // union-find over features; edge iff |corr| > threshold (NaN/null -> no edge)
    val parent = Array.tabulate(featureOrder.size)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      if (!row.isNullAt(k)) {
        val c = row.getDouble(k)
        if (!c.isNaN && math.abs(c) > correlationThreshold) union(i, j)
      }
    }
    featureOrder.indices.filter(i => find(i) == i).map(featureOrder)
  }
}
