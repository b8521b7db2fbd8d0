package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A5/A6/A7/T2/W1 (SURVEY.md §2.5): per-(window, feature) entropy reward
 * D(f) = H_class / H_segmentation — `entropy_based_single_feature_reward`
 * (`/root/reference/exstream/entropy_based_single_reward_feature.py:203-243`)
 * as one shuffle.
 *
 * The reference loops features in Python, sorting the whole frame once per
 * feature. Here ONE `groupBy(window_key, feature)` fans the work across
 * every (window x feature) group in the cluster; the order-dependent
 * segmentation scan runs inside the group via
 * [[graft.plans.SegEntropyAgg]] — a TypedImperativeAggregate whose group
 * state is two primitive arrays with a flat serialized form, so giant
 * windows spill through ObjectHashAggregate's sort-based fallback instead
 * of accumulating boxed structs on the heap (the old collect_list + UDF
 * shape). The number of groups (windows x features) is what grows with
 * data volume, and that is exactly the axis Spark parallelizes.
 */
object EntropyReward {

  /** Feature-name -> column-position lookup as a codegen'd expression
    * (M6): `try_element_at` over a literal map instead of a scalar UDF —
    * the map is driver-side tiny (one entry per feature) and the lookup
    * inlines into whole-stage codegen, per the project rule that a UDF is
    * never used where a built-in expresses the same thing. try_ (not
    * plain element_at): under ANSI mode — Spark 4's default, which
    * library consumers may run with — element_at THROWS on a missing
    * key before coalesce can apply the default, where the udf this
    * replaced returned getOrElse(default). */
  def featIdxCol(featIdx: Map[String, Int], feature: Column,
                 default: Int = Int.MaxValue): Column =
    coalesce(try_element_at(typedLit(featIdx), feature), lit(default))

  /** H_class as a codegen'd column expression (log base 2, `entropy_...py:35-37`).
    * The reference raises when either class is empty (`:30-34`); here such
    * groups yield NULL so callers can filter them — and no division/log of
    * zero is ever evaluated, keeping the plan valid under Spark ANSI mode. */
  def classEntropyCol(nAno: Column, nRef: Column): Column = {
    val pA = nAno.cast("double") / (nAno + nRef)
    val pR = nRef.cast("double") / (nAno + nRef)
    when(nAno > 0 && nRef > 0, pA * log2(lit(1.0) / pA) + pR * log2(lit(1.0) / pR))
  }

  /**
   * @param obs observation table with at least
   *            `(window_key, feature, value, type_data)`
   * @return `(window_key, feature, class_entropy, segmentation_entropy, reward)`
   *
   * NB the reference computes H_class from the FULL window row counts
   * (refs.shape[0]/anos.shape[0], i.e. one wide row per timestamp), which in
   * long format equals per-(window, feature) class counts — every feature
   * observes every timestamp of its window.
   */
  def rewards(obs: DataFrame, applyWorstCase: Boolean = true): DataFrame = {
    val grouped = obs
      .groupBy("window_key", "feature")
      .agg(
        sum(when(col("type_data") === 1, 1L).otherwise(0L)).as("n_ano"),
        sum(when(col("type_data") === 0, 1L).otherwise(0L)).as("n_ref"),
        graft.plans.SegEntropyAgg.segEntropy(
          obs.sparkSession, "value", "type_data", applyWorstCase)
          .as("segmentation_entropy"))
    grouped
      .withColumn("class_entropy", classEntropyCol(col("n_ano"), col("n_ref")))
      // NumPy float64 semantics: x/0.0 -> +inf (the reference relies on it
      // for perfectly-separating features). Spark ANSI mode would raise, so
      // the zero case is made explicit — works under ANSI and non-ANSI alike.
      .withColumn("reward",
        when(col("segmentation_entropy") === 0.0, lit(Double.PositiveInfinity))
          .otherwise(col("class_entropy") / col("segmentation_entropy")))
      .select(col("window_key"), col("feature"), col("n_ano"), col("n_ref"),
        col("class_entropy"), col("segmentation_entropy"), col("reward"))
  }
}
