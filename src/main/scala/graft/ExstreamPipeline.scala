package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

/**
 * The full EXstream explanation pipeline (SURVEY.md §3):
 * `construct_explanations` / `get_explanatory_features`
 * (`/root/reference/script_1.py:34-95,118-184`) re-expressed as lazy Spark
 * plans over the long observation table.
 *
 * Stage shape (§3.4): scan -> broadcast interval join (no shuffle) ->
 * groupBy(window, feature) shuffle for match counts + rewards ->
 * window-function leap cutoff -> collect_list per window. All heavy work
 * is executor-side and embarrassingly parallel across (window x feature);
 * the only driver-side data are the k x k correlation matrix and the final
 * explanation rows.
 */
object ExstreamPipeline {

  /**
   * The core explanation query (§3.2): given labeled observations, return
   * per window the ranked-and-filtered explanatory feature list.
   *
   * @param obs          long observation table (IntervalLabeler output)
   * @param featureOrder original feature column order (ranking tie-break)
   * @return `(window_key, features: array<string>)`
   */
  def explanatoryFeatures(
      obs: DataFrame,
      featureOrder: Seq[String],
      cfg: ExstreamConfig): DataFrame = {
    val spark = obs.sparkSession

    // step 1: correlation-cluster feature dedup (global, driver-side graph)
    val selected: Seq[String] =
      if (cfg.cluster) {
        val wide = pivotWide(obs, featureOrder)
        CorrelationFilter.selectFeatures(wide, featureOrder, cfg.correlationThreshold, cluster = true)
      } else featureOrder
    val selectedSet = selected.toSet
    val obsSel = obs.where(col("feature").isin(selected: _*))

    // step 2: false-positive filtering (per window)
    val featIdx = featureOrder.zipWithIndex.toMap
    val obsFiltered =
      if (cfg.falsePositiveFiltering) {
        val kept = FalsePositiveFilter.matchCounts(
          obsSel, featIdx, cfg.maxDistance, cfg.matchCountKeep, cfg.patternFromRefWindow)
        FalsePositiveFilter.filterObservations(obsSel, kept)
      } else obsSel

    // step 3: entropy reward + leap cutoff
    val idxUdf = udf((f: String) => featIdx.getOrElse(f, Int.MaxValue))
    val rewards = EntropyReward.rewards(obsFiltered, cfg.applyWorstCase)
      .withColumn("feat_idx", idxUdf(col("feature")))
    LeapFilter.explanations(rewards)
  }

  /**
   * Group-level variant of the explanation query (SURVEY §3.3): the
   * notebook computes rewards per ANOMALY TYPE (all windows of a type
   * pooled) instead of per window (`testing.ipynb` cells 21-26). Any
   * grouping column works — the reward/leap operators only see
   * `window_key`, so re-keying the observation table is the whole
   * mechanism.
   */
  def explanatoryFeaturesBy(
      obs: DataFrame,
      featureOrder: Seq[String],
      cfg: ExstreamConfig,
      groupKeyCol: String): DataFrame =
    explanatoryFeatures(
      obs.withColumn("window_key", col(groupKeyCol)), featureOrder, cfg)

  /** Pivot the long observation table back to wide (one row per
    * (window, timestamp, type_data)) — needed only by the correlation step. */
  def pivotWide(obs: DataFrame, featureOrder: Seq[String]): DataFrame =
    obs.groupBy("window_key", "timestamp", "type_data")
      .pivot("feature", featureOrder)
      .agg(first("value"))

  /**
   * End-to-end batch pipeline over a trace folder (§3.1), including
   * explanation indices, exp_size and the resampled instability metric.
   *
   * @return `(trace_id, ano_id, explanation array<int>, exp_size,
   *          exp_instability)` — the reference's output CSV schema
   *          (`script_1.py:159-184`)
   */
  def constructExplanations(
      spark: SparkSession,
      dataFolder: String,
      labelFilename: String,
      cfg: ExstreamConfig): DataFrame = {
    val (traceLong, featureOrder) = Sources.readAllTraces(spark, dataFolder, labelFilename)
    val labels = Sources.readLabels(spark, s"$dataFolder/$labelFilename.csv")
      .withColumn("ano_type", udf(Sources.anomalyTypeForTrace _).apply(col("trace_id")))
    val obs = IntervalLabeler.labelObservations(traceLong, labels).cache()

    val main = explanatoryFeatures(obs, featureOrder, cfg)

    // instability: re-run the explanation query on N seeded 80% resamples
    // (`script_1.py:227-241`). The reference samples WIDE rows, i.e. whole
    // (window, class, timestamp) observations across all features jointly —
    // mirrored here by sampling the distinct key set and semi-joining.
    val resampled: Seq[DataFrame] = (0 until cfg.instabilityRounds).map { i =>
      val keys = obs.select("window_key", "type_data", "timestamp").distinct()
        .sample(withReplacement = false, cfg.sampleFraction, cfg.seed + i)
      val sampleObs = obs.join(keys, Seq("window_key", "type_data", "timestamp"), "left_semi")
      explanatoryFeatures(sampleObs, featureOrder, cfg)
        .withColumnRenamed("features", s"exp_$i")
    }

    val featIdx = featureOrder.zipWithIndex.toMap
    val idxUdf = udf((fs: Seq[String]) => fs.map(f => featIdx.getOrElse(f, -1)))
    val instabilityUdf = udf { (exps: Seq[Seq[String]]) =>
      graft.functions.EntropyCore.instabilityEntropy(exps.filter(_ != null))
    }

    val withResamples = resampled.foldLeft(main) { (acc, r) =>
      acc.join(r, Seq("window_key"), "left")
    }
    val expCols = array((0 until cfg.instabilityRounds).map(i => col(s"exp_$i")): _*)

    // window_key = ano_type_trace_id_label_row; join back to labels on the
    // real key (SURVEY §2.3 J3: the reference's positional merge is replaced
    // by an explicit key join)
    val keyed = labels.select(
      concat_ws("_", col("ano_type"), col("trace_id"), col("label_row")).as("window_key"),
      col("trace_id"), col("ano_id"))

    keyed.join(withResamples, Seq("window_key"), "inner")
      .withColumn("explanation", idxUdf(col("features")))
      .withColumn("exp_size", size(col("explanation")))
      .withColumn("exp_instability", instabilityUdf(expCols))
      .select("trace_id", "ano_id", "explanation", "exp_size", "exp_instability")
  }
}
