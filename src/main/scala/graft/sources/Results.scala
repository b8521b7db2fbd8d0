package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ExstreamConfig

/**
 * S5/S6 (SURVEY.md §2.1): the explanation-result CSV sink and its
 * read-back + evaluation path — the reference's only quantitative
 * self-evaluation loop (`/root/reference/plot_metrics.ipynb` cell 1
 * reads the result CSVs back, cells 2-3 compute per-config mean
 * `exp_instability` / `exp_size`).
 *
 * The config is encoded in the directory name exactly as the reference
 * encodes it in its CSV filenames (`script_1.py:275-328`), so a results
 * directory is self-describing: read-back parses the config back out of
 * the path instead of trusting caller bookkeeping.
 *
 * Distribution shape: one result row per anomaly window — tiny relative
 * to the input traces — so `coalesce(1)` per config is a driver-friendly
 * single file, and the read-back is a trivially parallel CSV scan whose
 * per-file config columns come from `input_file_name()` (no shuffle).
 */
object Results {

  /** Directory name for a config, mirroring the reference's filename
    * scheme (`explanations_{with|without}_false_positive_filtering_...`). */
  def resultDirName(cfg: ExstreamConfig): String = {
    val fpTag = if (cfg.falsePositiveFiltering) "with" else "without"
    val clTag = if (cfg.cluster) "with" else "without"
    s"explanations_${fpTag}_false_positive_filtering_" +
      s"${cfg.maxDistance}_${clTag}_cluster_${cfg.correlationThreshold}"
  }

  /**
   * S5: write one config's explanation table (`constructExplanations`
   * output) as a headered CSV under `outDir`. Arrays are stringified as
   * `[a, b]` since CSV has no array type (pandas' to_csv rendering).
   */
  def writeExplanations(df: DataFrame, outDir: String, cfg: ExstreamConfig): Unit =
    df.withColumn("explanation", concat_ws(", ", col("explanation")))
      .withColumn("explanation", concat(lit("["), col("explanation"), lit("]")))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/${resultDirName(cfg)}")

  private val resultSchema = StructType(Seq(
    StructField("trace_id", StringType),
    StructField("ano_id", StringType),
    StructField("explanation", StringType),
    StructField("exp_size", IntegerType),
    StructField("exp_instability", DoubleType)))

  // the four config dimensions, re-parsed from the directory name
  private val dirPattern =
    """explanations_(with|without)_false_positive_filtering_([0-9.]+)_(with|without)_cluster_([0-9.]+)"""

  /**
   * S6: read every config's result CSV under `resultsDir` back into one
   * DataFrame, with the config decoded from each file's path and the
   * reference's `id = trace_id + "_" + ano_id` join key
   * (`plot_metrics.ipynb` cell 1).
   */
  def readExplanations(spark: SparkSession, resultsDir: String): DataFrame =
    spark.read
      .schema(resultSchema)
      .option("header", "true")
      .csv(s"$resultsDir/explanations_*")
      .withColumn("_dir", regexp_extract(input_file_name(), dirPattern, 0))
      .withColumn("fp_filtering",
        regexp_extract(col("_dir"), dirPattern, 1) === "with")
      .withColumn("max_distance",
        regexp_extract(col("_dir"), dirPattern, 2).cast("double"))
      .withColumn("cluster",
        regexp_extract(col("_dir"), dirPattern, 3) === "with")
      .withColumn("correlation_threshold",
        regexp_extract(col("_dir"), dirPattern, 4).cast("double"))
      .withColumn("id", concat_ws("_", col("trace_id"), col("ano_id")))
      .drop("_dir")

  /**
   * The notebook's evaluation aggregations (cells 2-3): per config, the
   * mean explanation instability and mean explanation size over all
   * anomaly windows.
   */
  def evalMetrics(results: DataFrame): DataFrame =
    results
      .groupBy("fp_filtering", "cluster", "max_distance", "correlation_threshold")
      .agg(
        round(avg("exp_instability"), 6).as("mean_exp_instability"),
        round(avg("exp_size"), 6).as("mean_exp_size"),
        count(lit(1)).as("n_windows"))
      .orderBy("fp_filtering", "cluster")
}
