package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Results

/**
 * S5/S6 round-trip: the result CSV sink, the read-back with config
 * decoded from the path, and the notebook's per-config mean
 * exp_instability / exp_size aggregations (plot_metrics.ipynb cells 1-3).
 */
class ResultsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("results-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture(rows: Seq[(String, String, Seq[Int], Int, Double)]) = {
    import spark.implicits._
    rows.toDF("trace_id", "ano_id", "explanation", "exp_size", "exp_instability")
  }

  test("S5/S6: sink writes config-encoded CSV, read-back restores rows and config") {
    val dir = Files.createTempDirectory("graft-results").toString
    val cfgA = ExstreamConfig(cluster = false, falsePositiveFiltering = true, maxDistance = 40.0)
    val cfgB = ExstreamConfig(cluster = true, falsePositiveFiltering = false, maxDistance = 40.0)

    Results.writeExplanations(fixture(Seq(
      ("folder_4", "6", Seq(1, 3), 2, 0.5),
      ("folder_5", "6", Seq(2), 1, 1.25))), dir, cfgA)
    Results.writeExplanations(fixture(Seq(
      ("folder_4", "6", Seq(0), 1, 2.0),
      ("folder_5", "6", Seq(4, 2, 1), 3, 1.0))), dir, cfgB)

    val back = Results.readExplanations(spark, dir)
    assert(back.count() === 4)

    val a = back.where("fp_filtering AND NOT cluster").orderBy("trace_id")
      .collect()
    assert(a.length === 2)
    val r0 = a(0)
    assert(r0.getAs[String]("trace_id") === "folder_4")
    assert(r0.getAs[String]("explanation") === "[1, 3]")
    assert(r0.getAs[Int]("exp_size") === 2)
    assert(r0.getAs[Double]("exp_instability") === 0.5)
    assert(r0.getAs[Double]("max_distance") === 40.0)
    assert(r0.getAs[Double]("correlation_threshold") === 0.6)
    assert(r0.getAs[String]("id") === "folder_4_6")

    val b = back.where("cluster AND NOT fp_filtering")
    assert(b.count() === 2)
  }

  test("S6: evalMetrics computes the notebook's per-config means") {
    val dir = Files.createTempDirectory("graft-results-eval").toString
    val cfgA = ExstreamConfig(falsePositiveFiltering = true)
    val cfgB = ExstreamConfig(cluster = true)

    Results.writeExplanations(fixture(Seq(
      ("t1", "6", Seq(1, 3), 2, 0.5),
      ("t2", "6", Seq(2), 1, 1.25))), dir, cfgA)
    Results.writeExplanations(fixture(Seq(
      ("t1", "6", Seq(0), 1, 2.0),
      ("t2", "6", Seq(4, 2, 1), 3, 1.0))), dir, cfgB)

    val m = Results.evalMetrics(Results.readExplanations(spark, dir))
      .collect()
      .map(r => (r.getAs[Boolean]("fp_filtering"), r.getAs[Boolean]("cluster")) ->
        (r.getAs[Double]("mean_exp_instability"), r.getAs[Double]("mean_exp_size"), r.getAs[Long]("n_windows")))
      .toMap

    assert(m((true, false)) === ((0.875, 1.5, 2L)))  // (0.5+1.25)/2, (2+1)/2
    assert(m((false, true)) === ((1.5, 2.0, 2L)))    // (2.0+1.0)/2, (1+3)/2
    assert(m.size === 2)
  }
}
