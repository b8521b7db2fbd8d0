package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Proof-on-the-plan for the skew claim the 100-TB design leans on: AQE's
 * runtime skew-join handling splits a hot key's oversized shuffle
 * partition into parallel sub-partitions, so one popular join key (the
 * boilerplate-template document, the null-ish user id) cannot serialize
 * a 1000-executor sort-merge join onto one straggler task. The test
 * drives a deliberately skewed join under production-shaped AQE settings
 * (thresholds scaled down to fixture size) and asserts the FINAL
 * adaptive plan marks the join skew=true — i.e. the split actually
 * happened, not just that the knob exists.
 */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("skew-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the hot key's partition: final plan shows skew=true") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 200k rows on key 0 (the hot key) vs ~100 rows per other key
      val left = spark.range(0, 210000).select(
        when(col("id") < 200000, 0L).otherwise(col("id") % 100 + 1).as("key"),
        col("id").as("payload"))
      val right = (0L to 100L).map(k => (k, s"dim_$k")).toDF("key", "dim")
      val joined = left.join(right, "key")
      // execute THIS dataset's plan (count() would build a separate
      // query execution whose adaptive plan never runs)
      assert(joined.collect().length == 210000)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
