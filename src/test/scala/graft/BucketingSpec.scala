package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/**
 * Proof-on-the-plan for the bucketing scale claim: a join of two tables
 * bucketed on the join key with the same bucket count runs WITHOUT a
 * shuffle exchange — the bucket layout already provides the required
 * distribution, so the shuffle is paid once at write time and never per
 * query. The same join over plain parquet shows the two exchanges the
 * bucketed plan avoids.
 */
class BucketingSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("co-located join on bucketed tables plans with ZERO shuffle exchanges") {
    import spark.implicits._
    val orders = (1L to 1000L).map(k => (k, s"order_$k")).toDF("key", "o_payload")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, i)).toDF("key", "item_id")

    Sources.writeBucketed(orders, "orders_b", "key", nBuckets = 4)
    Sources.writeBucketed(items, "items_b", "key", nBuckets = 4)

    val bucketedJoin = spark.table("orders_b").join(spark.table("items_b"), "key")
    val bucketedPlan = bucketedJoin.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(bucketedPlan).size
    assert(shuffles == 0, s"bucketed join still shuffles:\n$bucketedPlan")
    assert(bucketedJoin.count() == 3000)

    // the identical join over non-bucketed data pays two exchanges
    val plainJoin = orders.join(items, "key")
    val plainShuffles =
      "Exchange hashpartitioning".r.findAllIn(plainJoin.queryExecution.executedPlan.toString).size
    assert(plainShuffles >= 2, s"expected shuffles on the plain join, got $plainShuffles")
    assert(plainJoin.count() == 3000)

    // bucket-key aggregation also rides the layout: no exchange before
    // the final aggregate
    val agg = spark.table("items_b").groupBy("key").agg(count(lit(1)).as("n"))
    val aggShuffles =
      "Exchange hashpartitioning".r.findAllIn(agg.queryExecution.executedPlan.toString).size
    assert(aggShuffles == 0, "bucketed aggregation should not shuffle")
    assert(agg.count() == 1000)
  }
}
