package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrder

/**
 * The Z-order layout claim, proven on scan metrics: with small parquet
 * row groups, a 2-D box predicate over a Z-ORDERED file decodes a small
 * fraction of the rows (row-group min/max stats skip groups outside the
 * box in EITHER dimension), while the same predicate over a
 * single-column-sorted file must decode every row group whose x-range
 * matches — the y dimension is scattered, so its min/max spans
 * everything and prunes nothing.
 */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("zorder-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => (other.children ++ other.subqueries).flatMap(collectScans)
  }

  test("morton bits: known values and monotone locality") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (4095L, 4095L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L) // x on even bits
    assert(rows((0L, 1L)) == 2L) // y on odd bits
    assert(rows((1L, 1L)) == 3L)
    assert(rows((2L, 2L)) == 12L) // bit 1 of each -> bits 2,3
    assert(rows((4095L, 4095L)) == (1L << 24) - 1) // 12+12 interleaved bits
  }

  test("2-D box over a z-ordered file decodes far fewer rows than over an x-sorted file") {
    import spark.implicits._
    val n = 200000
    // uniform 2-D grid: x and y independent, 0..1023
    val rnd = new scala.util.Random(21)
    val df = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }.toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // small row groups so stats-based skipping has granularity
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    df.withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .repartitionByRange(4, col("z")).sortWithinPartitions("z")
      .drop("z")
      .write.options(opts).mode("overwrite").parquet(s"$dir/zsorted")
    df.repartitionByRange(4, col("x")).sortWithinPartitions("x", "y")
      .write.options(opts).mode("overwrite").parquet(s"$dir/xsorted")

    def decodedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .where(col("x").between(100, 163) && col("y").between(200, 263))
      assert(q.count() > 0) // the box is non-empty
      val scans = collectScans(q.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      // numOutputRows of the scan = rows DECODED from surviving row
      // groups (the row-level Filter sits above); pushed filters prune
      // whole groups via footer min/max
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRows = decodedRows(s"$dir/zsorted")
    val xRows = decodedRows(s"$dir/xsorted")
    // the x-sorted layout prunes on x only; z-ordering prunes on both
    // dimensions, so it must decode several times fewer rows
    assert(zRows * 3 <= xRows,
      s"z-order pruning too weak: decoded $zRows vs x-sorted $xRows of $n")
  }
}
