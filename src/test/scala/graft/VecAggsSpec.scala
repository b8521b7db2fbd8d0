package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VecAggs

/**
 * The fused outer-product-sum aggregate (r14 verdict #5) against the
 * declarative double-posexplode it replaced: identical cell values on
 * every group, stable under partial/merge paths, loud on dimension
 * mixups.
 */
class VecAggsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("vec-aggs-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, Array(1L, -2L, 3L)),
      (0L, Array(4L, 5L, -6L)),
      (0L, Array(0L, 7L, 2L)),
      (1L, Array(-1L, 1L, 10L)),
      (1L, Array(2L, 2L, 2L))
    ).toDF("g", "q")
  }

  test("fused aggregate equals the double-posexplode reference, merge path included") {
    val d = 3
    // force partial buffers + merges: more partitions than rows per group
    val df = fixture.repartition(5)
    val fused = df.groupBy("g")
      .agg(VecAggs.outerProductSum(spark, "q").as("mm"))
      .select(col("g"), posexplode(col("mm")).as(Seq("idx", "m")))
      .select(col("g"), expr(s"cast(idx div $d as int)").as("i"),
        expr(s"cast(idx % $d as int)").as("j"), col("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    val ref = fixture
      .select(col("g"), col("q"), posexplode(col("q")).as(Seq("i", "xi")))
      .select(col("g"), col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .groupBy("g", "i", "j").agg(sum(expr("xi * xj")).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(fused.size == 2 * d * d)
    assert(fused == ref, "fused cells diverged from the posexplode reference")
  }

  test("symmetry and diagonal positivity hold on the fused output") {
    val d = 3
    val cells = fixture.groupBy("g")
      .agg(VecAggs.outerProductSum(spark, "q").as("mm"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    cells.values.foreach { m =>
      assert(m.length == d * d)
      for (i <- 0 until d; j <- 0 until d)
        assert(m(i * d + j) == m(j * d + i), "moment matrix not symmetric")
      for (i <- 0 until d) assert(m(i * d + i) >= 0L, "negative diagonal")
    }
  }

  test("mixed dimensions in one group fail loudly, not silently") {
    import spark.implicits._
    val bad = Seq((0L, Array(1L, 2L)), (0L, Array(1L, 2L, 3L))).toDF("g", "q")
    val e = intercept[Exception] {
      bad.groupBy("g").agg(VecAggs.outerProductSum(spark, "q").as("mm"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("mixed vector dimensions")),
      s"expected the dimension guard, got: ${messages(e).mkString(" | ")}")
  }
}
