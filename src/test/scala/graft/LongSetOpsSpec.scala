package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.LongSetOps

class LongSetOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("longsetops-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kernel: intersection size matches Set semantics on random inputs") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val a = Array.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct
      val b = Array.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct
      assert(LongSetOps.intersectSize(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b)) ==
        a.toSet.intersect(b.toSet).size)
    }
  }

  test("minhash kernel rejects 64-bit token hashes loudly (input contract)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.plans.MinHashSignature
    // in-contract: md5-32 style hashes under 2^32 sign fine
    val ok = MinHashSignature.signature(
      ArrayData.toArrayData(Array(1L, 0xFFFFFFFFL)), 4)
    assert(ok.numElements() == 4)
    // out-of-contract: a raw xxhash64-style value must throw, not corrupt
    val e = intercept[IllegalArgumentException] {
      MinHashSignature.signature(
        ArrayData.toArrayData(Array(1L, 0x1_0000_0000L)), 4)
    }
    assert(e.getMessage.contains("2^32"))
  }

  test("expression agrees with built-in array_intersect in a full plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct,
      Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct))
    val df = rows.toDF("set_a", "set_b")
      .withColumn("custom", LongSetOps.longIntersectSize(spark, "set_a", "set_b"))
      .withColumn("builtin", size(array_intersect($"set_a", $"set_b")))
    assert(df.where($"custom" =!= $"builtin").count() == 0)
  }

  test("null inputs yield null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("set_a", "set_b")
      .withColumn("n", LongSetOps.longIntersectSize(spark, "set_a", "set_b"))
    assert(df.head().isNullAt(2))
  }
}
