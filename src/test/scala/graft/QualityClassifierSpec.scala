package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/**
 * The r14-verdict-#3 trainer's contract: fixed-round integer GD whose
 * whole loop is reproducible from the feature table by independent
 * driver arithmetic — the strongest per-round proof available (the
 * DuckDB oracle re-proves the same unrolling cross-engine at every
 * scale; this spec proves the Spark aggregate path against a from-
 * scratch BigInt fold over the collected rows).
 */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("quality-classifier-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }

  import QualityClassifier.K

  test("weight trajectory matches an independent driver BigInt fold over the features") {
    val tr = QualityClassifier.train(docs, roundsN = 3)
    assert(tr.weights.length == 4 && tr.weights.head.forall(_ == 0L))

    // independent recompute: collected features, hard sigmoid and the
    // sign-split update re-implemented from the definition
    val feat = tr.feat.collect().map { r =>
      (r.getLong(1), (0 until K).map(j => r.getLong(2 + j)).toArray)
    }
    assert(feat.length == tr.n)
    var w = Array.fill(K + 1)(BigInt(0))
    for (round <- 1 to 3) {
      val g = Array.fill(K + 1)(BigInt(0))
      feat.foreach { case (ym, x) =>
        var z = w(K)
        var j = 0
        while (j < K) { z += w(j) * x(j); j += 1 }
        val zc = z.max(BigInt(-2000000)).min(BigInt(2000000))
        val pm = (zc + 2000000) / 4 // nonnegative operand: / == div
        val diff = pm - ym
        j = 0
        while (j < K) { g(j) += diff * x(j); j += 1 }
        g(K) += diff
      }
      val den = BigInt(256) * tr.n
      w = Array.tabulate(K + 1)(j => w(j) - BigInt(g(j).signum) * (g(j).abs / den))
      assert(tr.weights(round).toSeq == w.map(_.toLong).toSeq,
        s"round $round weights diverged from the independent fold")
    }
  }

  test("training is deterministic and pm stays inside [0, 1e6]") {
    val w1 = QualityClassifier.train(docs).weights.last.toSeq
    val w2 = QualityClassifier.train(docs).weights.last.toSeq
    assert(w1 == w2, "two identical train calls disagreed")

    val tr = QualityClassifier.train(docs)
    val mm = tr.feat
      .select(expr(QualityClassifier.pmSql(tr.weights.last)).as("pm"))
      .agg(min("pm").as("lo"), max("pm").as("hi")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 1000000L,
      s"hard sigmoid escaped [0, 1e6]: ${mm.mkString(",")}")
  }

  test("the trained model matches or beats the constant-classifier baselines") {
    val tr = QualityClassifier.train(docs)
    val w = tr.weights.last
    val r = tr.feat
      .select(expr(QualityClassifier.pmSql(w)).as("pm"), col("ym"))
      .agg(
        sum(when((col("pm") >= 500000L) === (col("ym") === 1000000L), 1L)
          .otherwise(0L)).as("correct"),
        sum(when(col("ym") === 1000000L, 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n")).head()
    val (correct, pos, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(correct >= math.max(pos, n - pos),
      s"trained accuracy $correct/$n under the majority baseline ${math.max(pos, n - pos)}/$n")
  }
}
