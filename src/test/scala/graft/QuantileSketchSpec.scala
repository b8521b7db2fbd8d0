package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Pins the 100-TB scale path of q56_length_quantiles: exact
 * `percentile` buffers each group's values, so at corpus scale the same
 * query swaps in `approx_percentile` (mergeable sketch partials, bounded
 * memory). These tests bound the sketch's rank error against the exact
 * path so the swap is a measured trade, not a hope.
 */
class QuantileSketchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("quantile-sketch-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("approx_percentile rank error stays within n/accuracy on 100k uniform values") {
    // value == rank for a uniform range, so value error IS rank error.
    // accuracy=1000 guarantees rank error <= n/1000 = 100; assert with 2x
    // slack to keep the test robust to boundary conventions.
    val n = 100000L
    val df = spark.range(0L, n + 1).toDF("x").repartition(8) // force partial-sketch merges
    val row = df.agg(
      expr("approx_percentile(x, array(0.5D, 0.9D, 0.99D), 1000)").as("qs")).head()
    val qs = row.getSeq[Long](0)
    val targets = Seq(0.5, 0.9, 0.99).map(p => (p * n).toLong)
    qs.zip(targets).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 200, s"rank error ${math.abs(got - want)} at target $want")
    }
  }

  test("approx_count_distinct (HLL++) holds its rsd bound on 200k distinct values") {
    // vocabulary-size estimation is the cardinality twin of q56's sketch
    // swap: exact countDistinct shuffles every distinct value; the HLL++
    // sketch is a few KB per partition, merged map-side. rsd=0.02 is the
    // requested standard error; assert within 3 sigma.
    val n = 200000L
    val df = spark.range(0L, n).toDF("x").repartition(8)
    val approx = df.agg(expr("approx_count_distinct(x, 0.02)")).head().getLong(0)
    assert(math.abs(approx - n) <= n * 0.06, s"HLL estimate $approx vs $n")
  }

  test("freqItems (heavy hitters) finds every true-frequent token, one pass") {
    // the third sketch of the family (quantiles, cardinality, frequency):
    // freqItems guarantees every item with frequency > support appears in
    // the result — false positives possible, false negatives not. One
    // pass, mergeable partials, no vocabulary-sized shuffle.
    import spark.implicits._
    val hot = Seq.fill(5000)("hot_token")
    val cold = (0 until 20000).map(i => s"tok_$i")
    val df = (hot ++ cold).toDF("token").repartition(8)
    val items = df.stat.freqItems(Seq("token"), 0.15)
      .head().getSeq[String](0)
    assert(items.contains("hot_token"),
      s"heavy hitter missing from sketch result: $items")
  }

  test("count-min sketch: every estimate >= truth, overestimate within eps*n") {
    // the fourth sketch of the family (quantiles, cardinality, frequency
    // membership — and now per-item COUNTS): CMS never underestimates,
    // and with depth d = ceil(ln(1/delta)), width w = ceil(e/eps) the
    // overestimate stays under eps * n with probability 1 - delta. A few
    // KB of state per partition, merged associatively — per-token counts
    // at corpus scale without a vocabulary-sized shuffle.
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // Zipf-ish: token_k appears ~ 20000/k times
    val rows = (1 to 50).flatMap(k => Seq.fill(20000 / k)(s"token_$k"))
    val shuffled = rnd.shuffle(rows)
    val df = shuffled.toDF("token").repartition(8)
    val eps = 0.001
    val cms = df.stat.countMinSketch(col("token"), eps = eps, confidence = 0.99, seed = 17)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    for (k <- Seq(1, 2, 5, 10, 50)) {
      val est = cms.estimateCount(s"token_$k")
      val t = truth(s"token_$k")
      assert(est >= t, s"CMS underestimated token_$k: $est < $t")
      assert(est - t <= (eps * n).toLong * 2,
        s"CMS overestimate ${est - t} beyond 2*eps*n for token_$k")
    }
  }

  test("q56's grouped shape: sketch p50 within rank tolerance of exact per lang") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val joined = docs.groupBy("lang").agg(
      expr("percentile(n_chars, 0.5D)").as("exact_p50"),
      expr("approx_percentile(n_chars, 0.5D, 10000)").as("approx_p50"),
      count(lit(1)).as("n"),
      expr("percentile(n_chars, 0.45D)").as("lo"),
      expr("percentile(n_chars, 0.55D)").as("hi"))
    joined.collect().foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val approx = r.getAs[Long]("approx_p50").toDouble
      // at accuracy=10000 and per-lang n in the tens, rank error is 0; the
      // sketch must return an actual sample within the +/-5%-rank band
      assert(approx >= lo - 1e-9 && approx <= hi + 1e-9,
        s"lang ${r.getString(0)}: approx $approx outside [$lo, $hi]")
    }
  }
}
