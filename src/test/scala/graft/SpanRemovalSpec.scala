package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantics + complexity lock for q105's trimmed-text reconstruction
 * (r9 verdict #2): the O(L) `array_except` hash/merge form must equal
 * the prior O(L x |cov|) per-position `array_contains` form on every
 * coverage shape, and must scale LINEARLY in document length on a
 * heavily-covered long document (>= 100k tokens) — the shape where the
 * quadratic form pays ~10^10 comparisons.
 */
class SpanRemovalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("span-removal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the q105 production form (O(L)): hash-set difference of positions
  private val linearForm =
    "CASE WHEN cov IS NULL THEN concat_ws(' ', t) ELSE concat_ws(' ', transform(" +
      "array_except(sequence(cast(1 as bigint), cast(size(t) as bigint)), cov), " +
      "i -> element_at(t, cast(i as int)))) END"

  // the pre-r10 form (O(L * |cov|)): per-position membership probe
  private val quadraticForm =
    "concat_ws(' ', filter(transform(sequence(1, size(t)), i -> " +
      "CASE WHEN cov IS NULL OR NOT array_contains(cov, cast(i AS bigint)) " +
      "THEN element_at(t, i) END), x -> x IS NOT NULL))"

  private def fixture(rows: Seq[(Long, Seq[String], Option[Seq[Long]])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "t", "cov")
  }

  test("array_except reconstruction equals the per-position form on every coverage shape") {
    val toks = (1 to 50).map(i => s"tok$i")
    val shapes = Seq(
      (1L, toks, None), // uncovered doc (NULL cov — the left-join miss)
      (2L, toks, Some((1L to 50L))), // fully covered -> empty text
      (3L, toks, Some(Seq(1L))), // head only
      (4L, toks, Some(Seq(50L))), // tail only
      (5L, toks, Some(Seq(10L, 11L, 12L, 30L, 45L, 46L))), // mixed spans
      (6L, toks, Some((2L to 50L by 2))), // alternating
      (7L, Seq("single"), Some(Seq(1L))), // 1-token doc fully covered
      (8L, Seq("single"), None))
      .map { case (id, t, c) => (id, t.toSeq, c.map(_.toSeq)) }
    val df = fixture(shapes)
      .select(col("doc_id"), expr(linearForm).as("lin"), expr(quadraticForm).as("quad"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"forms diverge on doc ${r.getLong(0)}: '${r.getString(1)}' vs '${r.getString(2)}'")
    }
    // spot-check absolute values, not just mutual agreement
    val byId = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == toks.mkString(" "))
    assert(byId(2L) == "")
    assert(byId(3L) == toks.drop(1).mkString(" "))
    assert(byId(7L) == "")
  }

  private def heavyDoc(n: Int): (Seq[String], Seq[Long]) = {
    // heavily covered: 99% of positions removed (every 100th survives) —
    // |cov| ~ L, the worst case for the per-position probe
    val t = (1 to n).map(i => s"w$i")
    val cov = (1L to n.toLong).filter(_ % 100 != 0)
    (t, cov)
  }

  private def timeForm(form: String, n: Int): Double = {
    val df = fixture(Seq((1L, heavyDoc(n)._1, Some(heavyDoc(n)._2))))
      .select(length(expr(form)).as("len"))
    val t0 = System.nanoTime()
    val len = df.collect()(0).getInt(0)
    val sec = (System.nanoTime() - t0) / 1e9
    // 1% of n tokens survive, each "w<i>" averaging ~6-7 chars + spaces
    assert(len > n / 100 * 3, s"suspicious output length $len for n=$n")
    sec
  }

  test("linear scaling on a heavily-covered 100k-token document") {
    // warmup (codegen + JIT)
    timeForm(linearForm, 1000)
    val t12k = timeForm(linearForm, 12500)
    val t100k = timeForm(linearForm, 100000)
    // 8x the tokens: linear -> 8x, quadratic -> 64x; assert well under
    // the quadratic slope with a generous contention margin
    assert(t100k / math.max(t12k, 0.001) < 24.0,
      s"reconstruction not linear: 12.5k=$t12k s, 100k=$t100k s")
    // absolute envelope: the quadratic form pays ~10^10 comparisons here
    // (minutes); the linear form is a single-doc projection
    assert(t100k < 30.0, s"100k-token reconstruction took $t100k s")
    // and the old form is measurably slower already at 12.5k tokens
    // (~1.5 x 10^8 probes) — the regression this spec exists to block
    val q12k = timeForm(quadraticForm, 12500)
    assert(q12k > t12k, s"expected the per-position form ($q12k s) to lag O(L) ($t12k s)")
  }
}
