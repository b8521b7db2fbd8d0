package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Brute-force references for the r13 rank-statistics kernels, proving
 * the scale-shaped plans compute the TEXTBOOK statistics — the same
 * measured-not-asserted discipline DecimalBridgeSpec applies to the
 * overflow bridges:
 *
 *  - q203's histogram average ranks (R2 = 2·r_prev + c + 1, centered by
 *    n+1) against per-row fractional ranks computed directly — the
 *    engine never ranks rows, so the identity is what licenses the
 *    histogram plan at any corpus size;
 *  - q211's contingency-cell concordance counting against brute-force
 *    O(n²) pair enumeration (concordant/discordant/tie counts and the
 *    closed-form tau-b);
 *  - the sign-split truncating division recipe (q204/q208/q210 oracle
 *    form, `CASE WHEN x<0 THEN -((-x)//q) ELSE x//q END`) against
 *    Scala BigInt `/`, which Spark's `div` and the driver loops rely
 *    on agreeing with — driven across negative operands where DuckDB's
 *    flooring `//` genuinely diverges (that is WHY the oracles
 *    sign-split).
 */
class RankStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("rank-stats-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("histogram average ranks == per-row fractional ranks (ties included)") {
    import spark.implicits._
    val rnd = new Random(7)
    // heavy ties: values drawn from a small alphabet
    val xs = Seq.fill(500)(rnd.nextInt(20).toLong)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

    // histogram form (q203's shape): R2 = 2*r_prev + c + 1
    val h = df.groupBy("v").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val r2 = h.withColumn("r_prev", coalesce(sum("c").over(w), lit(0L)))
      .select(col("v"), (col("r_prev") * 2 + col("c") + 1).as("r2"))
    val got = df.join(r2, "v").select(col("id"), col("r2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: average rank of equal values, doubled (exact in Long)
    val want = xs.zipWithIndex.map { case (v, i) =>
      val below = xs.count(_ < v)
      val eq = xs.count(_ == v)
      // average of ranks below+1 .. below+eq, doubled: 2*below + eq + 1
      i.toLong -> (2L * below + eq + 1)
    }.toMap
    assert(got == want)
    // centering identity the q203 plan relies on: sum of (r2 - (n+1)) = 0
    val n = xs.size
    assert(want.values.map(_ - (n + 1)).sum == 0L)
  }

  test("contingency-cell concordance == brute-force pair enumeration (tau-b)") {
    val rnd = new Random(11)
    val pts = Seq.fill(400)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))

    // brute force over all pairs
    var nc = 0L; var nd = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.size) {
      val ((xa, ya), (xb, yb)) = (pts(i), pts(j))
      val sx = (xb - xa).sign; val sy = (yb - ya).sign
      if (sx * sy > 0) nc += 1
      else if (sx * sy < 0) nd += 1
    }

    // q211's cell form: within-grid self-join on qa < qb
    val cells = pts.groupBy(identity).map { case ((x, y), g) => (x, y, g.size.toLong) }.toSeq
    var cc = 0L; var cd = 0L
    for ((xa, ya, ca) <- cells; (xb, yb, cb) <- cells if xa < xb) {
      if (ya < yb) cc += ca * cb
      else if (ya > yb) cd += ca * cb
    }
    assert(cc == nc, s"concordant: cells=$cc brute=$nc")
    assert(cd == nd, s"discordant: cells=$cd brute=$nd")

    // tie margins close the identity: nc + nd + ties == n(n-1)/2
    val n = pts.size.toLong
    val tr = pts.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val tc = pts.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val txy = pts.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    // inclusion-exclusion: pairs tied in x only + tied in y only + both
    assert(nc + nd + tr + tc - txy == n * (n - 1) / 2)
  }

  test("sign-split flooring recipe == BigInt truncating division on negatives") {
    val rnd = new Random(13)
    def floorDiv(x: BigInt, q: BigInt): BigInt =
      // DuckDB's // semantics (floor toward -inf)
      if (x.sign * q.sign < 0 && x % q != 0) x / q - 1 else x / q
    for (_ <- 1 to 2000) {
      val x = BigInt(rnd.nextLong() % 1000000000L)
      val q = BigInt(rnd.nextInt(999) + 1)
      // the oracle recipe: CASE WHEN x < 0 THEN -((-x) // q) ELSE x // q
      val recipe = if (x < 0) -floorDiv(-x, q) else floorDiv(x, q)
      assert(recipe == x / q, s"x=$x q=$q recipe=$recipe scala=${x / q}")
      // and the divergence the recipe exists to bridge is REAL:
      if (x < 0 && x % q != 0)
        assert(floorDiv(x, q) != x / q, s"expected floor/trunc divergence at x=$x q=$q")
    }
  }
}
