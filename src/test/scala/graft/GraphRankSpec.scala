package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphRank

/**
 * GraphRank pinned against a dense driver-side power iteration of the
 * identical formulation: the distributed joins-and-aggregates loop must
 * reproduce the reference math to float tolerance, rank the authority
 * structure correctly, terminate early once converged (tolerance mode),
 * and — with dangling redistribution on — conserve probability mass
 * exactly.
 */
class GraphRankSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graph-rank-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def densePageRank(
      nodes: Seq[Long], edges: Seq[(Long, Long)],
      damping: Double, iterations: Int,
      redistributeDangling: Boolean = false): Map[Long, Double] = {
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nodes.size
    var rank = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iterations) {
      val dm = if (redistributeDangling)
        nodes.filter(v => !out.contains(v)).map(v => rank(idx(v))).sum
      else 0.0
      val next = Array.fill(n)((1 - damping) / n + damping * dm / n)
      for ((s, d) <- edges)
        next(idx(d)) += damping * rank(idx(s)) / out(s)
      rank = next
    }
    nodes.map(v => v -> rank(idx(v))).toMap
  }

  // a hub with 6 spokes pointing at it (plus back-edges so nothing
  // dangles), a separate 3-cycle, and a 2-chain with a sink
  private val star = (1L to 6L).flatMap(s => Seq((100L + s, 100L), (100L, 100L + s)))
  private val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
  private val chain = Seq((50L, 51L)) // 51 is a sink
  private val edges = star ++ cycle ++ chain
  private val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted

  test("distributed ranks match the dense power iteration; hub outranks spokes") {
    import spark.implicits._
    // tol = 0 disables the early exit: exactly 25 rounds, the
    // deterministic mode the dense reference (and the q78 oracle) pins
    val got = GraphRank.pageRank(edges.toDF("src", "dst"), damping = 0.85,
      maxIterations = 25, tol = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = densePageRank(nodes, edges.distinct, 0.85, 25)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
    // the hub holds the most rank; every spoke is equal by symmetry
    assert(got(100L) == got.values.max)
    val spokes = (1L to 6L).map(s => got(100L + s))
    assert(spokes.forall(s => math.abs(s - spokes.head) < 1e-12))
    // mass conservation up to the sink leak: total <= 1, > 0.8
    val total = got.values.sum
    assert(total <= 1.0 + 1e-9 && total > 0.8, s"mass $total")
  }

  test("tolerance mode exits early once converged, at the fixpoint") {
    import spark.implicits._
    // the power iteration contracts by ~damping per round, so delta
    // reaches 1e-6 in ~65 rounds — comfortably inside the cap, far from
    // instant
    val (ranksDf, rounds) = GraphRank.pageRankWithRounds(
      edges.toDF("src", "dst"), damping = 0.85, maxIterations = 100, tol = 1e-6)
    assert(rounds < 100, "early exit never fired")
    assert(rounds > 5, s"suspiciously fast convergence ($rounds rounds)")
    val got = ranksDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a long dense run is the fixpoint to working precision; when the
    // per-round delta drops under tol the remaining distance to the
    // fixpoint is bounded by tol * d/(1-d) ~ 5.7x tol
    val fix = densePageRank(nodes, edges.distinct, 0.85, 200)
    got.foreach { case (v, r) =>
      assert(math.abs(r - fix(v)) < 1e-4, s"node $v: $r vs fixpoint ${fix(v)}")
    }
  }

  test("dangling redistribution: ranks sum to exactly 1, matching the dense form") {
    import spark.implicits._
    val got = GraphRank.pageRank(edges.toDF("src", "dst"), damping = 0.85,
      maxIterations = 25, tol = 0.0, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = densePageRank(nodes, edges.distinct, 0.85, 25, redistributeDangling = true)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
    val total = got.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass $total must be a probability distribution")
    // the sink's rank is strictly higher than in the leaky form (it keeps
    // receiving redistributed mass), and the hub still dominates
    assert(got(100L) == got.values.max)
  }

  test("r15 pageRankSized: dense driver loop == distributed loop (both modes), fallback above the gate") {
    import spark.implicits._
    // the aggregate-sized gate's contract: below maxDenseEdges the
    // driver loop must reproduce the distributed recurrence to float
    // tolerance (same formula, deterministic accumulation order), and
    // above it the call must fall back to the distributed path verbatim
    for (redis <- Seq(false, true)) {
      val dist = GraphRank.pageRank(edges.toDF("src", "dst"), damping = 0.85,
        maxIterations = 25, tol = 0.0, redistributeDangling = redis)
        .collect().map(r => r.getLong(0).toString -> r.getDouble(1)).toMap
      val dense = GraphRank.pageRankSized(edges.toDF("src", "dst"), damping = 0.85,
        maxIterations = 25, tol = 0.0, redistributeDangling = redis)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(dense.keySet == dist.keySet)
      dense.foreach { case (v, r) =>
        assert(math.abs(r - dist(v)) < 1e-9,
          s"node $v (redistribute=$redis): dense $r vs distributed ${dist(v)}")
        // r15 ADVICE #2: q78's oracle correctness rests on the round-6
        // margin between accumulation orders — assert the ROUNDED values
        // agree too, so a margin collapse surfaces here before the
        // cross-engine gate ever sees it
        assert(BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP) ==
          BigDecimal(dist(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
          s"node $v (redistribute=$redis): round-6 margin collapsed ($r vs ${dist(v)})")
      }
    }
    // fallback: a gate below the edge count must route to the
    // distributed loop and still produce the same ranks
    val fb = GraphRank.pageRankSized(edges.toDF("src", "dst"), damping = 0.85,
      maxIterations = 25, tol = 0.0, maxDenseEdges = 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = densePageRank(nodes, edges.distinct, 0.85, 25)
    fb.foreach { case (v, r) =>
      assert(math.abs(r - want(v.toLong)) < 1e-9, s"fallback node $v: $r")
    }
  }
}
