package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphRank

/**
 * GraphRank pinned against a dense driver-side power iteration of the
 * identical formulation (damped, no dangling redistribution): the
 * distributed joins-and-aggregates loop must reproduce the reference
 * math to float tolerance, rank the authority structure correctly, and
 * conserve probability mass up to sink leakage.
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
      damping: Double, iterations: Int): Map[Long, Double] = {
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nodes.size
    var rank = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iterations) {
      val next = Array.fill(n)((1 - damping) / n)
      for ((s, d) <- edges)
        next(idx(d)) += damping * rank(idx(s)) / out(s)
      rank = next
    }
    nodes.map(v => v -> rank(idx(v))).toMap
  }

  test("distributed ranks match the dense power iteration; hub outranks spokes") {
    import spark.implicits._
    // a hub with 6 spokes pointing at it (plus back-edges so nothing
    // dangles), a separate 3-cycle, and a 2-chain with a sink
    val star = (1L to 6L).flatMap(s => Seq((100L + s, 100L), (100L, 100L + s)))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val chain = Seq((50L, 51L)) // 51 is a sink: leaks mass, by design
    val edges = star ++ cycle ++ chain
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted

    val got = GraphRank.pageRank(edges.toDF("src", "dst"), damping = 0.85, iterations = 25)
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
}
