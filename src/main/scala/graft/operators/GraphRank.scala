package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank over an edge list — the link-analysis companion to
 * [[Dedup.dupClusters]]: where connected components answer "which docs
 * are the same", rank answers "which node is AUTHORITATIVE" — the
 * crawl-curation signal (domain/page authority) a web-scale training
 * pipeline uses to weight sources.
 *
 * Distributed shape, per iteration: one join of the edge list against
 * the current rank table, one partial-aggregated groupBy(dst) — only
 * edges and (node, rank) rows ever shuffle, never any payload — and a
 * `localCheckpoint` so the plan stays O(1) deep across iterations (the
 * same truncation discipline as dupClusters' propagation rounds). The
 * driver sees one scalar (the node count) before the loop and nothing
 * per iteration, so the loop schedules back-to-back.
 *
 * Semantics: the standard damped formulation without dangling-mass
 * redistribution (rank leaking through sinks), which GraphRankSpec pins
 * against a dense driver-side power iteration of the same formulation.
 * Float note: the per-node contribution sum is a parallel float
 * reduction, so ranks are deterministic only to accumulation order —
 * callers that need cross-run stability round before thresholding
 * (the repo-wide round-before-decision rule); this is inherent to any
 * distributed PageRank, not a quirk of this one.
 */
object GraphRank {

  def pageRank(
      edges: DataFrame, // (src, dst) — directed; pass both directions for undirected
      damping: Double = 0.85,
      iterations: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count() // the one driver scalar
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }
}
