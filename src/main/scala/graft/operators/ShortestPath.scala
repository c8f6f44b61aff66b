package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS — unweighted single/multi-source shortest hop
  * distances, the graph primitive the suite's PageRank (influence),
  * triangles (density), and connected components (membership) don't
  * answer: "HOW FAR is every node from a seed set" (blast-radius,
  * reachability tiers, contamination spread over a link graph).
  *
  * Scale shape = the connectedComponents discipline: one frontier
  * expansion per hop (equi-join frontier -> edges, anti-join against
  * the reached set), each round cut with an EAGER localCheckpoint so
  * lineage stays O(1) and round count is bounded by maxHops — BFS
  * from seeds is O(maxHops) rounds by construction, never
  * diameter-unbounded. The reached set only grows; per-round shuffle
  * volume is the frontier's out-neighborhood, not the graph.
  */
object ShortestPath {

  /** Minimum hop distance from any seed, for every node within
    * `maxHops` (directed edges, seeds at distance 0). Output:
    * (node, dist) — nodes unreachable within maxHops are absent.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    var reached = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = reached
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(reached, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint(true)
      reached = reached.union(next).localCheckpoint(true)
      frontier = next
    }
    reached
  }
}
