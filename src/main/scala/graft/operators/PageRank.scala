package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — iterative link analysis for graph-
  * shaped curation signals (e.g. ranking items in a click-transition
  * graph, or documents in a citation/similarity graph).
  *
  * Scale shape: each iteration is one join of the rank vector to the
  * edge list on src (both sides hash-partitioned on the same key, so
  * consecutive iterations reuse the partitioning) plus one aggregation
  * on dst; per-round `localCheckpoint(eager)` truncates the logical
  * plan, without which the self-referential lineage doubles per round
  * (the connected-components lesson). The only driver-side scalar is
  * the node count. Dangling-node mass is dropped (the simplified
  * variant), which keeps the iteration a pure edge join; ranks then
  * sum to < 1 but the ordering — what PageRank is for — is unchanged.
  */
object PageRank {

  /** Fixed-iteration damped PageRank. Output: (node, rank_e8) with
    * rank ROUNDED (not floor-truncated) at 1e-8: regular graphs
    * converge to exactly uniform 1/N ranks, which sit ON the
    * truncation boundary — floor would flip on summation-order ulps
    * (observed cross-engine at sf0.1), while round is noise-immune
    * precisely because the true values are integers at this scale.
    *
    * `redistributeDanglingMass = true` gives the textbook variant:
    * each round, the rank mass held by sink nodes (no out-edges) is
    * summed — ONE extra 1-row aggregate per round, the only added
    * cost — and spread uniformly over all nodes, so ranks keep
    * summing to 1. Default false (the simplified variant): ordering
    * is typically unchanged, which is what PageRank is for.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 5,
      redistributeDanglingMass: Boolean = false): DataFrame = {
    // materialize (r19, Par scaladoc): e feeds BOTH union branches of
    // nodes plus deg and every round's join — the node-count action
    // otherwise races two concurrent builds of the edge cache.
    // Pre-partition on SRC (r20, guide §2.4 share one exchange):
    // distinct() leaves the cache hash(src, dst)-partitioned, so every
    // round's rank join re-exchanged the full edge set on src — one
    // shuffle of the edges per iteration, at any scale. Partitioned on
    // the join key (explicit count = session shuffle partitions, so
    // the join reuses it and AQE cannot coalesce it away), the edge
    // side of the iteration join never shuffles again, and the degree
    // aggregate below collapses to a partial-only pass.
    val e = Par.materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct()
        .repartition(edges.sparkSession.sessionState.conf.numShufflePartitions,
          col("src"))
        .cache())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count().toDouble // bounded: one scalar, not a row set
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).cache()
    // dangling = nodes with no out-edges; kept as a (small) frame only
    // when the dangling-mass aggregate needs it
    lazy val dangling = nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .cache()
    var pr = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val inMass = e.join(pr, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).as("m"))
        .groupBy(col("node")).agg(sum(col("m")).as("in_mass"))
      // the rank mass parked on sink nodes rides the round's ONE
      // checkpoint job as a broadcast 1-row aggregate (r19): a separate
      // .head() action per round doubled the loop's job count for a
      // value the plan can carry itself. Same arithmetic, same doubles.
      val next =
        if (!redistributeDanglingMass)
          nodes.join(inMass, Seq("node"), "left")
            .select(col("node"),
              (lit((1 - damping) / n) +
                lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        else {
          val dm = pr.join(dangling, Seq("node"), "left_semi")
            .agg((coalesce(sum(col("rank")), lit(0.0)) / n).as("__dshare"))
          nodes.join(inMass, Seq("node"), "left")
            .crossJoin(broadcast(dm))
            .select(col("node"),
              (lit((1 - damping) / n) +
                lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
                  col("__dshare"))).as("rank"))
        }
      pr = next.localCheckpoint(true)
    }
    pr.select(col("node"), round(col("rank") * 1e8).cast("long").as("rank_e8"))
  }

  /** Weighted PageRank: out-mass splits proportionally to edge weight
    * (rank·w/W_src) instead of uniformly (rank/outdeg) — on a
    * click-transition graph the weight is the observed transition
    * COUNT, so the walk follows empirical probabilities, not graph
    * topology. Duplicate (src, dst) rows pre-aggregate by summed
    * weight; otherwise the iteration shape (one edge join + one dst
    * aggregate + eager localCheckpoint per round) is [[pageRank]]'s,
    * with the per-src weight total replacing the degree table.
    * Dangling mass drops (the simplified variant, same caveat).
    */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, damping: Double = 0.85, iters: Int = 5): DataFrame = {
    // materialize: see pageRank (r19); pre-partition on src (r20) —
    // the per-(src,dst) pre-aggregation leaves hash(src, dst), so the
    // per-round rank join re-exchanged the edges every iteration
    val e = Par.materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(weightCol).cast("long").as("w"))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
        .repartition(edges.sparkSession.sessionState.conf.numShufflePartitions,
          col("src"))
        .cache())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count().toDouble
    val wsum = e.groupBy(col("src")).agg(sum(col("w")).as("wsum")).cache()
    var pr = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val inMass = e.join(pr, col("src") === col("node"))
        .join(wsum, "src")
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("wsum")).as("m"))
        .groupBy(col("node")).agg(sum(col("m")).as("in_mass"))
      pr = nodes.join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), round(col("rank") * 1e8).cast("long").as("rank_e8"))
  }

  /** Personalized PageRank (random walk with restart to a SEED set —
    * Haveliwala 2002): the teleport vector is 1/|S| on seeds and 0
    * elsewhere, and dangling mass returns to the seeds, so rank mass
    * measures proximity to the seed set. The graph-based data-
    * selection primitive: seed with known-good documents, harvest the
    * neighborhood by rank.
    *
    * Seeds arrive as a DataFrame (never a driver-side list — seed
    * sets are "all wiki-quality docs"-sized at 100 TB) and are
    * restricted to graph nodes by a semi join; |S| is the one extra
    * driver scalar. Per-round cost is identical to [[pageRank]] plus
    * the same 1-row dangling aggregate.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      damping: Double = 0.85, iters: Int = 5): DataFrame = {
    // materialize: see pageRank (r19); pre-partition on src (r20) —
    // see pageRank: one edge exchange per iteration removed
    val e = Par.materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct()
        .repartition(edges.sparkSession.sessionState.conf.numShufflePartitions,
          col("src"))
        .cache())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val seedNodes = seeds.select(col(seedCol).as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi").cache()
    val sCount = seedNodes.count().toDouble
    require(sCount > 0, "seed set shares no node with the graph")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).cache()
    val dangling = nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .cache()
    // the restart distribution, materialized once and reused each round
    val base = nodes
      .join(seedNodes.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"),
        when(col("is_seed"), lit(1.0 / sCount)).otherwise(lit(0.0)).as("p"))
      .cache()
    var pr = base.select(col("node"), col("p").as("rank"))
    for (_ <- 1 to iters) {
      val inMass = e.join(pr, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).as("m"))
        .groupBy(col("node")).agg(sum(col("m")).as("in_mass"))
      // dangling mass rides the checkpoint job as a broadcast 1-row
      // aggregate — see pageRank (r19)
      val dm = pr.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      pr = base.join(inMass, Seq("node"), "left")
        .crossJoin(broadcast(dm))
        .select(col("node"),
          (lit(1 - damping) * col("p") +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("__dm") * col("p"))).as("rank"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), round(col("rank") * 1e8).cast("long").as("rank_e8"))
  }
}
