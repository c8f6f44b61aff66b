package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the graph-density curation signal: nodes that
  * survive repeated "remove everything with fewer than k neighbors"
  * rounds form the k-core, the cohesive kernel of an interaction
  * graph (used to separate organic communities from stragglers and
  * bot tails).
  *
  * Exact k-core needs peeling to a fixed point; the declared form is
  * a BOUNDED R-round peel (deterministic, engine-replayable, and the
  * form a 100 TB run wants anyway — each round is one
  * semi-join-filtered degree aggregate, so R caps the stage count;
  * convergence diagnostics come from comparing R and R+1 outputs).
  * Per-round `localCheckpoint` truncates lineage exactly like
  * Dedup.connectedComponents.
  */
object KCore {

  /** Peel `rounds` times at threshold `k` over the undirected,
    * deduplicated, self-loop-free projection of `edges`. Returns
    * (node, deg): survivors with their degree among survivors (deg
    * can drop below k when `rounds` stops short of the fixed point —
    * by-design bounded semantics, and 0 when all neighbors died in
    * the final round).
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
    // materialize (r19, Par scaladoc): every peel round's two
    // semi-joins fan out of this cache concurrently.
    // Pre-partition on A (r20, guide §2.4): distinct() leaves the
    // cache hash(a, b)-partitioned, so every peel round re-exchanged
    // the full undirected edge set for its first semi-join — one edge
    // shuffle per round at any scale. Partitioned on a (explicit
    // count = session shuffle partitions: join-reusable and
    // AQE-coalesce-exempt), only the round's SURVIVOR set shuffles
    // for the second semi-join.
    val und = Par.materialize(
      e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
        .distinct()
        .repartition(edges.sparkSession.sessionState.conf.numShufflePartitions,
          col("a"))
        .cache())
    var alive = und.select(col("a").as("node")).distinct()
    for (_ <- 1 to rounds) {
      alive = und
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
        .groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
    }
    val fin = und
      .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // materialize before dropping the cached projection: `fin` still
    // reads `und`, and an unpersisted lazy plan would re-derive it
    val out = alive.join(fin, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint(true)
    und.unpersist(false)
    out
  }
}
