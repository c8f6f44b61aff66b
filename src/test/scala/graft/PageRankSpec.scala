package graft

import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("two-node cycle is symmetric at rank 1/2") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 50000000L, 2L -> 50000000L))
  }

  test("star graph concentrates rank on the sink and drops dangling mass") {
    // 1 -> 2 <- 3; node 2 has no out-edges (dangling): its mass drops,
    // sources settle at (1-d)/3, the sink at (1-d)/3 + d * 2(1-d)/3
    val e = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val got = PageRank.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 5000000L && got(3L) === 5000000L)
    assert(got(2L) === 13500000L)
  }

  test("dangling-mass redistribution conserves total rank, same ordering") {
    // 1 -> 2 <- 3 with a dangling sink: the simplified variant leaks
    // the sink's mass; the textbook variant redistributes it uniformly
    val e = Seq((1L, 2L), (3L, 2L), (1L, 3L)).toDF("src", "dst")
    val dropped = PageRank.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    val conserved = PageRank.pageRank(e, "src", "dst", iters = 5,
      redistributeDanglingMass = true)
      .as[(Long, Long)].collect().toMap
    // conservation: redistributed ranks sum to ~1 (1e8 scale, rounding
    // slack); the simplified variant sums to strictly less
    assert(math.abs(conserved.values.sum - 100000000L) <= 5)
    assert(dropped.values.sum < 100000000L - 5)
    // the ordering — what PageRank is for — agrees across variants
    def order(m: Map[Long, Long]) = m.toSeq.sortBy(kv => (-kv._2, kv._1)).map(_._1)
    assert(order(dropped) === order(conserved))
    // node 2 (everyone's target) outranks the sources in both
    assert(order(conserved).head === 2L)
  }

  test("duplicate edges do not change the result") {
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e2 = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 1L)).toDF("src", "dst")
    val r1 = PageRank.pageRank(e1, "src", "dst").as[(Long, Long)].collect().toMap
    val r2 = PageRank.pageRank(e2, "src", "dst").as[(Long, Long)].collect().toMap
    assert(r1 === r2)
    // a 3-cycle is symmetric: all nodes at 1/3
    assert(r1.values.toSet.size === 1)
  }

  test("personalized PageRank: mass stays near the seeds, unreachable nodes are 0") {
    // seed 1 -> 2 -> 3(sink); separate component 4 -> 5, unreachable
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = PageRank.personalizedPageRank(e, "src", "dst", seeds, "node",
        iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got(4L) === 0L && got(5L) === 0L,
      "no restart mass, no path => exactly zero")
    // dangling sink 3 returns its mass to the seed: total conserved
    assert(math.abs(got.values.sum - 100000000L) <= 5)
    // every node on a seed path holds mass; the restarting seed
    // outranks its 1-hop neighbor (the sink ACCUMULATES — it only
    // leaks through the dangling return — so no claim about it)
    assert(got(1L) > got(2L) && got(2L) > 0L && got(3L) > 0L)
  }

  test("weighted PageRank follows edge weight, not topology") {
    // 1 splits 3:1 between 2 and 3; unweighted would split evenly
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.weightedPageRank(e, "src", "dst", "w", iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) > got(3L), "the heavy edge's target must outrank")
    val unw = PageRank.pageRank(
      e.select($"src", $"dst"), "src", "dst", iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(unw(2L) === unw(3L), "topology alone cannot separate 2 and 3")
  }

  test("weighted PageRank pre-aggregates duplicate edges by summed weight") {
    val dup = Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L),
      (3L, 1L, 1L)).toDF("src", "dst", "w")
    val agg = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      PageRank.weightedPageRank(df, "src", "dst", "w", iters = 5)
        .as[(Long, Long)].collect().toMap
    assert(run(dup) === run(agg))
  }

  test("personalized PageRank restricts seeds to graph nodes") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    // seed 9 is not in the graph: |S| must count only node 1
    val got = PageRank.personalizedPageRank(e, "src", "dst",
        Seq(1L, 9L).toDF("node"), "node", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(!got.contains(9L))
    assert(math.abs(got.values.sum - 100000000L) <= 5)
  }
}
