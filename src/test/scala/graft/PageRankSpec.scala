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
}
