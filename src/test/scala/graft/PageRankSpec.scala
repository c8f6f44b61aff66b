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
