package graft

import org.apache.spark.sql.functions._
import graft.operators.ShortestPath

class ShortestPathSpec extends SparkTestBase {
  import spark.implicits._

  test("bfs levels: chain distances, directedness, hop cap, unreachable absent") {
    // 1 -> 2 -> 3 -> 4 -> 5, isolated 9 -> 10, plus a back-edge-free probe
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = ShortestPath.bfsLevels(edges, "src", "dst", seeds, "node", 3)
      .as[(Long, Long)].collect().toSet
    // hop cap 3: node 5 (dist 4) and the 9/10 component are absent;
    // edges are directed, so nothing upstream of 1 could ever appear
    assert(got === Set((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("bfs levels: multi-seed min distance and cycle termination") {
    // cycle a -> b -> c -> a plus a tail c -> d; seeds a and d
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("node")
    val got = ShortestPath.bfsLevels(edges, "src", "dst", seeds, "node", 10)
      .as[(Long, Long)].collect().toSet
    // the cycle must not loop past the reached-set anti-join; node 4
    // is a seed, so its distance is 0, not 3
    assert(got === Set((1L, 0L), (4L, 0L), (2L, 1L), (3L, 2L)))
  }
}
