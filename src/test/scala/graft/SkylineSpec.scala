package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.toSet

  test("skyline equals brute force on tie-heavy fixtures") {
    // staircase frontier + dominated interior + exact-duplicate points
    // (neither dominates -> both kept) + same-cost and same-gain ties
    val pts = Seq(
      (1L, 100L, 50L), (2L, 200L, 60L), (3L, 300L, 70L), // frontier
      (4L, 250L, 55L),                                   // dominated by 2
      (5L, 100L, 50L),                                   // duplicate of 1
      (6L, 100L, 40L),                                   // same cost as 1, less gain
      (7L, 400L, 70L),                                   // same gain as 3, pricier
      (8L, 50L, 10L))                                    // cheapest -> frontier
    val df = pts.toDF("id", "cost", "gain")
    val got = Skyline.skyline2D(df, "id", "cost", "gain", bucketWidth = 120L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(pts))
    assert(got.map(_._1) === Set(1L, 2L, 3L, 5L, 8L))
  }

  test("skyline is bucket-width invariant and plans no Window or cartesian join") {
    val pts = (1L to 400L).map { i =>
      (i, (i * 37) % 251 + 1, (i * 53) % 97 + 1)
    }
    val df = pts.toDF("id", "cost", "gain")
    val expected = brute(pts)
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val sky = Skyline.skyline2D(df, "id", "cost", "gain", w)
      val got = sky.as[(Long, Long, Long)].collect().toSet
      assert(got === expected, s"bucketWidth=$w")
      val plan = sky.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"bucketWidth=$w planned a Window")
      assert(!plan.contains("CartesianProduct"),
        s"bucketWidth=$w planned a cartesian join")
    }
  }
}
