package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("binned range join equals the plain BETWEEN join incl. bin-straddling intervals") {
    val points = Seq(
      (1L, 10L, "p1"), (1L, 99L, "p2"), (1L, 100L, "p3"), (1L, 250L, "p4"),
      (2L, 10L, "p5"))
      .toDF("k", "t", "pname")
    // interval [95, 105] straddles a bin boundary at 100 (binSize 100)
    val intervals = Seq(
      (1L, 95L, 105L, "i1"), (1L, 0L, 10L, "i2"), (3L, 0L, 1000L, "i3"))
      .toDF("k", "s", "e", "iname")
    val binned = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e", 100L)
      .select("pname", "iname").as[(String, String)].collect().toSet
    val plain = points.as("p").join(intervals.as("i"),
      col("p.k") === col("i.k") && col("t") >= col("s") && col("t") <= col("e"))
      .select("pname", "iname").as[(String, String)].collect().toSet
    assert(binned === plain)
    assert(binned === Set(("p1", "i2"), ("p2", "i1"), ("p3", "i1")))

    // the whole point: the binned form plans as a hash/merge equi-join,
    // never a nested loop
    val binnedPlan = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"), binnedPlan)
  }
}
