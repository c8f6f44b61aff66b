package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  test("merge coalesces overlap, touch, and swallowed intervals; keeps gaps apart") {
    val iv = Seq(
      ("u1", 0L, 100L),   // swallows the next two entirely
      ("u1", 10L, 20L),
      ("u1", 90L, 95L),
      ("u1", 100L, 150L), // touching [.,100)+[100,.) -> contiguous, merges
      ("u1", 200L, 210L), // gap -> separate
      ("u2", 0L, 10L))    // other key never mixes
      .toDF("k", "s", "e")
    val merged = Intervals.mergePerKey(iv, "k", "s", "e")
      .orderBy(col("k"), col("m_start"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(merged === Seq(
      ("u1", 0L, 150L, 4L),
      ("u1", 200L, 210L, 1L),
      ("u2", 0L, 10L, 1L)))
  }

  test("coverage sums disjoint extents exactly and conserves source counts") {
    val iv = Seq(
      ("u1", 0L, 100L), ("u1", 50L, 120L), ("u1", 300L, 400L),
      ("u1", 300L, 400L)) // exact duplicate merges, counts twice
      .toDF("k", "s", "e")
    val cov = Intervals.coveragePerKey(iv, "k", "s", "e")
      .as[(String, Long, Long, Long)].head()
    assert(cov === (("u1", 2L, 220L, 4L)))
  }
}
