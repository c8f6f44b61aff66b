package graft

import org.apache.spark.sql.functions._
import graft.operators.{TableStats, ZOrder}

class ZOrderStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("morton code interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.mortonCode(col("x"), col("y"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // morton(3,5): x=0b011 -> bits 0,1 at even positions 0,2 = 5;
    // y=0b101 -> bits 0,2 at odd positions 1,5 = 34; total 39
    assert(got === Map((0L, 0L) -> 0L, (1L, 0L) -> 1L, (0L, 1L) -> 2L,
      (1L, 1L) -> 3L, (3L, 5L) -> 39L))
  }

  test("z buckets bound both dimensions") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val prof = ZOrder.zLocality(grid, "x", "y", bits = 8, bucketShift = 6)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // each 64-row bucket of the 4096-cell grid is an 8x8 tile:
    // extents on BOTH dims are 8, not 64
    assert(prof.length === 64)
    prof.foreach { case (_, n, mnx, mxx, mny, mxy) =>
      assert(n === 64L)
      assert(mxx - mnx === 7L, "x extent not tiled")
      assert(mxy - mny === 7L, "y extent not tiled")
    }
  }

  test("numericStats profiles nulls, distincts, and extents in one pass") {
    val df = Seq((Some(1.0), Some(10L)), (Some(2.5), Some(10L)),
      (None, Some(20L)), (Some(2.5), None))
      .toDF("a", "b")
    val got = TableStats.numericStats(df, Seq("a", "b"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") === ((1L, 2L, 1.0, 2.5)))
    assert(got("b") === ((1L, 2L, 10.0, 20.0)))
  }
}
