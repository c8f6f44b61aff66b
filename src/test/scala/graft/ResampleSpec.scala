package graft

import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("zero fill densifies gaps and leaves observed counts intact") {
    // buckets 10 and 13 observed for a; only 11 for b -> grid 10..13 x {a,b}
    val df = Seq((10L, "a"), (10L, "a"), (13L, "a"), (11L, "b"))
      .toDF("bucket", "dim")
    val out = Resample.zeroFilledCounts(df, col("bucket"), "dim")
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set(
      (10L, "a", 2L), (11L, "a", 0L), (12L, "a", 0L), (13L, "a", 1L),
      (10L, "b", 0L), (11L, "b", 1L), (12L, "b", 0L), (13L, "b", 0L)))
  }

  test("single-bucket input yields a one-row-per-dimension grid") {
    val df = Seq((5L, "x"), (5L, "x")).toDF("bucket", "dim")
    val out = Resample.zeroFilledCounts(df, col("bucket"), "dim")
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((5L, "x", 2L)))
  }
}
