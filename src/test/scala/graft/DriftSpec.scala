package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def ks(rows: Seq[(Long, String)]) = {
    val df = rows.toDF("v", "g")
    Drift.ksStatistic(df, "v", col("g") === "a", col("g") === "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
  }

  test("disjoint supports give KS = 1") {
    val (n, m, dmax, kse6, at) =
      ks(Seq(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "b", 6L -> "b"))
    assert((n, m) === (3L, 3L))
    assert(dmax === 9L) // i*m - j*n peaks at 3*3 - 0
    assert(kse6 === 1000000L)
    assert(at === 3L) // smallest value achieving the max
  }

  test("identical samples give KS = 0") {
    val (_, _, dmax, kse6, _) =
      ks(Seq(1L -> "a", 2L -> "a", 1L -> "b", 2L -> "b"))
    assert(dmax === 0L && kse6 === 0L)
  }

  test("hand-computed interleaved case, exact integer statistic") {
    // A = {1, 3}, B = {2, 3}: at v=1, |1*2 - 0*2| = 2 (the max)
    val (n, m, dmax, kse6, at) =
      ks(Seq(1L -> "a", 3L -> "a", 2L -> "b", 3L -> "b"))
    assert((n, m) === (2L, 2L))
    assert(dmax === 2L)
    assert(kse6 === 500000L) // 2 * 1e6 div 4
    assert(at === 1L)
  }

  test("statistic is partitioning-invariant") {
    val rows = (1L to 500L).map(v => v -> "a") ++
      (200L to 700L).map(v => v -> "b")
    val one = Drift.ksStatistic(rows.toDF("v", "g").coalesce(1), "v",
      col("g") === "a", col("g") === "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    val many = Drift.ksStatistic(rows.toDF("v", "g").repartition(13), "v",
      col("g") === "a", col("g") === "b", numPartitions = 7)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(one === many)
  }
}
