package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalJoin

class IncrementalJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("delta algebra reproduces the full join, including cross-delta matches") {
    val a = Seq((1L, 10L, "a1"), (2L, 20L, "a2"), (3L, 10L, "a3"),
      (4L, 30L, "a4"), (5L, 40L, "a5")).toDF("ak", "fk", "av")
    val b = Seq((10L, "b10"), (20L, "b20"), (30L, "b30"), (40L, "b40"))
      .toDF("bk", "bv")
    // splits: ΔA brings a4 (matches old b30) and a5 (matches NEW b40);
    // ΔB brings b20 (matches old a2) and b40 — every delta term is
    // exercised, including ΔA⋈ΔB
    val aOld = a.filter(col("ak") <= 3)
    val dA = a.filter(col("ak") > 3)
    val bOld = b.filter(col("bk") === 10L || col("bk") === 30L)
    val dB = b.filter(col("bk") === 20L || col("bk") === 40L)
    val stored = aOld.join(bOld, aOld("fk") === bOld("bk"))
    val maintained = IncrementalJoin.maintainJoinView(
      stored, aOld, dA, bOld, dB, (l, r) => l("fk") === r("bk"))
    val full = a.join(b, a("fk") === b("bk"))
    assert(maintained.exceptAll(full).isEmpty && full.exceptAll(maintained).isEmpty)
    assert(maintained.count() === 5)
  }

  test("empty deltas leave the view unchanged") {
    val a = Seq((1L, 10L, "a1")).toDF("ak", "fk", "av")
    val b = Seq((10L, "b10")).toDF("bk", "bv")
    val stored = a.join(b, a("fk") === b("bk"))
    val maintained = IncrementalJoin.maintainJoinView(
      stored, a, a.limit(0), b, b.limit(0), (l, r) => l("fk") === r("bk"))
    assert(maintained.exceptAll(stored).isEmpty &&
      stored.exceptAll(maintained).isEmpty)
  }
}
