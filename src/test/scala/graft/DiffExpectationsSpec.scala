package graft

import org.apache.spark.sql.functions._
import graft.operators.{Diff, Expectations}

class DiffExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshot diff classifies added, removed, and changed rows") {
    val oldDf = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "status", "price")
    val newDf = Seq((2L, "B", 20.0), (3L, "X", 30.0), (4L, "D", 40.0))
      .toDF("k", "status", "price")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff distinguishes null payload from empty string") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("k", "v")
    val newDf = Seq((1L, Option("")), (2L, Option(""))).toDF("k", "v")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed"))
  }

  test("snapshot diff digest is injective under adversarial payloads") {
    // These two payload tuples serialize identically under any
    // prefix-plus-separator string encoding (the separator/marker can
    // appear inside a value); fixed-width per-column digests keep them
    // distinct.
    val oldDf = Seq((1L, "x\u0001v:y", "z"), (2L, "av:", "b"))
      .toDF("k", "c1", "c2")
    val newDf = Seq((1L, "x", "y\u0001v:z"), (2L, "a", "v:b"))
      .toDF("k", "c1", "c2")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed"))
  }

  test("expectations count violations per rule in one pass") {
    import Expectations._
    val df = Seq(
      (Option(1L), 5.0, 1), (Option(1L), -2.0, 1), // dup key, negative qty
      (Option.empty[Long], 3.0, 2), (Option(9L), 4.0, 3))
      .toDF("k", "qty", "ln")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val got = validate(df, Seq(
      NotNull("k"),
      Check("qty_positive", col("qty") > 0),
      Unique(Seq("k", "ln")),
      InReference("k", ref, "rk")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("not_null:k") === ((1L, false)))
    assert(got("qty_positive") === ((1L, false)))
    assert(got("unique:k,ln") === ((2L, false)), "both rows of the dup pair count")
    assert(got("in_reference:k") === ((1L, false)), "key 9 misses the reference")
  }

  test("expectations pass (not null) on an empty, violation-free table") {
    import Expectations._
    val df = Seq((1L, 5.0)).toDF("k", "qty").filter(col("k") < 0)
    val got = validate(df, Seq(NotNull("k"), Check("qty_positive", col("qty") > 0)))
      .as[(String, Long, Boolean)].collect()
    assert(got.length === 2)
    assert(got.forall(r => r._2 === 0L && r._3), got.mkString(","))
  }

  test("expectations pass on clean data") {
    import Expectations._
    val df = Seq((1L, 5.0), (2L, 3.0)).toDF("k", "qty")
    val got = validate(df, Seq(NotNull("k"), Check("qty_positive", col("qty") > 0),
      Unique(Seq("k"))))
      .as[(String, Long, Boolean)].collect()
    assert(got.length === 3 && got.forall(r => r._2 === 0L && r._3))
  }
}
