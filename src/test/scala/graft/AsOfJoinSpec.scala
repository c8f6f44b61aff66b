package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of picks the latest right time at or before each left time") {
    val left = Seq(
      (1L, 100L, "e1"), (1L, 200L, "e2"), (1L, 50L, "e0"),
      (2L, 100L, "e3"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, 60L), (1L, 100L), (1L, 150L),
      (3L, 10L)) // key with no left rows
      .toDF("k", "rt")
    val got = AsOfJoin.asOfTime(left, right, "k", "t", "rt")
      .select("name", "asof_time").as[(String, Option[Long])]
      .collect().toMap
    assert(got("e0") === None)        // no right row at or before 50
    assert(got("e1") === Some(100L))  // inclusive match at equal time
    assert(got("e2") === Some(150L))
    assert(got("e3") === None)        // key 2 has no right rows
  }

  test("ties on the right time are value-deterministic") {
    val left = Seq((1L, 100L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 90L), (1L, 90L), (1L, 80L)).toDF("k", "rt")
    val got = AsOfJoin.asOfTime(left, right, "k", "t", "rt")
      .select("asof_time").as[Long].head()
    assert(got === 90L)
  }
}
