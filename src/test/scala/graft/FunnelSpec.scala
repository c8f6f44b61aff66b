package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  test("funnel requires strictly-after ordering per stage") {
    val ev = Seq(
      // user 1 converts fully in order
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L),
      // user 2 viewed BEFORE signup -> stalls at signup
      (2L, "view", 5L), (2L, "signup", 10L),
      // user 3 view at the SAME instant as signup -> not strictly after
      (3L, "signup", 10L), (3L, "view", 10L),
      // user 4 never signed up -> counted nowhere
      (4L, "view", 10L), (4L, "click", 20L))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelCounts(ev, "user_id", "event_type", col("ts"),
      Seq("signup", "view", "click"))
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(got === Map("signup" -> 3L, "view" -> 1L, "click" -> 1L))
  }

  test("retention counts users active k days after their first day") {
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L),  // user 1: offsets 0, 1, 3
      (2L, 1L), (2L, 2L),            // user 2: offsets 0, 1
      (3L, 5L))                      // user 3: offset 0 only
      .toDF("user_id", "day")
    val got = Funnel.retentionCounts(ev, "user_id", col("day"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 3L, 1L -> 2L, 3L -> 1L))
  }
}
