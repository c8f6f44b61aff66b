package graft

import graft.operators.Cdc

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  test("latest change wins per key; a latest delete erases the key") {
    val cdc = Seq(
      // key 1: upsert v1, upsert v2 -> survives with v2 payload
      (1L, 1L, 10L, "U", "a"),
      (1L, 2L, 11L, "U", "b"),
      // key 2: upsert then delete -> gone
      (2L, 1L, 12L, "U", "x"),
      (2L, 2L, 13L, "D", "x"),
      // key 3: delete then a LATER upsert resurrects it
      (3L, 1L, 14L, "D", "y"),
      (3L, 2L, 15L, "U", "z"))
      .toDF("k", "v", "cid", "op", "payload")
    val got = Cdc.latestState(cdc, Seq("k"), Seq("v", "cid"), "op", Seq("payload"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(got === Map(1L -> ((2L, "b")), 3L -> ((2L, "z"))))
  }

  test("arrival order is irrelevant — version decides") {
    val fwd = Seq((1L, 1L, 1L, "U", "old"), (1L, 2L, 2L, "D", "new"))
    val rev = fwd.reverse
    def run(rows: Seq[(Long, Long, Long, String, String)]) =
      Cdc.latestState(rows.toDF("k", "v", "cid", "op", "p"),
        Seq("k"), Seq("v", "cid"), "op", Seq("p")).collect().toSet
    assert(run(fwd) === run(rev))
    assert(run(fwd).isEmpty, "the v2 tombstone wins regardless of arrival order")
  }
}
