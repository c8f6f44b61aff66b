package graft

import graft.operators.KCore

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  test("4-clique survives a k=3 peel, pendant chain does not") {
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L))
    val got = KCore.kCorePeel((clique ++ chain).toDF("src", "dst"),
      "src", "dst", k = 3, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ === 3L))
  }

  test("cycle has no 3-core") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
    val got = KCore.kCorePeel(e.toDF("src", "dst"), "src", "dst",
      k = 3, rounds = 6).collect()
    assert(got.isEmpty)
  }

  test("duplicate and reversed edges count once; self-loops ignored") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L),
      (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L))
    val got = KCore.kCorePeel(e.toDF("src", "dst"), "src", "dst",
      k = 3, rounds = 6).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
