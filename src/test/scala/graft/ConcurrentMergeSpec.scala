package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.{GraftMergeIntoCommand, GraftSql}

/** RACING CONDITIONAL MERGES — the round-13 verdict's #7: the OCC
  * recompute path had single-interleave specs; this races TWO
  * complete conditional MERGE statements on overlapping keys through
  * the test seam and proves the result equals a SERIAL order.
  *
  * The documented contract is PER-KEY SERIALIZABILITY: every key's
  * final state equals its state under the serial order "the commit
  * that won the version race, then the one that recomputed" — the
  * loser's clauses RE-EVALUATE against the winner's committed view
  * (the round-14 pinned-snapshot fix is what guarantees the conflict
  * is even detected when the winner lands inside the loser's
  * read-modify-write window).
  */
class ConcurrentMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("two conditional MERGEs on overlapping keys serialize: loser recomputes against winner") {
    val path = tmpDir("cm_race")
    GraftSql.register("cm_race", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), path)
      Seq((1L, 0L), (2L, 0L)).toDF("k", "z")
        .createOrReplaceTempView("cm_src_a")
      Seq((2L, 0L)).toDF("k", "z").createOrReplaceTempView("cm_src_b")
      // MERGE B fires INSIDE MERGE A's read-modify-write window
      // (right after A's snapshot read). B commits first — A's
      // pinned commit conflicts, and A recomputes against B's view.
      var fired = false
      GraftMergeIntoCommand.testAfterSnapshot = Some { _ =>
        if (!fired) {
          fired = true
          spark.sql("""
            MERGE INTO cm_race AS t USING cm_src_b AS s ON t.k = s.k
            WHEN MATCHED AND t.v < 1000 THEN UPDATE SET v = t.v + 1""")
        }
      }
      try {
        spark.sql("""
          MERGE INTO cm_race AS t USING cm_src_a AS s ON t.k = s.k
          WHEN MATCHED AND t.v < 25 THEN UPDATE SET v = t.v + 100
          WHEN MATCHED THEN DELETE""")
      } finally GraftMergeIntoCommand.testAfterSnapshot = None
      assert(fired, "the race must actually have fired")
      val rows = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      // serial B-then-A: B bumps k=2 to 21; A then sees k=1 at 10
      // (<25 -> 110) and k=2 at 21 (<25 -> 121). A stale evaluation
      // of A's clauses (k=2 at 20 -> 120) would lose B's increment.
      assert(rows === Map(1L -> 110L, 2L -> 121L, 3L -> 30L),
        s"result must equal the serial order B-then-A, got $rows")
      // three commits: seed, B, A's recomputed commit
      assert(VersionedTable.latestVersion(path) === Some(3L))
      // per-key serializability is also visible in the change feed:
      // k=2 carries BOTH updates in commit order
      val feed = VersionedTable.readChangeFeed(spark, path, 1L, 3L)
        .filter(col("k") === 2L && col("_change_type") === "insert")
        .select("v").as[Long].collect().sorted
      assert(feed === Array(21L, 121L))
    } finally GraftSql.unregister("cm_race")
  }

  test("the race where BOTH clauses would delete: the loser's recompute still sees the winner's insert") {
    val path = tmpDir("cm_race2")
    GraftSql.register("cm_race2", path, "k")
    try {
      VersionedTable.append(Seq((1L, 50L)).toDF("k", "v"), path)
      Seq((1L, 0L), (7L, 0L)).toDF("k", "z")
        .createOrReplaceTempView("cm2_src_a")
      Seq((7L, 7L)).toDF("k", "v").createOrReplaceTempView("cm2_src_b")
      var fired = false
      GraftMergeIntoCommand.testAfterSnapshot = Some { _ =>
        if (!fired) {
          fired = true
          // B INSERTS key 7 while A is mid-flight; A's NOT MATCHED
          // clause would also have inserted 7 from its stale view
          spark.sql("""
            MERGE INTO cm_race2 AS t USING cm2_src_b AS s ON t.k = s.k
            WHEN NOT MATCHED THEN INSERT *""")
        }
      }
      try {
        spark.sql("""
          MERGE INTO cm_race2 AS t USING cm2_src_a AS s ON t.k = s.k
          WHEN MATCHED AND t.v >= 25 THEN DELETE
          WHEN NOT MATCHED AND s.z = 0 THEN INSERT (k, v) VALUES (s.k, -1)""")
      } finally GraftMergeIntoCommand.testAfterSnapshot = None
      assert(fired)
      val rows = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      // serial B-then-A: B inserts (7,7); A recomputes — k=1 matched
      // (50 >= 25 -> DELETE), k=7 now MATCHED (no matched clause
      // applies: z... source A's row for 7 matches the existing row,
      // v=7 < 25 so neither matched clause fires -> untouched). A
      // stale A would have double-handled 7 as an insert.
      assert(rows === Map(7L -> 7L), s"got $rows")
    } finally GraftSql.unregister("cm_race2")
  }

  test("NATIVE-route MERGE race: the engine's bounded retry recomputes — zero caller-side retry code") {
    spark.sql("DROP TABLE IF EXISTS graft.cm_native")
    spark.sql("""CREATE TABLE graft.cm_native (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cm_native VALUES (1, 10), (2, 20), (3, 30)")
    val path = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog].tablePath(Seq("cm_native"))
    Seq((1L, 0L), (2L, 0L)).toDF("k", "z")
      .createOrReplaceTempView("cmn_src_a")
    Seq((2L, 0L)).toDF("k", "z").createOrReplaceTempView("cmn_src_b")
    // B commits INSIDE A's write-then-commit window (the seam runs at
    // the top of A's driver-side delta commit, after A's distributed
    // write) — A's pinned commit conflicts, and the ENGINE retries:
    // fresh analysis, new snapshot pin, clauses recomputed
    var fired = false
    graft.catalog.GraftDeltaBatchWrite.testBeforeCommit = Some { () =>
      if (!fired) {
        fired = true
        spark.sql("""
          MERGE INTO graft.cm_native AS t USING cmn_src_b AS s ON t.k = s.k
          WHEN MATCHED AND t.v < 1000 THEN UPDATE SET v = t.v + 1""")
      }
    }
    try {
      spark.sql("""
        MERGE INTO graft.cm_native AS t USING cmn_src_a AS s ON t.k = s.k
        WHEN MATCHED AND t.v < 25 THEN UPDATE SET v = t.v + 100
        WHEN MATCHED THEN DELETE""")
    } finally graft.catalog.GraftDeltaBatchWrite.testBeforeCommit = None
    assert(fired, "the race must actually have fired")
    val rows = spark.table("graft.cm_native").as[(Long, Long)]
      .collect().toMap
    // serial B-then-A, same as the command route: B bumps k=2 to 21;
    // A's RECOMPUTE sees k=1 at 10 (<25 -> 110) and k=2 at 21
    // (<25 -> 121). A stale re-commit of A's first-attempt delta
    // would have produced 120 — losing B's increment.
    assert(rows === Map(1L -> 110L, 2L -> 121L, 3L -> 30L),
      s"result must equal the serial order B-then-A, got $rows")
    // three commits: seed, B, A's recomputed commit
    assert(VersionedTable.latestVersion(path) === Some(3L))
    spark.sql("DROP TABLE IF EXISTS graft.cm_native")
  }
}
