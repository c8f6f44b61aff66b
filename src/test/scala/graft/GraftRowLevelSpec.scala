package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Spark-NATIVE row-level operations on catalog tables
  * (SupportsRowLevelOperations / SupportsDelta) — every case here was
  * a LOUD REFUSAL on the command route before round 14:
  *
  *   - NOT MATCHED BY SOURCE (UPDATE and DELETE forms);
  *   - non-key conjuncts in the MERGE ON condition;
  *   - UPDATE of a merge-key column (delete old key + insert new);
  *   - MERGE INSERT with an explicit column list over a catalog name.
  *
  * Plus the mechanics the route rests on: the physical plan is a real
  * distributed delta write (WriteDeltaExec, executor-side parquet),
  * the commit is ONE manifest (tombstone + data) pinned at the
  * operation's snapshot, a zero-row operation commits nothing, and
  * Spark's own MERGE cardinality check replaces ours.
  */
class GraftRowLevelSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  private def tablePath(t: String): String =
    s"/tmp/graft-test-catalog/$t"

  test("MERGE with NOT MATCHED BY SOURCE: UPDATE and DELETE clauses work by name") {
    drop("rl_nmbs")
    spark.sql("""CREATE TABLE graft.rl_nmbs (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_nmbs VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    Seq((2L, 200L), (5L, 50L)).toDF("k", "v")
      .createOrReplaceTempView("rl_nmbs_src")
    // rows 1,3,4 are NOT matched by source: 1,3 get flagged, 4 deleted
    spark.sql("""
      MERGE INTO graft.rl_nmbs AS t USING rl_nmbs_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.k < 4 THEN UPDATE SET v = t.v + 1
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val rows = spark.table("graft.rl_nmbs")
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 11L, 2L -> 200L, 3L -> 31L, 5L -> 50L))
    drop("rl_nmbs")
  }

  test("non-key conjuncts in MERGE ON narrow matching; untouched rows never rewritten") {
    drop("rl_oncond")
    spark.sql("""CREATE TABLE graft.rl_oncond (k BIGINT, grp STRING, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.rl_oncond VALUES
      (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)""")
    Seq((1L, 100L), (2L, 200L)).toDF("k", "nv")
      .createOrReplaceTempView("rl_oncond_src")
    // the extra conjunct keeps k=2 (grp='b') unmatched — and with no
    // NOT MATCHED clause its source row is dropped, not inserted
    spark.sql("""
      MERGE INTO graft.rl_oncond AS t USING rl_oncond_src AS s
      ON t.k = s.k AND t.grp = 'a'
      WHEN MATCHED THEN UPDATE SET v = s.nv""")
    val rows = spark.table("graft.rl_oncond")
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 100L, 2L -> 20L, 3L -> 30L))
    drop("rl_oncond")
  }

  test("UPDATE of a merge-key column: old key tombstoned, new row inserted") {
    drop("rl_keyupd")
    spark.sql("""CREATE TABLE graft.rl_keyupd (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_keyupd VALUES (1, 10), (2, 20)")
    spark.sql("UPDATE graft.rl_keyupd SET k = k + 100 WHERE k = 1")
    val rows = spark.table("graft.rl_keyupd")
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(101L -> 10L, 2L -> 20L),
      "the old key must be gone, the row re-keyed")
    drop("rl_keyupd")
  }

  test("the plan is a distributed delta write; the commit is ONE tombstone+data manifest") {
    drop("rl_plan")
    spark.sql("""CREATE TABLE graft.rl_plan (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_plan SELECT id, id * 10 FROM range(0, 100)")
    val before = VersionedTable.latestVersion(tablePath("rl_plan")).get
    spark.sql("UPDATE graft.rl_plan SET v = v + 1 WHERE k % 10 = 3")
    val after = VersionedTable.latestVersion(tablePath("rl_plan")).get
    assert(after === before + 1, "one statement, one commit")
    // history classifies it as an upsert (tombstone + data in one
    // manifest), and the touched-row count is the delta's size
    val hist = VersionedTable.history(spark, tablePath("rl_plan"))
      .filter(col("version") === after)
      .select("kind", "n_add", "n_delete").collect().head
    assert(hist.getString(0) === "upsert")
    assert((hist.getLong(1), hist.getLong(2)) === ((1L, 1L)))
    // untouched rows were NOT rewritten: the delta batch holds only
    // the 10 updated rows (merge-on-read, not copy-on-write)
    val fresh = VersionedTable.readChanges(spark, tablePath("rl_plan"),
      before, after)
    assert(fresh.count() === 10L)
    assert(spark.table("graft.rl_plan").filter($"k" % 10 === 3)
      .select("v").as[Long].collect().sorted
      === (0 until 10).map(i => (i * 10 + 3) * 10L + 1L).toArray)
    drop("rl_plan")
  }

  test("a MERGE that touches zero rows commits NO version; conflict at a stale snapshot is loud") {
    drop("rl_noop")
    spark.sql("""CREATE TABLE graft.rl_noop (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_noop VALUES (1, 10)")
    val before = VersionedTable.latestVersion(tablePath("rl_noop")).get
    Seq((99L, 0L)).toDF("k", "v").createOrReplaceTempView("rl_noop_src")
    spark.sql("""
      MERGE INTO graft.rl_noop AS t USING rl_noop_src AS s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(VersionedTable.latestVersion(tablePath("rl_noop"))
      === Some(before), "zero touched rows must publish nothing")
    // the pinned-snapshot commit primitive refuses an interleave
    // (a real staged dir: the write-side key null gate inspects it
    // before the commit is even attempted)
    val staged = new org.apache.hadoop.fs.Path(
      tablePath("rl_noop") + "/data/b0_stale_m")
    staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(staged)
    val e = intercept[java.io.IOException] {
      VersionedTable.commitDelta(tablePath("rl_noop"), before - 1,
        Some("b0_stale_m"), None)
    }
    assert(e.getMessage.contains("already committed"))
    drop("rl_noop")
  }

  test("Spark's own MERGE cardinality check fires on the native route") {
    drop("rl_card")
    spark.sql("""CREATE TABLE graft.rl_card (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_card VALUES (1, 10)")
    Seq((1L, 100L), (1L, 200L)).toDF("k", "v")
      .createOrReplaceTempView("rl_card_src")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO graft.rl_card AS t USING rl_card_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("MERGE_CARDINALITY_VIOLATION") ||
      e.getMessage.toLowerCase.contains("multiple"), e.getMessage)
    drop("rl_card")
  }

  test("native delta write carries typed columns faithfully (date, timestamp, decimal, string)") {
    drop("rl_typed")
    spark.sql("""CREATE TABLE graft.rl_typed
      (k BIGINT, d DATE, ts TIMESTAMP, dec DECIMAL(12,2), s STRING)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.rl_typed VALUES
      (1, DATE'2024-01-01', TIMESTAMP'2024-01-01 00:00:00', 1.50, 'a'),
      (2, DATE'2024-06-15', TIMESTAMP'2024-06-15 12:30:00', 2.25, 'b')""")
    // an UPDATE routes every column through the executor-side
    // parquet delta writer: any type-mapping slip shows on read-back
    spark.sql("""UPDATE graft.rl_typed
      SET d = d + INTERVAL '1' DAY, dec = dec + 0.01, s = concat(s, 'x')
      WHERE k = 2""")
    val r = spark.sql(
      "SELECT d, ts, dec, s FROM graft.rl_typed WHERE k = 2").collect().head
    assert(r.getDate(0).toString === "2024-06-16")
    assert(r.getTimestamp(1).toString.startsWith("2024-06-15 12:30:00"))
    assert(r.getDecimal(2).toPlainString === "2.26")
    assert(r.getString(3) === "bx")
    drop("rl_typed")
  }

  test("delta batches inherit the table's index layer (statscols) and write distributed") {
    drop("rl_stats")
    spark.sql("""CREATE TABLE graft.rl_stats (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'statscols'='k')""")
    spark.sql("INSERT INTO graft.rl_stats SELECT id, id FROM range(0, 10000)")
    // force multiple input splits (tiny files pack into one split by
    // default) with a predicate matching rows in EVERY split, so the
    // distributed write provably runs one writer per task
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try spark.sql("UPDATE graft.rl_stats SET v = v + 1 WHERE k % 10 = 3")
    finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    val path = tablePath("rl_stats")
    val latest = VersionedTable.latestVersion(path).get
    // the delta's data batch carries k stats like every other commit
    // (without this, native MERGE/UPDATE batches silently degrade
    // pruning until the next OPTIMIZE)
    assert(VersionedTable.statsColumnsOf(path, latest).contains("k"))
    // the write is distributed: multiple tasks, multiple part files
    // in the delta batch dir (never a driver-side collect)
    val (f, dd) = {
      val p = new org.apache.hadoop.fs.Path(s"$path/data")
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    val deltaDir = f.listStatus(dd).map(_.getPath)
      .filter(_.getName.endsWith("_m")).maxBy(_.getName.split("_").head
        .stripPrefix("b").toLong)
    val parts = f.listStatus(deltaDir)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(parts >= 2, s"expected a multi-task delta write, got $parts file(s)")
    drop("rl_stats")
  }

  test("a commit interleaving under a native UPDATE recomputes and retries INSIDE the engine") {
    drop("rl_race")
    spark.sql("""CREATE TABLE graft.rl_race (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_race VALUES (1, 10)")
    val path = tablePath("rl_race")
    var fired = false
    graft.catalog.GraftDeltaBatchWrite.testBeforeCommit = Some { () =>
      if (!fired) {
        fired = true
        VersionedTable.append(Seq((9L, 90L)).toDF("k", "v"), path)
      }
    }
    // ZERO caller-side retry code (round-15 verdict #3): the pinned
    // commit still refuses internally — the engine's bounded retry
    // re-analyzes the statement, re-pins at the NEW latest, and
    // recomputes the clauses there (never a blind re-commit of the
    // stale delta files)
    try spark.sql("UPDATE graft.rl_race SET v = v + 1 WHERE k = 1")
    finally graft.catalog.GraftDeltaBatchWrite.testBeforeCommit = None
    assert(fired)
    assert(spark.table("graft.rl_race").as[(Long, Long)].collect().toMap
      === Map(1L -> 11L, 9L -> 90L))
    // three commits: seed, the interleaved append, the retried UPDATE
    // (the refused attempt published nothing — its dirs are orphans)
    assert(VersionedTable.latestVersion(path) === Some(3L))
    drop("rl_race")
  }

  test("retry exhaustion under sustained contention refuses loudly naming the conf") {
    drop("rl_race2")
    spark.sql("""CREATE TABLE graft.rl_race2 (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_race2 VALUES (1, 10)")
    val path = tablePath("rl_race2")
    spark.conf.set(graft.sql.GraftSql.DmlMaxRetriesConf, "1")
    // a competitor lands inside EVERY attempt's window
    graft.catalog.GraftDeltaBatchWrite.testBeforeCommit = Some { () =>
      VersionedTable.append(Seq((9L, 90L)).toDF("k", "v"), path)
    }
    val e = try intercept[Exception] {
      spark.sql("UPDATE graft.rl_race2 SET v = v + 1 WHERE k = 1")
    } finally {
      graft.catalog.GraftDeltaBatchWrite.testBeforeCommit = None
      spark.conf.unset(graft.sql.GraftSql.DmlMaxRetriesConf)
    }
    assert(e.getMessage.contains("gave up after 1 recompute") &&
      e.getMessage.contains(graft.sql.GraftSql.DmlMaxRetriesConf),
      e.getMessage)
    // no attempt published; only the competitors' appends landed
    assert(spark.table("graft.rl_race2").as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 9L -> 90L))
    drop("rl_race2")
  }

  test("zombie attempt files landing in committed delta dirs are invisible (file-level manifest)") {
    drop("rl_zombie")
    spark.sql("""CREATE TABLE graft.rl_zombie (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_zombie VALUES (1, 10), (2, 20)")
    spark.sql("UPDATE graft.rl_zombie SET v = v + 1 WHERE k = 1")
    val path = tablePath("rl_zombie")
    assert(spark.table("graft.rl_zombie").as[(Long, Long)].collect().toMap
      === Map(1L -> 11L, 2L -> 20L))
    val conf = spark.sparkContext.hadoopConfiguration
    val dataRoot = new org.apache.hadoop.fs.Path(s"$path/data")
    val f = dataRoot.getFileSystem(conf)
    def deltaDir(suffix: String) = f.listStatus(dataRoot).map(_.getPath)
      .filter(_.getName.endsWith(suffix))
      .maxBy(_.getName.split("_").head.stripPrefix("b").toLong)
    // forge the zombie attempts the driver's prune can no longer
    // reach: a DATA file that would duplicate rows, and a TOMBSTONE
    // file that would delete k=2 — both landing AFTER the commit
    val stage = tmpDir("rl_zombie_stage")
    Seq((1L, 999L)).toDF("k", "v").coalesce(1).write
      .mode("overwrite").parquet(s"$stage/d")
    Seq(Tuple1(2L)).toDF("k").coalesce(1).write
      .mode("overwrite").parquet(s"$stage/t")
    def firstParquet(dir: String) =
      f.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).head
    org.apache.hadoop.fs.FileUtil.copy(f, firstParquet(s"$stage/d"),
      f, new org.apache.hadoop.fs.Path(deltaDir("_m"), "part-9-zombie.parquet"),
      false, conf)
    org.apache.hadoop.fs.FileUtil.copy(f, firstParquet(s"$stage/t"),
      f, new org.apache.hadoop.fs.Path(deltaDir("_k"), "part-9-zombie.parquet"),
      false, conf)
    // the manifest names exactly the committed files, so neither
    // zombie is scanned: no duplicate (1, 999) row, k=2 survives
    val latest = VersionedTable.latestVersion(path).get
    val entries = VersionedTable.history(spark, path)
      .filter(col("version") === latest)
    assert(spark.table("graft.rl_zombie").as[(Long, Long)].collect().toMap
      === Map(1L -> 11L, 2L -> 20L))
    // the change feed is equally scoped (a zombie tombstone would
    // otherwise materialize a phantom delete of k=2)
    val feed = VersionedTable.readChangeFeed(spark, path, 1L, latest)
      .filter(col("_change_type") === "delete").select("k").as[Long]
      .collect().toSeq
    assert(feed === Seq(1L), s"only the real tombstone row, got $feed")
    drop("rl_zombie")
  }

  test("key-moving UPDATE through the native route: upsert parity (round 19)") {
    // the two hazards the refusal-inventory walk surfaced: (1) two
    // rows moving onto ONE key refuse at the delta commit (the SQL
    // route's contract, enforced at the V2 choke point); (2) a moved
    // key landing on an EXISTING untouched row REPLACES it — the
    // delta tombstone now carries all data-batch keys, like V1
    // upsertWithDeletes
    drop("rl_keymove")
    spark.sql("""CREATE TABLE graft.rl_keymove (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.rl_keymove VALUES (1, 10), (2, 20), (3, 30)")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.rl_keymove SET k = 9 WHERE k IN (1, 2)")
    }
    assert(e.getMessage.contains("two or more rows") &&
      e.getMessage.contains("key"), e.getMessage)
    // the refused commit published nothing
    assert(spark.table("graft.rl_keymove").as[(Long, Long)].collect().sorted
      === Array((1L, 10L), (2L, 20L), (3L, 30L)))
    // a unique move onto an existing untouched key replaces it
    spark.sql("UPDATE graft.rl_keymove SET k = 2 WHERE k = 1")
    assert(spark.table("graft.rl_keymove").as[(Long, Long)].collect().sorted
      === Array((2L, 10L), (3L, 30L)))
    // CDC shows the replaced row's delete alongside the move
    val path = "/tmp/graft-test-catalog/rl_keymove"
    val latest = VersionedTable.latestVersion(path).get
    val dels = VersionedTable.readChangeFeed(spark, path, latest - 1, latest)
      .filter(col("_change_type") === "delete").select("k").as[Long]
      .collect().toSeq.sorted
    assert(dels === Seq(1L, 2L), s"preimages of the move: $dels")
    drop("rl_keymove")
  }

  test("composite key through the native route: rowId carries both columns") {
    drop("rl_ck")
    spark.sql("""CREATE TABLE graft.rl_ck (eid BIGINT, fp STRING, v BIGINT)
      TBLPROPERTIES('key'='eid,fp')""")
    spark.sql("""INSERT INTO graft.rl_ck VALUES
      (1, 'a', 10), (1, 'b', 11), (2, 'a', 20)""")
    // the composite tombstone must retire ONLY (1,'a') — rows sharing
    // either component stay
    spark.sql("DELETE FROM graft.rl_ck WHERE eid = 1 AND fp = 'a'")
    assert(spark.table("graft.rl_ck").select("v").as[Long]
      .collect().sorted === Array(11L, 20L))
    spark.sql("""UPDATE graft.rl_ck SET v = v + 1 WHERE fp = 'a'""")
    assert(spark.table("graft.rl_ck").select("v").as[Long]
      .collect().sorted === Array(11L, 21L))
    drop("rl_ck")
  }
}
