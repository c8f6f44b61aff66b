package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.GraftSql

/** COMPOSITE MERGE KEYS end-to-end — the round-14 headline: the
  * reference's own tables all carry multi-column primary keys
  * (sync_runs (run_id, instrument_id), experiments (experiment_id,
  * last_updated), file_inventory (experiment_id, file_path) —
  * conditional writes at `lambda/agf_ingestion_lambda.py:229,303,337`)
  * and until this round the versioned/catalog surface could only
  * declare one column. Every leg here exercises data where
  * single-component matching would be WRONG: pairs share each
  * component across rows, so a tombstone or anti-join keyed on one
  * column corrupts neighbours the full key leaves untouched.
  */
class CompositeKeySpec extends SparkTestBase {
  import spark.implicits._

  test("upsertMulti replaces exactly the matching pair; component-sharing rows survive") {
    val path = tmpDir("ck_upsert")
    VersionedTable.append(Seq(
      (1L, "a", 10L), (1L, "b", 11L), (2L, "a", 20L), (2L, "b", 21L))
      .toDF("eid", "fp", "v"), path)
    VersionedTable.upsertMulti(
      Seq((1L, "b", 110L), (3L, "a", 30L)).toDF("eid", "fp", "v"),
      Seq("eid", "fp"), path)
    val rows = VersionedTable.readLatest(spark, path)
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // (1,a), (2,a), (2,b) untouched though each shares a component
    // with the upserted (1,b); (3,a) inserted
    assert(rows === Array((1L, "a", 10L), (1L, "b", 110L), (2L, "a", 20L),
      (2L, "b", 21L), (3L, "a", 30L)))
  }

  test("deleteKeysMulti retires only full-key matches; re-append is visible; time travel intact") {
    val path = tmpDir("ck_delete")
    VersionedTable.append(Seq(
      (1L, "a", 10L), (1L, "b", 11L), (2L, "a", 20L))
      .toDF("eid", "fp", "v"), path)
    VersionedTable.deleteKeysMulti(
      Seq((1L, "a")).toDF("eid", "fp"), Seq("eid", "fp"), path)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      .map(_._3).toSeq
      === Seq(11L, 20L), "only (1,a) deleted — (1,b) and (2,a) share " +
        "a component each and must survive")
    // versioned: the pre-delete view still holds the row
    assert(VersionedTable.readAt(spark, path, 1L).count() === 3L)
    // re-append of the SAME pair is visible (position-scoped tombstone)
    VersionedTable.append(Seq((1L, "a", 100L)).toDF("eid", "fp", "v"), path)
    assert(VersionedTable.readLatest(spark, path).count() === 3L)
  }

  test("insert-if-absent under a composite key: existing full-key pairs win, component matches insert") {
    val path = tmpDir("ck_insonly")
    VersionedTable.append(Seq((1L, "a", 10L)).toDF("eid", "fp", "v"), path)
    VersionedTable.upsertMulti(
      Seq((1L, "a", -1L), (1L, "b", 11L), (2L, "a", 20L))
        .toDF("eid", "fp", "v"),
      Seq("eid", "fp"), path, insertOnly = true)
    val rows = VersionedTable.readLatest(spark, path)
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // (1,a) kept its ORIGINAL value; (1,b)/(2,a) are new pairs even
    // though each matches an existing row on one component
    assert(rows === Array((1L, "a", 10L), (1L, "b", 11L), (2L, "a", 20L)))
  }

  test("change feed: a composite tombstone materializes the exact deleted rows") {
    val path = tmpDir("ck_cdf")
    VersionedTable.append(Seq(
      (1L, "a", 10L), (1L, "b", 11L)).toDF("eid", "fp", "v"), path)
    VersionedTable.deleteKeysMulti(
      Seq((1L, "a")).toDF("eid", "fp"), Seq("eid", "fp"), path)
    val feed = VersionedTable.readChangeFeed(spark, path, 1L, 2L)
      .select(col("eid"), col("fp"), col("v"), col("_change_type"))
      .as[(Long, String, Long, String)].collect()
    assert(feed.toSet === Set((1L, "a", 10L, "delete")))
  }

  test("SQL MERGE over a composite-key registration: conjunction ON, conditional clauses, column-list INSERT") {
    val path = tmpDir("ck_sql_merge")
    GraftSql.register("ck_files", path, "eid,fp")
    try {
      VersionedTable.append(Seq(
        (1L, "a", 10L), (1L, "b", 11L), (2L, "a", 20L))
        .toDF("eid", "fp", "v"), path)
      Seq((1L, "a", 5L), (1L, "b", 900L), (3L, "a", 30L))
        .toDF("eid", "fp", "delta")
        .createOrReplaceTempView("ck_src")
      // conjunction in either order; partial SET reading both sides;
      // fallthrough DELETE; INSERT column list assigning BOTH keys
      spark.sql("""
        MERGE INTO ck_files AS t USING ck_src AS s
        ON s.fp = t.fp AND t.eid = s.eid
        WHEN MATCHED AND s.delta < 100 THEN UPDATE SET v = t.v + s.delta
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT (eid, fp, v) VALUES (s.eid, s.fp, s.delta)""")
      val rows = VersionedTable.readLatest(spark, path)
        .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      // (1,a): 10+5=15; (1,b): delta 900 -> DELETE; (2,a) untouched;
      // (3,a) inserted
      assert(rows === Array((1L, "a", 15L), (2L, "a", 20L), (3L, "a", 30L)))
      // ONE atomic commit for the whole statement
      assert(VersionedTable.latestVersion(path) === Some(2L))
    } finally GraftSql.unregister("ck_files")
  }

  test("SQL refusals: ON must cover the key set exactly; key-column UPDATE refuses; cardinality rule on pairs") {
    val path = tmpDir("ck_sql_refuse")
    GraftSql.register("ck_ref", path, "eid,fp")
    try {
      VersionedTable.append(Seq((1L, "a", 10L)).toDF("eid", "fp", "v"), path)
      Seq((1L, "a", 1L)).toDF("eid", "fp", "v")
        .createOrReplaceTempView("ck_ref_src")
      // a SUBSET of the key (one equality) must refuse — it would
      // tombstone every row sharing that component
      val e1 = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO ck_ref AS t USING ck_ref_src AS s
          ON t.eid = s.eid
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      }
      assert(e1.getMessage.contains("covering exactly"))
      // updating a key component MOVES the key (round 17): old pair
      // tombstoned, new pair inserted, one commit
      spark.sql("UPDATE ck_ref SET fp = 'z' WHERE eid = 1")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, String, Long)].collect().toSeq ===
        Seq((1L, "z", 10L)))
      spark.sql("UPDATE ck_ref SET fp = 'a' WHERE eid = 1") // restore
      // two rows moving onto ONE pair still refuses
      VersionedTable.upsertMulti(Seq((1L, "b", 11L)).toDF("eid", "fp", "v"),
        Seq("eid", "fp"), path)
      val e2 = intercept[UnsupportedOperationException] {
        spark.sql("UPDATE ck_ref SET fp = 'dup' WHERE eid = 1")
      }
      assert(e2.getMessage.contains("one"), e2.getMessage)
      VersionedTable.deleteKeysMulti(Seq((1L, "b")).toDF("eid", "fp"),
        Seq("eid", "fp"), path) // restore the single-pair state
      // the cardinality rule judges the FULL pair: two source rows
      // sharing eid but differing in fp are fine
      Seq((1L, "a", 2L), (1L, "b", 3L)).toDF("eid", "fp", "v")
        .createOrReplaceTempView("ck_ref_ok")
      spark.sql("""MERGE INTO ck_ref AS t USING ck_ref_ok AS s
        ON t.eid = s.eid AND t.fp = s.fp
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      assert(VersionedTable.readLatest(spark, path).count() === 2L)
      // ... while a duplicated full pair refuses
      Seq((1L, "a", 4L), (1L, "a", 5L)).toDF("eid", "fp", "v")
        .createOrReplaceTempView("ck_ref_dup")
      val e3 = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO ck_ref AS t USING ck_ref_dup AS s
          ON t.eid = s.eid AND t.fp = s.fp
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      }
      assert(e3.getMessage.contains("cardinality"))
    } finally GraftSql.unregister("ck_ref")
  }

  test("composite point lookup: Bloom-pruned on the first component, exact on the full tuple") {
    val path = tmpDir("ck_lookup")
    VersionedTable.append(Seq(
      (1L, "a", 10L), (1L, "b", 11L)).toDF("eid", "fp", "v"), path,
      bloomCols = Seq("eid"))
    VersionedTable.append(Seq(
      (2L, "a", 20L), (2L, "b", 21L)).toDF("eid", "fp", "v"), path,
      bloomCols = Seq("eid"))
    val probes = Seq((1L, "b"), (2L, "a"), (9L, "x")).toDF("eid", "fp")
    val hits = VersionedTable.lookupKeysMulti(spark, path, 2L,
      Seq("eid", "fp"), probes)
      .as[(Long, String, Long)].collect().sortBy(_._3)
    // full-tuple matches only: (1,'a') and (2,'b') share a component
    // with a probe and must NOT surface; the missing tuple is absent
    assert(hits === Array((1L, "b", 11L), (2L, "a", 20L)))
    // ground truth identity against the unindexed read
    val truth = VersionedTable.readAt(spark, path, 2L)
      .join(probes, Seq("eid", "fp"), "left_semi")
      .as[(Long, String, Long)].collect().sortBy(_._3)
    assert(hits === truth)
  }

  test("streaming sink Update mode takes a composite mergeKey (comma list)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val src = tmpDir("ck_sink_src")
    val dst = tmpDir("ck_sink_dst") + "/t"
    val ckpt = tmpDir("ck_sink_ckpt")
    VersionedTable.append(Seq(
      (1L, "a", 10L), (1L, "b", 11L)).toDF("eid", "fp", "v"), src)
    VersionedTable.append(Seq(
      (1L, "b", 110L), (2L, "a", 20L)).toDF("eid", "fp", "v"), src)
    // one source commit per micro-batch, so the second commit's rows
    // UPSERT over the first batch's keyed view (in one batch they
    // would just be two rows of the same key riding one commit)
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", 1).load(src)
      .writeStream.format("graft")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .option("mergeKey", "eid,fp")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    val rows = VersionedTable.readLatest(spark, dst)
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // the second commit REPLACED exactly (1,b) and inserted (2,a):
    // a single-component key would have clobbered (1,a) too
    assert(rows === Array((1L, "a", 10L), (1L, "b", 110L), (2L, "a", 20L)))
  }

  test("catalog composite key: CREATE TABLE TBLPROPERTIES('key'='k1,k2') + DELETE + DESCRIBE HISTORY") {
    val table = "ck_cat_" + System.nanoTime()
    spark.sql(s"DROP TABLE IF EXISTS graft.$table")
    spark.sql(s"""CREATE TABLE graft.$table
      (eid BIGINT, fp STRING, v BIGINT)
      TBLPROPERTIES('key'='eid,fp')""")
    try {
      spark.sql(s"""INSERT INTO graft.$table VALUES
        (1, 'a', 10), (1, 'b', 11), (2, 'a', 20)""")
      spark.sql(s"DELETE FROM graft.$table WHERE eid = 1 AND fp = 'a'")
      val rows = spark.sql(s"SELECT eid, fp, v FROM graft.$table")
        .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      assert(rows === Array((1L, "b", 11L), (2L, "a", 20L)))
      val hist = spark.sql(s"DESCRIBE HISTORY graft.$table")
        .select("kind").as[String].collect()
      assert(hist === Array("append", "delete"))
      // a key component missing from the schema refuses at CREATE
      val e = intercept[Exception] {
        spark.sql(s"""CREATE TABLE graft.${table}_bad (eid BIGINT)
          TBLPROPERTIES('key'='eid,nope')""")
      }
      assert(e.getMessage.contains("nope"))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$table")
  }
}
