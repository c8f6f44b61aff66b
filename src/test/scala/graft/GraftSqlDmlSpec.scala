package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.GraftSql

/** SQL DML over registered versioned tables: INSERT/MERGE/DELETE as
  * plain `spark.sql` text reaching the same commit machinery as the
  * Scala API — plus the refusal matrix for unsupported shapes and
  * pass-through transparency for unregistered names.
  */
class GraftSqlDmlSpec extends SparkTestBase {
  import spark.implicits._

  test("INSERT INTO appends by position; INSERT OVERWRITE replaces atomically") {
    val path = tmpDir("dml_insert")
    GraftSql.register("t_ins", path, "k")
    try {
      VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
      spark.sql("INSERT INTO t_ins VALUES (2, 'b'), (3, 'c')")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, String)].collect().sorted
        === Array((1L, "a"), (2L, "b"), (3L, "c")))
      // by position: VALUES' synthetic col names never leak
      assert(VersionedTable.readLatest(spark, path).columns.toSeq
        === Seq("k", "v"))
      // a SELECT source works and commits through the OCC path
      spark.sql("INSERT INTO t_ins SELECT 9, 'z'")
      assert(VersionedTable.readLatest(spark, path).count() === 4L)
      // arity mismatch refuses loudly
      val e = intercept[Exception] {
        spark.sql("INSERT INTO t_ins VALUES (7)")
      }
      assert(e.getMessage.contains("arity"))
      // overwrite replaces; history survives
      spark.sql("INSERT OVERWRITE t_ins VALUES (100, 'new')")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, String)].collect() === Array((100L, "new")))
      assert(VersionedTable.readAt(spark, path, 3).count() === 4L)
    } finally GraftSql.unregister("t_ins")
  }

  test("DELETE FROM with a WHERE on any column commits a merge-on-read tombstone") {
    val path = tmpDir("dml_delete")
    GraftSql.register("t_del", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v"), path)
      spark.sql("DELETE FROM t_del WHERE v >= 30")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().sorted === Array((1L, 10L), (2L, 20L)))
      // merge-on-read: no data rewritten, time travel intact
      assert(VersionedTable.readAt(spark, path, 1).count() === 4L)
      // alias form resolves too
      spark.sql("DELETE FROM t_del AS d WHERE d.k = 1")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect() === Array((2L, 20L)))
    } finally GraftSql.unregister("t_del")
  }

  test("MERGE INTO: SQL text equals the Scala upsert, through the OCC path") {
    val scalaPath = tmpDir("dml_merge_scala")
    val sqlPath = tmpDir("dml_merge_sql")
    GraftSql.register("t_merge", sqlPath, "k")
    try {
      val baseRows = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      VersionedTable.append(baseRows.toDF("k", "v"), scalaPath)
      VersionedTable.append(baseRows.toDF("k", "v"), sqlPath)
      val updates = Seq((2L, "B"), (9L, "z"))
      // Scala side
      VersionedTable.upsert(updates.toDF("k", "v"), "k", scalaPath)
      // SQL side: same merge, from text
      updates.toDF("k", "v").createOrReplaceTempView("merge_src")
      spark.sql("""
        MERGE INTO t_merge USING merge_src ON t_merge.k = merge_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val viaScala = VersionedTable.readLatest(spark, scalaPath)
        .as[(Long, String)].collect().sorted.toSeq
      val viaSql = VersionedTable.readLatest(spark, sqlPath)
        .as[(Long, String)].collect().sorted.toSeq
      assert(viaSql === viaScala,
        "SQL MERGE must be value-identical to the Scala upsert")
      // insert-if-absent form: existing keys win
      Seq((9L, "CLOBBER"), (12L, "fresh")).toDF("k", "v")
        .createOrReplaceTempView("merge_src2")
      spark.sql("""
        MERGE INTO t_merge USING merge_src2 ON t_merge.k = merge_src2.k
        WHEN NOT MATCHED THEN INSERT *""")
      val rows = VersionedTable.readLatest(spark, sqlPath)
        .as[(Long, String)].collect().toMap
      assert(rows(9L) === "z" && rows(12L) === "fresh")
    } finally GraftSql.unregister("t_merge")
  }

  test("unsupported DML shapes refuse loudly; unregistered names pass through") {
    val path = tmpDir("dml_refuse")
    GraftSql.register("t_ref", path, "k")
    try {
      VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
      Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("ref_src")
      // a NOT MATCHED BY SOURCE action other than DELETE/UPDATE SET
      // cannot parse, so the remaining refusal here is the non-key
      // merge condition (the NMBS happy paths live in
      // GraftMergeFormsSpec and q329)
      // non-key merge condition
      val e2 = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO t_ref USING ref_src ON t_ref.v = ref_src.v
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      }
      assert(e2.getMessage.contains("key column"))
      // the interceptor is invisible elsewhere: plain SQL still works,
      // and DML over an unregistered name fails with SPARK's error,
      // not ours
      assert(spark.sql("SELECT 1 AS one").as[Int].head() === 1)
      val e3 = intercept[Exception] {
        spark.sql("DELETE FROM some_unregistered_table WHERE 1 = 1")
      }
      assert(!e3.getMessage.contains("graft SQL DML"),
        s"pass-through broken: ${e3.getMessage}")
    } finally GraftSql.unregister("t_ref")
  }

  test("UPDATE SET with a WHERE: matched rows replaced atomically; key updates refuse") {
    val path = tmpDir("dml_update")
    GraftSql.register("t_upd", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "a")).toDF("k", "v", "g"),
        path)
      // self-referencing assignment reads the PRE-update value
      spark.sql("UPDATE t_upd SET v = v * 2 WHERE g = 'a'")
      assert(VersionedTable.readLatest(spark, path)
        .select("k", "v").as[(Long, Long)].collect().sorted
        === Array((1L, 20L), (2L, 20L), (3L, 60L)))
      // one commit, time travel intact
      assert(VersionedTable.readAt(spark, path, 1)
        .select("v").as[Long].collect().sorted === Array(10L, 20L, 30L))
      // multi-assignment with expressions over other columns
      spark.sql("UPDATE t_upd SET v = v + k, g = upper(g) WHERE k = 2")
      assert(VersionedTable.readLatest(spark, path)
        .filter($"k" === 2L).as[(Long, Long, String)].head()
        === ((2L, 22L, "B")))
      // KEY-MOVING update (round 17): old key tombstoned, new row
      // inserted, one atomic commit
      spark.sql("UPDATE t_upd SET k = k + 10 WHERE k = 3")
      assert(VersionedTable.readLatest(spark, path)
        .select("k", "v").as[(Long, Long)].collect().sorted
        === Array((1L, 20L), (2L, 22L), (13L, 60L)))
      // two rows moving onto ONE key refuses loudly (both would
      // survive the same commit as duplicates)
      val e = intercept[UnsupportedOperationException] {
        spark.sql("UPDATE t_upd SET k = 99")
      }
      assert(e.getMessage.contains("one"),
        e.getMessage)
    } finally GraftSql.unregister("t_upd")
  }

  test("MERGE USING a graft_versioned TVF source: two versioned tables compose") {
    val srcPath = tmpDir("dml_tvf_src")
    val tgtPath = tmpDir("dml_tvf_tgt")
    GraftSql.register("t_tvf", tgtPath, "k")
    try {
      VersionedTable.append(Seq((1L, "old"), (5L, "keep")).toDF("k", "v"),
        tgtPath)
      VersionedTable.append(Seq((1L, "NEW"), (7L, "ins")).toDF("k", "v"),
        srcPath)
      spark.sql(s"""
        MERGE INTO t_tvf USING
          (SELECT * FROM graft_versioned('$srcPath')) s ON t_tvf.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      assert(VersionedTable.readLatest(spark, tgtPath)
        .as[(Long, String)].collect().sorted
        === Array((1L, "NEW"), (5L, "keep"), (7L, "ins")))
    } finally GraftSql.unregister("t_tvf")
  }
}
