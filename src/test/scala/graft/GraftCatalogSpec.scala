package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** The graft DSv2 TableCatalog: versioned tables as first-class NAMES
  * — DDL, reads (native V1 plan swap), writes (native V2 resolution
  * over the V1Write fallback), time travel, CTAS/saveAsTable, DML by
  * name with the key from TBLPROPERTIES, and adoption of path-built
  * tables. No GraftSql.register anywhere in this suite.
  */
class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$name"); ()
  }

  test("CREATE TABLE / INSERT / SELECT by name: full lifecycle, no register()") {
    drop("cat_basic")
    spark.sql("""CREATE TABLE graft.cat_basic (k BIGINT, v STRING)
      TBLPROPERTIES('key'='k')""")
    // native INSERT path: Spark's own column conformance (ints cast
    // losslessly to the declared BIGINT)
    spark.sql("INSERT INTO graft.cat_basic VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.cat_basic VALUES (3, 'c')")
    assert(spark.sql("SELECT k, v FROM graft.cat_basic ORDER BY k")
      .as[(Long, String)].collect()
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    // each INSERT was one versioned commit: time travel by name
    assert(spark.sql("SELECT * FROM graft.cat_basic VERSION AS OF 1")
      .count() === 2L)
    // INSERT OVERWRITE replaces atomically, history intact
    spark.sql("INSERT OVERWRITE graft.cat_basic VALUES (9, 'z')")
    assert(spark.sql("SELECT v FROM graft.cat_basic").as[String].collect()
      === Array("z"))
    assert(spark.sql("SELECT * FROM graft.cat_basic VERSION AS OF 2")
      .count() === 3L)
    // DataFrame API sees the same table
    assert(spark.table("graft.cat_basic").count() === 1L)
    drop("cat_basic")
    // the name no longer resolves (Spark reports it as an attempted
    // direct-file query on the 'graft' source — good enough: gone)
    intercept[Exception](spark.table("graft.cat_basic").collect())
    ()
  }

  test("reads resolve to the V1 readAtAuto plan: vectorized scan + stats pruning kept") {
    drop("cat_plan")
    spark.sql("""CREATE TABLE graft.cat_plan (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'statscols'='k')""")
    spark.sql("INSERT INTO graft.cat_plan SELECT id, id * 10 FROM range(0, 100)")
    spark.sql("INSERT INTO graft.cat_plan SELECT id, id * 10 FROM range(100, 200)")
    val df = spark.sql("SELECT v FROM graft.cat_plan WHERE k >= 150")
    // the analyzed plan must be V1 (LogicalRelation), not a V2 scan
    val analyzed = df.queryExecution.optimizedPlan
    val v2Nodes = analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
    }
    assert(v2Nodes.isEmpty, "reads must convert to the V1 plan")
    // statscols table property indexed both inserts: the stats-pruned
    // scan opens ONLY the second batch
    val files = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("b2_")),
      s"stats pruning through the catalog read must drop batch 1: $files")
    assert(df.as[Long].collect().sorted === (150L until 200L).map(_ * 10).toArray)
    drop("cat_plan")
  }

  test("CTAS and saveAsTable round-trip through the catalog") {
    drop("cat_ctas")
    spark.sql("""CREATE TABLE graft.cat_ctas AS
      SELECT id AS k, id * 2 AS dbl FROM range(0, 50)""")
    assert(spark.table("graft.cat_ctas").agg(sum("dbl")).as[Long].head()
      === (0L until 50L).map(_ * 2).sum)
    // CTAS over an existing table refuses
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.cat_ctas AS SELECT 1 AS x")
    }
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    drop("cat_ctas")
    // saveAsTable: the DataFrame writer's name-based path
    drop("cat_saved")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.saveAsTable("graft.cat_saved")
    assert(spark.table("graft.cat_saved").count() === 2L)
    // append mode composes as a second commit
    Seq((3L, "c")).toDF("k", "v")
      .write.mode("append").saveAsTable("graft.cat_saved")
    assert(spark.table("graft.cat_saved").count() === 3L)
    assert(VersionedTable.latestVersion(
      "/tmp/graft-test-catalog/cat_saved").contains(2L))
    drop("cat_saved")
  }

  test("conditional MERGE / UPDATE / DELETE by catalog name; key from TBLPROPERTIES") {
    drop("cat_dml")
    spark.sql("""CREATE TABLE graft.cat_dml (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cat_dml SELECT id, id * 10 FROM range(0, 10)")
    Seq((2L, 1000L), (3L, 5L), (20L, 7L), (21L, 200L))
      .toDF("k", "nv").createOrReplaceTempView("cat_dml_src")
    // conditional clauses + partial SET + conditional INSERT — no
    // register() call anywhere
    spark.sql("""
      MERGE INTO graft.cat_dml AS t USING cat_dml_src AS s ON t.k = s.k
      WHEN MATCHED AND s.nv > 100 THEN UPDATE SET v = s.nv
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED AND s.nv > 100 THEN INSERT (k, v) VALUES (s.k, s.nv)""")
    val got = spark.table("graft.cat_dml").as[(Long, Long)].collect().toMap
    assert(got(2L) === 1000L, "matched + conditional update")
    assert(!got.contains(3L), "matched + fallthrough DELETE")
    assert(!got.contains(20L), "unmatched row failing the insert condition")
    assert(got(21L) === 200L, "conditional insert")
    assert(got(5L) === 50L, "untouched rows stay")
    // UPDATE and DELETE by name
    spark.sql("UPDATE graft.cat_dml SET v = v + 1 WHERE k < 2")
    spark.sql("DELETE FROM graft.cat_dml WHERE k = 9")
    val after = spark.table("graft.cat_dml").as[(Long, Long)].collect().toMap
    assert(after(0L) === 1L && after(1L) === 11L && !after.contains(9L))
    drop("cat_dml")
  }

  test("DML on a key-less catalog table refuses naming TBLPROPERTIES; SHOW TABLES lists") {
    drop("cat_nokey")
    spark.sql("CREATE TABLE graft.cat_nokey (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.cat_nokey VALUES (1, 'a')")
    val e = intercept[UnsupportedOperationException] {
      spark.sql("DELETE FROM graft.cat_nokey WHERE k = 1")
    }
    assert(e.getMessage.contains("key"), e.getMessage)
    val tables = spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1))
    assert(tables.contains("cat_nokey"))
    // declaring the key AFTER the fact unlocks DML: ALTER TABLE SET
    // TBLPROPERTIES persists into the meta file
    spark.sql("ALTER TABLE graft.cat_nokey SET TBLPROPERTIES('key'='k')")
    spark.sql("DELETE FROM graft.cat_nokey WHERE k = 1")
    assert(spark.table("graft.cat_nokey").count() === 0L)
    drop("cat_nokey")
  }

  test("TIMESTAMP AS OF resolves by manifest time; pre-first-commit refuses loudly") {
    drop("cat_ts")
    spark.sql("CREATE TABLE graft.cat_ts (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.cat_ts VALUES (1, 'a')")
    Thread.sleep(50)
    val t1 = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    Thread.sleep(1200) // clear any 1s mtime granularity
    spark.sql("INSERT INTO graft.cat_ts VALUES (2, 'b'), (3, 'c')")
    assert(spark.table("graft.cat_ts").count() === 3L)
    assert(spark.sql(s"SELECT * FROM graft.cat_ts TIMESTAMP AS OF '$t1'")
      .count() === 1L, "the pre-second-commit instant must serve v1")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.cat_ts TIMESTAMP AS OF '2000-01-01'")
        .collect()
    }
    assert(e.getMessage.contains("no retained version"), e.getMessage)
    drop("cat_ts")
  }

  test("readStream.table by name: versions-as-offsets through the V1 fallback") {
    import org.apache.spark.sql.streaming.Trigger
    drop("cat_stream")
    spark.sql("""CREATE TABLE graft.cat_stream (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cat_stream SELECT id, id * 2 FROM range(0, 20)")
    spark.sql("INSERT INTO graft.cat_stream SELECT id, id * 2 FROM range(20, 30)")
    val ckpt = tmpDir("cat_stream_ckpt")
    val dst = tmpDir("cat_stream_dst")
    val q = spark.readStream.table("graft.cat_stream")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    assert(graft.operators.VersionedTable.readLatest(spark, dst)
      .agg(sum("v")).as[Long].head() === (0L until 30L).map(_ * 2).sum)
    // a third commit resumes from the WAL on the next run
    spark.sql("INSERT INTO graft.cat_stream SELECT id, id * 2 FROM range(30, 35)")
    val q2 = spark.readStream.table("graft.cat_stream")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q2.awaitTermination(120000)
    assert(graft.operators.VersionedTable.readLatest(spark, dst)
      .count() === 35L)
    drop("cat_stream")
  }

  test("USE graft: single-part DML resolves under the current catalog + namespace") {
    drop("cat_use")
    spark.sql("""CREATE TABLE graft.cat_use (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cat_use SELECT id, id FROM range(0, 10)")
    spark.sql("USE graft")
    try {
      spark.sql("DELETE FROM cat_use WHERE k >= 8")
      spark.sql("UPDATE cat_use SET v = v * 10 WHERE k < 2")
      assert(spark.table("cat_use").count() === 8L)
      assert(spark.table("cat_use").filter($"k" === 1L)
        .select("v").as[Long].head() === 10L)
    } finally spark.sql("USE spark_catalog")
    drop("cat_use")
  }

  test("namespaced tables: DDL, DML, and maintenance verbs on graft.ns.t") {
    spark.sql("DROP TABLE IF EXISTS graft.ns13.cat_nst")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ns13")
    spark.sql("""CREATE TABLE graft.ns13.cat_nst (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.ns13.cat_nst SELECT id, id FROM range(0, 20)")
    spark.sql("DELETE FROM graft.ns13.cat_nst WHERE k % 2 = 0")
    spark.sql("OPTIMIZE graft.ns13.cat_nst")
    assert(spark.table("graft.ns13.cat_nst").count() === 10L)
    assert(VersionedTable.tombstoneDebt(
      "/tmp/graft-test-catalog/ns13/cat_nst") === 0,
      "OPTIMIZE through the namespaced identifier folded the tombstone")
    val hist = spark.sql("DESCRIBE HISTORY graft.ns13.cat_nst").collect()
      .map(_.getString(1)).toSeq
    assert(hist === Seq("append", "delete", "compact"))
    spark.sql("DROP TABLE graft.ns13.cat_nst")
  }

  test("racing CREATE TABLEs: exclusive meta create makes exactly one winner") {
    drop("cat_race")
    spark.sql("CREATE TABLE graft.cat_race (k BIGINT)")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.cat_race (k BIGINT, extra STRING)")
    }
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    // the loser changed nothing: the winner's schema stands
    assert(spark.table("graft.cat_race").columns.toSeq === Seq("k"))
    drop("cat_race")
  }

  test("upsertWithDeletes: a version conflict throws (single attempt); committed data untouched") {
    val path = tmpDir("cat_uwd_occ")
    VersionedTable.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), path)
    // the interloper lands BETWEEN the merge's read-modify-write and
    // its commit (injected through the seam): the single-attempt
    // commit must refuse — the CALLER recomputes, because conditional
    // clauses must re-evaluate against the interleaved state
    // (GraftMergeIntoCommand's retry loop; blind retry is only sound
    // for the unconditional star forms)
    val e = intercept[java.io.IOException] {
      VersionedTable.upsertWithDeletesHooked(
        Some(Seq((1L, 11L)).toDF("k", "v")), None, Seq("k"), path,
        None, beforeCommit = { _ =>
          VersionedTable.append(Seq((9L, 90L)).toDF("k", "v"), path); ()
        })
    }
    assert(e.getMessage.contains("already committed"), e.getMessage)
    // the interloper's commit stands; the merge published nothing
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().sorted
      === Array((1L, 10L), (2L, 20L), (9L, 90L)))
  }

  test("a path-built versioned table is ADOPTED by dropping it under the root") {
    val root = "/tmp/graft-test-catalog"
    val path = s"$root/cat_adopted"
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    VersionedTable.append(Seq((1L, "x"), (2L, "y")).toDF("k", "v"), path)
    // no CREATE TABLE ever ran: the manifests make it a table
    assert(spark.table("graft.cat_adopted").count() === 2L)
    assert(spark.sql("SELECT v FROM graft.cat_adopted WHERE k = 2")
      .as[String].head() === "y")
    drop("cat_adopted")
  }
}
