package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.GraftSql

/** SQL maintenance verbs: OPTIMIZE (plain / ZORDER BY / RANGE BY),
  * VACUUM RETAIN, DESCRIBE HISTORY — content-neutral by construction,
  * index-preserving, and loud about what they refuse.
  */
class GraftMaintenanceSqlSpec extends SparkTestBase {
  import spark.implicits._

  test("OPTIMIZE folds merge-on-read debt; content identical; index layer preserved") {
    val path = tmpDir("maint_opt")
    GraftSql.register("m_opt", path, "k")
    try {
      VersionedTable.append((0L until 100L).map(k => (k, k)).toDF("k", "v"),
        path, bloomCols = Seq("k"), statsCols = Seq("k"))
      VersionedTable.deleteKeys(Seq(3L, 4L).toDF("k"), "k", path)
      VersionedTable.upsert(Seq((5L, -5L)).toDF("k", "v"), "k", path)
      val before = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(VersionedTable.tombstoneDebt(path) === 2)
      val v = spark.sql("OPTIMIZE m_opt").as[Long].head()
      assert(v === 4L)
      assert(VersionedTable.tombstoneDebt(path) === 0)
      val after = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(after === before, "OPTIMIZE never changes content")
      // index layer re-recorded on the rewrite: stats prune, blooms exist
      assert(VersionedTable.statsColumnsOf(path, 4L) === Seq("k"))
      assert(VersionedTable.bloomColumnsOf(spark, path, 4L) === Seq("k"))
    } finally GraftSql.unregister("m_opt")
  }

  test("OPTIMIZE ZORDER BY / RANGE BY cluster through SQL text; buckets configurable") {
    val path = tmpDir("maint_z")
    GraftSql.register("m_z", path, "k")
    try {
      VersionedTable.append(
        (0L until 400L).map(k => (k, k % 20L, k / 20L)).toDF("k", "x", "y"),
        path)
      val before = VersionedTable.readLatest(spark, path)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      spark.sql("OPTIMIZE m_z ZORDER BY (x, y) BUCKETS 4")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, Long, Long)].collect().sortBy(_._1) === before)
      // 4 bucket entries, each with stats for BOTH dims
      assert(VersionedTable.statsColumnsOf(path, 2L).toSet === Set("x", "y"))
      spark.sql("OPTIMIZE m_z RANGE BY k BUCKETS 2")
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, Long, Long)].collect().sortBy(_._1) === before)
      assert(VersionedTable.statsColumnsOf(path, 3L) === Seq("k"))
    } finally GraftSql.unregister("m_z")
  }

  test("VACUUM RETAIN drops history from SQL; retention is explicit; DESCRIBE HISTORY reads the log") {
    val path = tmpDir("maint_vac")
    GraftSql.register("m_vac", path, "k")
    try {
      VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
      VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), path)
      VersionedTable.deleteKeys(Seq(1L).toDF("k"), "k", path)
      val hist = spark.sql("DESCRIBE HISTORY m_vac").collect()
      assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((1L, "append"), (2L, "append"), (3L, "delete")))
      // retention must be explicit
      val e = intercept[IllegalArgumentException] {
        spark.sql("VACUUM m_vac")
      }
      assert(e.getMessage.contains("RETAIN"))
      spark.sql("VACUUM m_vac RETAIN 2 VERSIONS")
      intercept[Exception] { VersionedTable.readAt(spark, path, 1L) }
      assert(VersionedTable.readAt(spark, path, 3L).count() === 1L)
      // the q301 replay, entirely from SQL: debt retired, hash-stable
      val afterHist = spark.sql("DESCRIBE HISTORY m_vac").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(afterHist === Seq((2L, "history-truncated"), (3L, "delete")))
    } finally GraftSql.unregister("m_vac")
  }

  test("maintenance verbs over non-graft names: OPTIMIZE/VACUUM refuse, DESCRIBE HISTORY delegates") {
    val e1 = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE definitely_not_graft")
    }
    assert(e1.getMessage.contains("not a graft table"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("VACUUM definitely_not_graft RETAIN 2 VERSIONS")
    }
    assert(e2.getMessage.contains("not a graft table"))
    // DESCRIBE HISTORY over a non-graft name is Spark's own statement
    // (a table literally named `history`): it must NOT hit our path
    val e3 = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY")
    }
    assert(!e3.getMessage.contains("graft"), e3.getMessage)
  }

  test("VACUUM DRY RUN reports reclaimables and touches NOTHING; the real vacuum then reclaims them") {
    import spark.implicits._
    val path = tmpDir("maint_dry")
    GraftSql.register("maint_dry", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path) // v1
      VersionedTable.overwrite(Seq((2L, 20L)).toDF("k", "v"), path) // v2
      VersionedTable.append(Seq((3L, 30L)).toDF("k", "v"), path) // v3
      val dry = spark.sql("VACUUM maint_dry RETAIN 1 VERSIONS DRY RUN")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // v1+v2 manifests below the floor; v1's batch unreferenced by
      // v2's overwrite (v2's own batch is referenced by... nothing at
      // keep=1? v3's manifest carries v2's batch + v3's — so only
      // v1's batch reclaims)
      assert(dry.count(_._1 == "manifest") === 2, dry.toSeq)
      assert(dry.count(_._1 == "batch-dir") === 1, dry.toSeq)
      assert(dry.exists(r => r._1 == "floor" && r._2 == "v3"), dry.toSeq)
      assert(dry.filter(_._1 != "floor").forall(_._3 > 0L), dry.toSeq)
      // NOTHING was touched: all three versions still read
      assert(VersionedTable.readAt(spark, path, 1L).count() === 1L)
      assert(VersionedTable.vacuumFloor(path) === None)
      // the real vacuum reclaims exactly what the dry run named
      spark.sql("VACUUM maint_dry RETAIN 1 VERSIONS")
      assert(VersionedTable.vacuumFloor(path).map(_._1) === Some(3L))
      intercept[IllegalArgumentException] {
        VersionedTable.readAt(spark, path, 1L)
      }
    } finally GraftSql.unregister("maint_dry")
  }

  test("DESCRIBE DETAIL: one metadata-only row — version, batch counts, key, generation, mapping") {
    spark.sql("DROP TABLE IF EXISTS graft.maint_detail")
    spark.sql("""CREATE TABLE graft.maint_detail (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.maint_detail VALUES (1, 10), (2, 20)")
    spark.sql("DELETE FROM graft.maint_detail WHERE k = 1")
    spark.sql("ALTER TABLE graft.maint_detail RENAME COLUMN v TO amount")
    val r = spark.sql("DESCRIBE DETAIL graft.maint_detail").collect().head
    assert(r.getLong(0) === 3L) // v1 insert, v2 delete, v3 ddl fence
    assert(r.getLong(1) === 1L) // one data batch
    assert(r.getLong(2) === 1L) // one tombstone (merge-on-read debt)
    assert(r.getLong(3) === 3L) // all versions retained
    assert(r.getString(4) === "k")
    assert(r.getLong(5) === 1L) // gen 0 = create, gen 1 = the rename
    assert(r.getBoolean(6) === true) // mapping active post-rename
    assert(r.isNullAt(7)) // never vacuumed
    spark.sql("DROP TABLE IF EXISTS graft.maint_detail")
  }
}
