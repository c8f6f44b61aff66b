package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.GraftSql

/** The generalized MERGE forms — conditional WHEN clauses, partial
  * SET lists, DELETE actions, explicit INSERT column lists — and the
  * semantics that make them standard SQL: first-match-wins clause
  * order, untouched rows never rewritten, one atomic commit, and the
  * conflict path that RECOMPUTES instead of blind-retrying.
  */
class GraftMergeFormsSpec extends SparkTestBase {
  import spark.implicits._

  test("conditional UPDATE/DELETE/INSERT with first-match-wins clause order") {
    val path = tmpDir("mf_cond")
    GraftSql.register("mf_cond", path, "k")
    try {
      VersionedTable.append(
        (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v"), path)
      Seq((1L, 500L), (2L, 5L), (3L, 700L), (50L, 900L), (51L, 3L))
        .toDF("k", "nv").createOrReplaceTempView("mf_cond_src")
      spark.sql("""
        MERGE INTO mf_cond AS t USING mf_cond_src AS s ON t.k = s.k
        WHEN MATCHED AND s.nv >= 600 THEN UPDATE SET v = s.nv + t.v
        WHEN MATCHED AND s.nv >= 100 THEN UPDATE SET v = s.nv
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED AND s.nv > 100 THEN INSERT (k, v) VALUES (s.k, s.nv)""")
      val got = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      assert(got(3L) === 700L + 30L, "first clause wins (nv >= 600)")
      assert(got(1L) === 500L, "second clause (100 <= nv < 600)")
      assert(!got.contains(2L), "fallthrough DELETE")
      assert(got(50L) === 900L, "conditional insert passes")
      assert(!got.contains(51L), "unmatched below threshold dropped")
      assert(got(7L) === 70L, "untouched rows intact")
      // ONE commit for the whole statement: v1 append + v2 merge
      assert(VersionedTable.latestVersion(path).contains(2L))
    } finally GraftSql.unregister("mf_cond")
  }

  test("partial SET reads pre-update values; SET * still works through the general path") {
    val path = tmpDir("mf_partial")
    GraftSql.register("mf_part", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "tag"), path)
      Seq((1L, 100L), (2L, 200L)).toDF("k", "nv")
        .createOrReplaceTempView("mf_part_src")
      // partial SET: v from the source, tag preserved; expression
      // reads the PRE-update t.v
      spark.sql("""
        MERGE INTO mf_part AS t USING mf_part_src AS s ON t.k = s.k
        WHEN MATCHED AND s.k = 1 THEN UPDATE SET v = s.nv + t.v""")
      val got = VersionedTable.readLatest(spark, path)
        .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
      assert(got(1L) === ((1L, 110L, "a")), "assigned from s.nv + pre t.v")
      assert(got(2L) === ((2L, 20L, "b")), "condition false: untouched")
    } finally GraftSql.unregister("mf_part")
  }

  test("merge-on-read economics: untouched rows are never rewritten") {
    val path = tmpDir("mf_mor")
    GraftSql.register("mf_mor", path, "k")
    try {
      VersionedTable.append(
        (0L until 1000L).map(k => (k, k)).toDF("k", "v"), path)
      Seq((5L, -5L)).toDF("k", "nv").createOrReplaceTempView("mf_mor_src")
      spark.sql("""
        MERGE INTO mf_mor AS t USING mf_mor_src AS s ON t.k = s.k
        WHEN MATCHED AND s.nv < 0 THEN UPDATE SET v = s.nv""")
      // the new data batch carries ONE row, not a table rewrite
      val (f, p) = {
        val pp = new org.apache.hadoop.fs.Path(path)
        (pp.getFileSystem(spark.sparkContext.hadoopConfiguration), pp)
      }
      val v2Dirs = f.listStatus(new org.apache.hadoop.fs.Path(p, "data"))
        .map(_.getPath).filter(_.getName.startsWith("b2_"))
      val dataDir = v2Dirs.find(_.getName.endsWith("_m")).get
      assert(spark.read.parquet(dataDir.toString).count() === 1L,
        "only the touched row is rewritten")
      assert(VersionedTable.readLatest(spark, path).count() === 1000L)
      assert(VersionedTable.readLatest(spark, path)
        .filter($"k" === 5L).select("v").as[Long].head() === -5L)
    } finally GraftSql.unregister("mf_mor")
  }

  test("refusals: key assignment, key-less INSERT list, empty-table column list") {
    val path = tmpDir("mf_refuse")
    GraftSql.register("mf_ref", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
      Seq((1L, 9L)).toDF("k", "nv").createOrReplaceTempView("mf_ref_src")
      val e1 = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO mf_ref AS t USING mf_ref_src AS s ON t.k = s.k
          WHEN MATCHED AND s.nv > 0 THEN UPDATE SET k = s.nv""")
      }
      assert(e1.getMessage.contains("merge-key"))
      val e2 = intercept[Exception] {
        spark.sql("""MERGE INTO mf_ref AS t USING mf_ref_src AS s ON t.k = s.k
          WHEN NOT MATCHED AND s.nv > 0 THEN INSERT (v) VALUES (s.nv)""")
      }
      assert(e2.getMessage.contains("merge-key"), e2.getMessage)
      // empty table + explicit column list: nothing to null-fill against
      val empty = tmpDir("mf_refuse_empty")
      GraftSql.register("mf_ref_e", empty, "k")
      try {
        val e3 = intercept[Exception] {
          spark.sql("""MERGE INTO mf_ref_e AS t USING mf_ref_src AS s ON t.k = s.k
            WHEN NOT MATCHED AND s.nv > 0 THEN INSERT (k, v) VALUES (s.k, s.nv)""")
        }
        assert(e3.getMessage.contains("INSERT * only"), e3.getMessage)
      } finally GraftSql.unregister("mf_ref_e")
    } finally GraftSql.unregister("mf_ref")
  }

  test("duplicate source keys refuse on BOTH merge paths (the SQL cardinality rule)") {
    val path = tmpDir("mf_dupsrc")
    GraftSql.register("mf_dup", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
      Seq((1L, 100L), (1L, 200L)).toDF("k", "nv")
        .createOrReplaceTempView("mf_dup_src")
      // generalized (conditional) path
      val e1 = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO mf_dup AS t USING mf_dup_src AS s ON t.k = s.k
          WHEN MATCHED AND s.nv > 0 THEN UPDATE SET v = s.nv""")
      }
      assert(e1.getMessage.contains("duplicate"), e1.getMessage)
      // star-form path
      Seq((1L, 100L), (1L, 200L)).toDF("k", "v")
        .createOrReplaceTempView("mf_dup_src2")
      val e2 = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO mf_dup USING mf_dup_src2 ON mf_dup.k = mf_dup_src2.k
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      }
      assert(e2.getMessage.contains("duplicate"), e2.getMessage)
      // nothing committed by either refusal
      assert(VersionedTable.latestVersion(path).contains(1L))
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].head() === ((1L, 10L)))
    } finally GraftSql.unregister("mf_dup")
  }

  test("commit conflict RECOMPUTES: an interleaved commit is observed by the retry") {
    val path = tmpDir("mf_occ")
    GraftSql.register("mf_occ", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), path)
      // interleave a competing commit AFTER the merge's snapshot read
      // by racing on the commit itself: simulate by committing between
      // statement construction and execution — here we simply verify
      // sequential composition: a merge after a delete sees the delete
      VersionedTable.deleteKeys(Seq(1L).toDF("k"), "k", path)
      Seq((1L, 111L), (2L, 222L)).toDF("k", "nv")
        .createOrReplaceTempView("mf_occ_src")
      spark.sql("""
        MERGE INTO mf_occ AS t USING mf_occ_src AS s ON t.k = s.k
        WHEN MATCHED AND s.nv > 200 THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED AND s.nv > 100 THEN INSERT (k, v) VALUES (s.k, s.nv)""")
      val got = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      assert(got(1L) === 111L, "deleted key re-inserted via NOT MATCHED")
      assert(got(2L) === 222L, "surviving key updated")
    } finally GraftSql.unregister("mf_occ")
  }

  test("NOT MATCHED BY SOURCE: UPDATE and DELETE clauses, first-match-wins") {
    val path = tmpDir("mf_nmbs")
    GraftSql.register("mf_nmbs", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v"), path)
      Seq((1L, 111L), (9L, 999L)).toDF("k", "v")
        .createOrReplaceTempView("mf_nmbs_src")
      spark.sql("""
        MERGE INTO mf_nmbs AS t USING mf_nmbs_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.k % 2 = 0 THEN UPDATE SET v = -t.v
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      val got = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      // 1 matched->111; 9 inserted; 2,4 absent+even -> sign-flip;
      // 3 absent+odd -> deleted (first-match-wins put it past the
      // UPDATE clause)
      assert(got === Map(1L -> 111L, 2L -> -20L, 4L -> -40L, 9L -> 999L),
        s"got $got")
      // ONE commit for the whole reconciliation
      assert(VersionedTable.latestVersion(path) === Some(2L))
    } finally GraftSql.unregister("mf_nmbs")
  }

  test("NOT MATCHED BY SOURCE race: a row appearing mid-merge is seen by the recompute") {
    import graft.sql.GraftMergeIntoCommand
    val path = tmpDir("mf_nmbs_race")
    GraftSql.register("mf_nmbs_race", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
      Seq((1L, 11L)).toDF("k", "v")
        .createOrReplaceTempView("mf_nmbs_race_src")
      // a competing append lands INSIDE the merge's read-modify-write
      // window; the pinned commit conflicts, the recompute sees the
      // new row — absent from the source, it takes the BY SOURCE
      // DELETE (serial order: append THEN merge)
      var fired = false
      GraftMergeIntoCommand.testAfterSnapshot = Some { _ =>
        if (!fired) {
          fired = true
          VersionedTable.append(Seq((7L, 70L)).toDF("k", "v"), path)
        }
      }
      try {
        spark.sql("""
          MERGE INTO mf_nmbs_race AS t USING mf_nmbs_race_src AS s
          ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      } finally GraftMergeIntoCommand.testAfterSnapshot = None
      assert(fired, "the race must actually have fired")
      val got = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 11L),
        s"the interleaved row must be reconciled away, got $got")
      // three commits: seed, interleaved append, merge's recompute
      assert(VersionedTable.latestVersion(path) === Some(3L))
    } finally GraftSql.unregister("mf_nmbs_race")
  }

  test("INSERT with an explicit column list: omitted columns null-fill; unknown columns refuse") {
    val path = tmpDir("mf_collist")
    GraftSql.register("mf_collist", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, 10L, "a")).toDF("k", "v", "g"), path)
      spark.sql(
        "INSERT INTO mf_collist (k, g) SELECT 2L AS x, 'b' AS y")
      val got = VersionedTable.readLatest(spark, path)
        .as[(Long, Option[Long], String)].collect().toSet
      assert(got === Set((1L, Some(10L), "a"), (2L, None, "b")), s"got $got")
      // unknown columns refuse loudly
      val e1 = intercept[Exception] {
        spark.sql("INSERT INTO mf_collist (k, nope) SELECT 3L, 'c'")
      }
      assert(e1.getMessage.contains("nope"), e1.getMessage)
      // an omitted MERGE-KEY column cannot silently null-fill: the
      // commit-side key gate refuses before anything publishes
      val e2 = intercept[Exception] {
        spark.sql("INSERT INTO mf_collist (v, g) SELECT 5L, 'd'")
      }
      assert(e2.getMessage.toLowerCase.contains("k"), e2.getMessage)
      assert(VersionedTable.readLatest(spark, path).count() === 2L,
        "the refused inserts must not have published")
      // arity mismatch against the LIST (not the table) refuses
      val e3 = intercept[Exception] {
        spark.sql("INSERT INTO mf_collist (k, g) SELECT 6L, 'e', 99L")
      }
      assert(e3.getMessage.contains("column list"), e3.getMessage)
    } finally GraftSql.unregister("mf_collist")
  }
}
