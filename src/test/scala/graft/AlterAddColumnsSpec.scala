package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** `ALTER TABLE ADD COLUMNS` — DDL-first schema evolution on the
  * catalog: declared in `_table.meta` with zero data rewritten,
  * NULL-filled on read for pre-migration batches, refusal legs for
  * every shape the zero-rewrite contract cannot honor.
  */
class AlterAddColumnsSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  test("ALTER ADD then read: existing rows NULL-fill immediately, zero rewrites") {
    drop("aac_basic")
    spark.sql("""CREATE TABLE graft.aac_basic (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.aac_basic VALUES (1, 10), (2, 20)")
    val versionBefore = VersionedTable.latestVersion(
      "/tmp/graft-test-catalog/aac_basic").get
    spark.sql("ALTER TABLE graft.aac_basic ADD COLUMNS (tag STRING)")
    // DDL only: no data commit happened
    assert(VersionedTable.latestVersion("/tmp/graft-test-catalog/aac_basic")
      === Some(versionBefore))
    val rows = spark.sql("SELECT k, v, tag FROM graft.aac_basic")
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
    assert(rows === Array((1L, 10L, None), (2L, 20L, None)))
    // full-width INSERT after the migration; mixed-width batches read
    // deterministically under the declared schema
    spark.sql("INSERT INTO graft.aac_basic VALUES (3, 30, 'new')")
    val all = spark.sql("SELECT k, tag FROM graft.aac_basic")
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(all === Array((1L, None), (2L, None), (3L, Some("new"))))
    drop("aac_basic")
  }

  test("refusals: NOT NULL adds, duplicates; positioned adds land (round 19)") {
    drop("aac_refuse")
    spark.sql("CREATE TABLE graft.aac_refuse (k BIGINT)")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.aac_refuse ADD COLUMNS (c BIGINT NOT NULL)")
    }
    assert(e1.getMessage.contains("nullable"), e1.getMessage)
    // positions lifted in round 19 (declared order is presentation
    // only — ColumnPositionSpec owns the behavior)
    spark.sql("ALTER TABLE graft.aac_refuse ADD COLUMNS (c BIGINT FIRST)")
    assert(spark.table("graft.aac_refuse").schema.fieldNames.toSeq ===
      Seq("c", "k"))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.aac_refuse ADD COLUMNS (k STRING)")
    }
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    drop("aac_refuse")
  }

  test("OPTIMIZE over mixed-width batches keeps every column (widened maintenance read)") {
    drop("aac_opt")
    spark.sql("""CREATE TABLE graft.aac_opt (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.aac_opt VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft.aac_opt ADD COLUMNS (tag STRING)")
    spark.sql("INSERT INTO graft.aac_opt VALUES (3, 30, 'new')")
    // the rewrite reads under the widened union schema — a plain
    // mergeSchema=false read here would pick ONE batch's schema in
    // listing order and silently drop (or nondeterministically keep)
    // the added column
    spark.sql("OPTIMIZE graft.aac_opt")
    val rows = spark.sql("SELECT k, v, tag FROM graft.aac_opt")
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
    assert(rows === Array((1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some("new"))))
    // the compacted batch itself carries the full width
    val hist = VersionedTable.history(spark,
      "/tmp/graft-test-catalog/aac_opt")
      .filter(col("kind") === "compact").count()
    assert(hist === 1L)
    drop("aac_opt")
  }

  test("an ADOPTED path-built table synthesizes meta from content, then evolves") {
    val name = "aac_adopted"
    val path = s"/tmp/graft-test-catalog/$name"
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    // built by the path API — no _table.meta
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
    spark.sql(s"ALTER TABLE graft.$name ADD COLUMNS (note STRING)")
    val rows = spark.sql(s"SELECT k, v, note FROM graft.$name")
      .as[(Long, Long, Option[String])].collect()
    assert(rows === Array((1L, 10L, None)))
    drop(name)
  }
}
