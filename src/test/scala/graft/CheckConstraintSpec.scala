package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** `check.<name>` TBLPROPERTIES — Delta CHECK constraints on the
  * catalog table: enforced on the WRITTEN batch before any manifest
  * references it (every engine write path shares the choke point),
  * SQL-standard NULL semantics, adoption over existing data validates
  * first, RENAME of a constrained column rewrites the stored SQL to
  * the new name (round 17), and DROP of one refuses.
  */
class CheckConstraintSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  test("violating writes refuse on every path; clean writes and NULLs pass") {
    drop("cc_gate")
    spark.sql("""CREATE TABLE graft.cc_gate (k BIGINT, amount BIGINT)
      TBLPROPERTIES('key'='k', 'check.non_negative'='amount >= 0')""")
    spark.sql("INSERT INTO graft.cc_gate VALUES (1, 10), (2, 0), (3, NULL)")
    // NULL passes (SQL CHECK semantics) — 3 rows landed
    assert(spark.table("graft.cc_gate").count() === 3L)
    // catalog INSERT with a violation refuses naming the constraint,
    // and NOTHING lands (the whole batch is the atomic unit)
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO graft.cc_gate VALUES (4, 5), (5, -1)")
    }
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(chain(e1).contains("non_negative"))
    assert(spark.table("graft.cc_gate").count() === 3L)
    // the NATIVE row-level route shares the gate: an UPDATE that
    // would write a violating postimage refuses, table unchanged
    val e2 = intercept[Exception] {
      spark.sql("UPDATE graft.cc_gate SET amount = amount - 100 WHERE k = 1")
    }
    assert(chain(e2).contains("non_negative"))
    assert(spark.table("graft.cc_gate").filter(col("k") === 1)
      .select("amount").as[Long].head() === 10L)
    // the PATH API shares it too — no surface sidesteps the claim
    val e3 = intercept[IllegalStateException] {
      VersionedTable.append(Seq((9L, -9L)).toDF("k", "amount"),
        s"$root/cc_gate")
    }
    assert(e3.getMessage.contains("non_negative"))
    // a clean native UPDATE still works
    spark.sql("UPDATE graft.cc_gate SET amount = amount + 1 WHERE k = 2")
    assert(spark.table("graft.cc_gate").filter(col("k") === 2)
      .select("amount").as[Long].head() === 1L)
  }

  test("constraint adoption validates existing data; unparsable declarations refuse") {
    drop("cc_adopt")
    spark.sql("""CREATE TABLE graft.cc_adopt (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cc_adopt VALUES (1, 5), (2, -7)")
    // adopting over violating data refuses, property NOT recorded
    val e = intercept[Exception] {
      spark.sql("""ALTER TABLE graft.cc_adopt
        SET TBLPROPERTIES('check.pos'='v >= 0')""")
    }
    assert(e.getMessage.contains("pos"))
    // the claim was never made: a violating write still lands
    spark.sql("INSERT INTO graft.cc_adopt VALUES (3, -1)")
    // repair, adopt, and the gate is live
    spark.sql("DELETE FROM graft.cc_adopt WHERE v < 0")
    spark.sql("""ALTER TABLE graft.cc_adopt
      SET TBLPROPERTIES('check.pos'='v >= 0')""")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.cc_adopt VALUES (4, -4)")
    }
    assert(e2.getMessage.contains("pos"))
    // UNSET drops the gate
    spark.sql("ALTER TABLE graft.cc_adopt UNSET TBLPROPERTIES('check.pos')")
    spark.sql("INSERT INTO graft.cc_adopt VALUES (4, -4)")
    // (1,5) survived the repair delete; (4,-4) landed post-unset
    assert(spark.table("graft.cc_adopt").count() === 2L)
    // an unparsable declaration refuses at CREATE and at ALTER
    intercept[Exception] {
      spark.sql("""CREATE TABLE graft.cc_bad (k BIGINT)
        TBLPROPERTIES('check.broken'='k >=')""")
    }
    intercept[Exception] {
      spark.sql("""ALTER TABLE graft.cc_adopt
        SET TBLPROPERTIES('check.broken'='v >=')""")
    }
  }

  test("adoption/write race: a violating write landing between validation and the CAS rolls the constraint back loudly") {
    drop("cc_race")
    spark.sql("""CREATE TABLE graft.cc_race (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cc_race VALUES (1, 5)")
    // inject a violating INSERT in the exact window: it read the
    // PRE-constraint meta, so the write-side gate cannot stop it
    graft.catalog.GraftCatalog.testBeforeMetaWrite = Some(() => {
      spark.sql("INSERT INTO graft.cc_race VALUES (2, -2)"); ()
    })
    val e =
      try intercept[IllegalStateException] {
        spark.sql("""ALTER TABLE graft.cc_race
          SET TBLPROPERTIES('check.pos'='v >= 0')""")
      } finally graft.catalog.GraftCatalog.testBeforeMetaWrite = None
    assert(e.getMessage.contains("ROLLED BACK"))
    // the table never stands behind the violated claim: the property
    // is gone, and writes are ungated
    assert(!spark.table("graft.cc_race").isEmpty)
    val props = graft.catalog.GraftTableMeta
      .readLatest(s"$root/cc_race").get.props
    assert(!props.contains("check.pos"))
    spark.sql("INSERT INTO graft.cc_race VALUES (3, -3)")
    assert(spark.table("graft.cc_race").count() === 3L)
    // after repairing the data, adoption succeeds and the gate holds
    spark.sql("DELETE FROM graft.cc_race WHERE v < 0")
    spark.sql("""ALTER TABLE graft.cc_race
      SET TBLPROPERTIES('check.pos'='v >= 0')""")
    intercept[Exception] {
      spark.sql("INSERT INTO graft.cc_race VALUES (4, -4)")
    }
    assert(spark.table("graft.cc_race").count() === 1L)
  }

  test("RENAME of a constrained column rewrites the constraint; DROP refuses; logical names over a mapping") {
    drop("cc_map")
    spark.sql("""CREATE TABLE graft.cc_map (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'check.pos'='v >= 0')""")
    spark.sql("INSERT INTO graft.cc_map VALUES (1, 1)")
    // round 17: the rename REWRITES the stored constraint SQL inside
    // the same metadata CAS — enforcement evaluates the batch's
    // logical view, so the constraint holds over the
    // physically-named storage under its NEW spelling
    spark.sql("ALTER TABLE graft.cc_map RENAME COLUMN v TO amount")
    val shown = spark.sql("SHOW TBLPROPERTIES graft.cc_map")
      .as[(String, String)].collect().toMap
    assert(shown("check.pos").toLowerCase.contains("amount"),
      s"constraint must follow the rename, got: ${shown("check.pos")}")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.cc_map VALUES (2, -2)")
    }
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(chain(e2).contains("pos"))
    spark.sql("INSERT INTO graft.cc_map VALUES (2, 2)")
    assert(spark.table("graft.cc_map").count() === 2L)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cc_map DROP COLUMN amount")
    }
    assert(e3.getMessage.contains("pos"))
  }
}
