package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Declared NOT NULL columns (round 18): a column declared NOT NULL
  * at CREATE TABLE is now enforced at the write CHOKE POINT — the
  * catalog write path refused at analysis already, but a PATH-level
  * writer could silently commit NULLs under the claim. DROP NOT NULL
  * relaxes the declaration via SQL (merge keys refuse — row
  * identity). SET NOT NULL's SQL form is blocked by Spark's own
  * analyzer for V2 tables ("Cannot change nullable column to
  * non-nullable"); the supported adoption route is a CHECK
  * constraint (`v IS NOT NULL`) — validated over committed data,
  * then enforced at the same choke point.
  */
class NullabilityAlterSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  private def chain(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  private def declaredNullable(path: String, col: String): Boolean =
    graft.catalog.GraftTableMeta.readLatest(path).get.schema(col).nullable

  test("CREATE ... NOT NULL enforces at the path choke point; DROP NOT NULL relaxes") {
    drop("r18_nn")
    spark.sql("""CREATE TABLE graft.r18_nn (k BIGINT, v BIGINT NOT NULL)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r18_nn VALUES (1, 10)")
    val path = "/tmp/graft-test-catalog/r18_nn"
    assert(!declaredNullable(path, "v"))
    // a PATH-level writer refuses a NULL v BEFORE any manifest
    // references the batch (previously it silently landed)
    val before = VersionedTable.latestVersion(path).get
    val e = intercept[Exception] {
      VersionedTable.upsertWithRetry(
        Seq((2L, Option.empty[Long])).toDF("k", "v"), "k", path)
    }
    assert(chain(e).contains("NOT NULL"), chain(e))
    assert(VersionedTable.latestVersion(path) === Some(before),
      "the violating batch must not have committed")
    // non-null writes flow
    VersionedTable.upsertWithRetry(Seq((2L, 20L)).toDF("k", "v"), "k", path)
    assert(spark.table("graft.r18_nn").count() === 2L)
    // DROP NOT NULL relaxes the declaration; NULLs then flow
    spark.sql("ALTER TABLE graft.r18_nn ALTER COLUMN v DROP NOT NULL")
    assert(declaredNullable(path, "v"))
    VersionedTable.upsertWithRetry(
      Seq((3L, Option.empty[Long])).toDF("k", "v"), "k", path)
    assert(spark.table("graft.r18_nn").count() === 3L)
    // the merge key's non-null claim is row identity — not droppable
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nn ALTER COLUMN k DROP NOT NULL")
    }
    assert(chain(e2).contains("row identity"), chain(e2))
  }

  test("SET NOT NULL: Spark blocks the SQL form; the CHECK route adopts and enforces") {
    drop("r18_nn2")
    spark.sql("""CREATE TABLE graft.r18_nn2 (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r18_nn2 VALUES (1, NULL), (2, 20)")
    // Spark's analyzer refuses nullable -> non-nullable for V2 tables
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nn2 ALTER COLUMN v SET NOT NULL")
    }
    assert(e.getMessage.toLowerCase.contains("nullable"), e.getMessage)
    // the supported adoption route: a CHECK constraint — refused
    // while committed NULLs exist, adopted after repair, enforced at
    // the choke point from then on. NOTE: SQL CHECK semantics pass
    // NULL, so the constraint must say IS NOT NULL explicitly.
    val e2 = intercept[Exception] {
      spark.sql("""ALTER TABLE graft.r18_nn2
        SET TBLPROPERTIES('check.v_nn'='v IS NOT NULL')""")
    }
    assert(chain(e2).contains("v_nn"), chain(e2))
    spark.sql("UPDATE graft.r18_nn2 SET v = 10 WHERE k = 1")
    spark.sql("""ALTER TABLE graft.r18_nn2
      SET TBLPROPERTIES('check.v_nn'='v IS NOT NULL')""")
    val e3 = intercept[Exception] {
      spark.sql("INSERT INTO graft.r18_nn2 VALUES (3, NULL)")
    }
    assert(chain(e3).contains("v_nn"), chain(e3))
  }
}
