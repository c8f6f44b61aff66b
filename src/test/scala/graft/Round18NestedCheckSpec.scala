package graft

import graft.operators.VersionedTable

/** CHECK constraints over NESTED fields (round-18 verdict #7): the
  * stored `check.<name>` SQL may reference struct fields; it is
  * enforced at the write choke point on the batch's LOGICAL view,
  * follows a nested RENAME inside the same metadata CAS, gates
  * adoption over committed data, and blocks DROP of the referenced
  * path.
  */
class Round18NestedCheckSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  private def chain(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("a CHECK over a struct field enforces at write, survives nested RENAME, blocks DROP") {
    drop("r18_nck")
    spark.sql("""CREATE TABLE graft.r18_nck (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k', 'check.sz_nonneg'='meta.sz >= 0')""")
    spark.sql(
      "INSERT INTO graft.r18_nck VALUES (1, named_struct('fmt', 'a', 'sz', 5L))")
    // enforcement at the choke point, BEFORE any manifest references
    // the batch
    val e1 = intercept[Exception] {
      spark.sql(
        "INSERT INTO graft.r18_nck VALUES (2, named_struct('fmt', 'b', 'sz', -1L))")
    }
    assert(chain(e1).contains("sz_nonneg"), chain(e1))
    assert(spark.table("graft.r18_nck").count() === 1L)
    // nested RENAME rewrites the stored SQL in the SAME metadata CAS
    spark.sql("ALTER TABLE graft.r18_nck RENAME COLUMN meta.sz TO bytes")
    val props = spark.sql("SHOW TBLPROPERTIES graft.r18_nck")
      .as[(String, String)].collect().toMap
    assert(props("check.sz_nonneg").toLowerCase.contains("bytes"),
      s"constraint must follow the nested rename: ${props("check.sz_nonneg")}")
    // ...and keeps ENFORCING under the new name (the stored batch
    // still speaks the stable physical inner name — the logical view
    // at the choke point bridges them)
    val e2 = intercept[Exception] {
      spark.sql(
        "INSERT INTO graft.r18_nck VALUES (3, named_struct('fmt', 'c', 'bytes', -7L))")
    }
    assert(chain(e2).contains("sz_nonneg"), chain(e2))
    spark.sql(
      "INSERT INTO graft.r18_nck VALUES (4, named_struct('fmt', 'd', 'bytes', 8L))")
    assert(spark.table("graft.r18_nck").count() === 2L)
    // DROP of the constrained nested path refuses naming the constraint
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nck DROP COLUMN meta.bytes")
    }
    assert(chain(e3).contains("sz_nonneg"), chain(e3))
    // the path-level write shares the choke point
    val path = "/tmp/graft-test-catalog/r18_nck"
    val e4 = intercept[Exception] {
      VersionedTable.upsertWithRetry(
        spark.sql(
          "SELECT 5L AS k, named_struct('fmt', 'e', 'bytes', -9L) AS meta"),
        "k", path)
    }
    assert(chain(e4).contains("sz_nonneg"), chain(e4))
  }

  test("adopting a nested CHECK over committed data validates it first") {
    drop("r18_nck2")
    spark.sql("""CREATE TABLE graft.r18_nck2 (
      k BIGINT, meta STRUCT<sz: BIGINT>) TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r18_nck2 VALUES (1, named_struct('sz', -3L))")
    // committed data violates: adoption refuses, the claim is never made
    val e = intercept[Exception] {
      spark.sql("""ALTER TABLE graft.r18_nck2
        SET TBLPROPERTIES('check.pos'='meta.sz >= 0')""")
    }
    assert(chain(e).contains("pos"), chain(e))
    val props = spark.sql("SHOW TBLPROPERTIES graft.r18_nck2")
      .as[(String, String)].collect().toMap
    assert(!props.contains("check.pos"),
      "a violated constraint must never be adopted")
    // fix the data; adoption then succeeds and enforces
    spark.sql("UPDATE graft.r18_nck2 SET meta = named_struct('sz', 3L) WHERE k = 1")
    spark.sql("""ALTER TABLE graft.r18_nck2
      SET TBLPROPERTIES('check.pos'='meta.sz >= 0')""")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.r18_nck2 VALUES (2, named_struct('sz', -1L))")
    }
    assert(chain(e2).contains("pos"), chain(e2))
  }
}
