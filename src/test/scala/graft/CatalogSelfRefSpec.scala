package graft

import org.apache.spark.sql.functions._

/** Self-referential statements through the catalog: the write target
  * is NOT a child of the V2 write command (Spark's UnaryCommand shape),
  * so the read-side V1 swap converts the query's relation instance
  * while the target stays native — including when both name the SAME
  * table (the analyzer's per-statement relation cache hands out fresh
  * MultiInstanceRelation copies).
  */
class CatalogSelfRefSpec extends SparkTestBase {
  import spark.implicits._

  test("INSERT INTO graft.t SELECT FROM graft.t: read converts, write target stays native") {
    spark.sql("DROP TABLE IF EXISTS graft.cat_selfref")
    spark.sql("""CREATE TABLE graft.cat_selfref (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cat_selfref SELECT id, id FROM range(0, 5)")
    // the snapshot-pinned read (version 1) feeds the append (version 2)
    spark.sql("""INSERT INTO graft.cat_selfref
      SELECT k + 100, v * 10 FROM graft.cat_selfref WHERE k >= 3""")
    val got = spark.table("graft.cat_selfref").as[(Long, Long)]
      .collect().sorted
    assert(got === Array((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),
      (103L, 30L), (104L, 40L)))
    // MERGE sourcing the target itself (a self-correction) also works:
    // the source reads the pre-merge snapshot
    spark.sql("""
      MERGE INTO graft.cat_selfref AS t USING
        (SELECT k - 100 AS k, v FROM graft.cat_selfref WHERE k >= 100) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    val after = spark.table("graft.cat_selfref").as[(Long, Long)]
      .collect().toMap
    assert(after(3L) === 30L && after(4L) === 40L && after(2L) === 2L)
    spark.sql("DROP TABLE graft.cat_selfref")
  }
}
