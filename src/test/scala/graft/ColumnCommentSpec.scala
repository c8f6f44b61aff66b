package graft

/** Column COMMENTS (round 18 — previously refused): pure catalog
  * metadata on the declared StructField — CREATE TABLE comments
  * persist, ALTER ... COMMENT sets/changes them (top-level AND
  * nested), ADD COLUMNS carries them, DESCRIBE surfaces them, and
  * they survive a RENAME (the mapping copies field metadata). Never
  * a shape change: no epoch fence, streams continue, scans are
  * untouched (physical schemas strip metadata).
  */
class ColumnCommentSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  private def commentOf(t: String, col: String): Option[String] =
    spark.sql(s"DESCRIBE TABLE graft.$t")
      .filter(org.apache.spark.sql.functions.col("col_name") === col)
      .select("comment").as[Option[String]].head()

  test("comments persist from CREATE, edit via ALTER (top-level and nested), survive RENAME") {
    drop("r18_cmt")
    spark.sql("""CREATE TABLE graft.r18_cmt (
      k BIGINT COMMENT 'the key',
      meta STRUCT<sz: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r18_cmt VALUES (1, named_struct('sz', 5L))")
    assert(commentOf("r18_cmt", "k") === Some("the key"))
    // ALTER sets a comment on an uncommented column
    spark.sql("ALTER TABLE graft.r18_cmt ALTER COLUMN meta COMMENT 'doc metadata'")
    assert(commentOf("r18_cmt", "meta") === Some("doc metadata"))
    // ...and changes an existing one
    spark.sql("ALTER TABLE graft.r18_cmt ALTER COLUMN k COMMENT 'row id'")
    assert(commentOf("r18_cmt", "k") === Some("row id"))
    // nested field comments stick in the declared metadata
    spark.sql("ALTER TABLE graft.r18_cmt ALTER COLUMN meta.sz COMMENT 'bytes'")
    val m = graft.catalog.GraftTableMeta
      .readLatest("/tmp/graft-test-catalog/r18_cmt").get
    val inner = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(inner("sz").metadata.getString("comment") === "bytes")
    // ADD COLUMNS carries its comment
    spark.sql("ALTER TABLE graft.r18_cmt ADD COLUMNS (lang STRING COMMENT 'iso code')")
    assert(commentOf("r18_cmt", "lang") === Some("iso code"))
    // a RENAME keeps the comment (the mapping copies field metadata)
    spark.sql("ALTER TABLE graft.r18_cmt RENAME COLUMN k TO id")
    assert(commentOf("r18_cmt", "id") === Some("row id"))
    // comments never leak into scans or break reads
    assert(spark.table("graft.r18_cmt").selectExpr("meta.sz")
      .as[Long].head() === 5L)
    // a position move (lifted round 19) carries the comment with it
    spark.sql("ALTER TABLE graft.r18_cmt ALTER COLUMN lang FIRST")
    assert(spark.table("graft.r18_cmt").schema.fieldNames.head === "lang")
    assert(commentOf("r18_cmt", "lang") === Some("iso code"))
  }
}
