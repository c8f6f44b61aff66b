package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Round-19 nested DDL through ARRAY-of-struct ELEMENTS — the
  * reference's dominant nested shape (`file_manifest` entries,
  * `agf_ingestion_lambda.py:207,239-245,361-416`; experiment `files`
  * `:314-326`): a manifest entry gaining a field is the first schema
  * evolution that data model actually meets. Spark's collection
  * addressing spells the element struct `m.element.<field>`; the
  * capability the zero-rewrite reads rely on is pinned by
  * [[ArrayScanProbeSpec]] (null-fill + int→long promotion inside
  * repeated groups). Contracts:
  *
  *  - ADD `m.element.f` is metadata-only: old batches NULL-fill the
  *    new element field on read, new writes carry it;
  *  - RENAME keeps the stable physical name inside the element struct
  *    (metadata-only; `VERSION AS OF` a pre-rename version reads the
  *    old name — schema epochs);
  *  - WIDEN applies the lossless matrix inside elements; pre-DDL
  *    versions read narrow; lossy refuses;
  *  - DROP retires the dotted physical path THROUGH the element
  *    (`m.element.f`); reads project it away per element; a re-ADD of
  *    the same logical name pins FRESH, so retired values never
  *    resurface;
  *  - map entries refuse loudly (a map key is a value, not a schema
  *    position).
  */
class ArrayNestedDdlSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"
  private def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  private def chain(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("ADD m.element.f null-fills old batches; new writes carry it") {
    drop("r19_eadd")
    spark.sql("""CREATE TABLE graft.r19_eadd (
      k BIGINT, m ARRAY<STRUCT<fmt: STRING, sz: BIGINT>>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r19_eadd VALUES
      (1, array(named_struct('fmt', 'png', 'sz', 10L),
                named_struct('fmt', 'wav', 'sz', 20L)))""")
    spark.sql("ALTER TABLE graft.r19_eadd ADD COLUMNS (m.element.mime STRING)")
    spark.sql("""INSERT INTO graft.r19_eadd VALUES
      (2, array(named_struct('fmt', 'txt', 'sz', 5L, 'mime', 'text/plain')))""")
    val rows = spark.table("graft.r19_eadd").orderBy("k")
      .selectExpr("k", "m[0].fmt", "m[0].mime", "get(m, 1).mime")
      .as[(Long, String, Option[String], Option[String])].collect()
    assert(rows === Array(
      (1L, "png", None, None),
      (2L, "txt", Some("text/plain"), None)))
    // path surface agrees (the widened evolved-table read)
    val path = s"$root/r19_eadd"
    val latest = VersionedTable.latestVersion(path).get
    assert(VersionedTable.readAtWidened(spark, path, latest)
      .orderBy("k").selectExpr("k", "m[0].mime")
      .as[(Long, Option[String])].collect()
      === Array((1L, None), (2L, Some("text/plain"))))
    // path-API write under the current logical shape round-trips
    VersionedTable.upsertWithRetry(
      spark.sql("SELECT 3L AS k, array(named_struct(" +
        "'fmt', 'csv', 'sz', 9L, 'mime', 'text/csv')) AS m"),
      "k", path)
    assert(spark.table("graft.r19_eadd").filter($"k" === 3L)
      .selectExpr("m[0].mime").as[String].head() === "text/csv")
  }

  test("RENAME m.element.f is metadata-only; pre-rename epochs read the old name") {
    drop("r19_ern")
    spark.sql("""CREATE TABLE graft.r19_ern (
      k BIGINT, m ARRAY<STRUCT<fmt: STRING, sz: BIGINT>>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r19_ern VALUES
      (1, array(named_struct('fmt', 'png', 'sz', 10L)))""")
    spark.sql("ALTER TABLE graft.r19_ern RENAME COLUMN m.element.sz TO bytes")
    spark.sql("""INSERT INTO graft.r19_ern VALUES
      (2, array(named_struct('fmt', 'wav', 'bytes', 20L)))""")
    // both epochs' data serve under the NEW name (stable physical)
    assert(spark.table("graft.r19_ern").orderBy("k")
      .selectExpr("m[0].bytes").as[Long].collect() === Array(10L, 20L))
    // the physical name inside the element struct is the ORIGINAL
    val m = graft.catalog.GraftTableMeta.readLatest(s"$root/r19_ern").get
    val inner = m.schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(graft.catalog.ColumnMapping.physicalName(inner("bytes")) === "sz")
    // a pre-rename version still speaks the old name
    assert(spark.sql("SELECT m[0].sz FROM graft.r19_ern VERSION AS OF 1")
      .as[Long].collect() === Array(10L))
    val e = intercept[Exception] {
      spark.sql("SELECT m[0].bytes FROM graft.r19_ern VERSION AS OF 1")
        .collect()
    }
    assert(chain(e).toLowerCase.contains("bytes"), chain(e))
  }

  test("WIDEN m.element.f promotes old batches natively; lossy refuses") {
    drop("r19_ewide")
    spark.sql("""CREATE TABLE graft.r19_ewide (
      k BIGINT, m ARRAY<STRUCT<sz: INT>>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "INSERT INTO graft.r19_ewide VALUES (1, array(named_struct('sz', 7)))")
    spark.sql("ALTER TABLE graft.r19_ewide ALTER COLUMN m.element.sz TYPE BIGINT")
    spark.sql("""INSERT INTO graft.r19_ewide VALUES
      (2, array(named_struct('sz', 5000000000L)))""")
    assert(spark.table("graft.r19_ewide").orderBy("k")
      .selectExpr("m[0].sz").as[Long].collect() === Array(7L, 5000000000L))
    // pre-DDL version reads narrow (epoch-fenced)
    assert(spark.sql("SELECT m[0].sz FROM graft.r19_ewide VERSION AS OF 1")
      .schema.head.dataType === org.apache.spark.sql.types.IntegerType)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r19_ewide ALTER COLUMN m.element.sz TYPE INT")
    }
    assert(chain(e).toLowerCase.contains("narrow") ||
      chain(e).contains("does not contain") ||
      chain(e).contains("NOT_SUPPORTED_CHANGE_COLUMN"), chain(e))
  }

  test("DROP m.element.f projects away per element; re-ADD pins fresh") {
    drop("r19_edrop")
    spark.sql("""CREATE TABLE graft.r19_edrop (
      k BIGINT, m ARRAY<STRUCT<fmt: STRING, junk: BIGINT>>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r19_edrop VALUES
      (1, array(named_struct('fmt', 'a', 'junk', 77L),
                named_struct('fmt', 'b', 'junk', 88L)))""")
    spark.sql("ALTER TABLE graft.r19_edrop DROP COLUMN m.element.junk")
    // the element struct no longer carries the field
    val sch = spark.table("graft.r19_edrop").schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sch.fieldNames.toSeq === Seq("fmt"))
    assert(spark.table("graft.r19_edrop")
      .selectExpr("m[1].fmt").as[String].head() === "b")
    // the retired path records THROUGH the element
    val m0 = graft.catalog.GraftTableMeta.readLatest(s"$root/r19_edrop").get
    assert(m0.dropped.contains("m.element.junk"), m0.dropped.toString)
    // re-ADD maps to a FRESH physical column: 77/88 never resurface
    spark.sql("ALTER TABLE graft.r19_edrop ADD COLUMNS (m.element.junk BIGINT)")
    spark.sql("""INSERT INTO graft.r19_edrop VALUES
      (2, array(named_struct('fmt', 'c', 'junk', 5L)))""")
    val rows = spark.table("graft.r19_edrop").orderBy("k")
      .selectExpr("k", "m[0].junk").as[(Long, Option[Long])].collect()
    assert(rows === Array((1L, None), (2L, Some(5L))),
      "retired element values resurfaced under the re-added name")
    val m1 = graft.catalog.GraftTableMeta.readLatest(s"$root/r19_edrop").get
    val inner1 = m1.schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(graft.catalog.ColumnMapping.physicalName(inner1("junk")) !== "junk")
    // pre-drop epoch still serves the ORIGINAL values
    assert(spark.sql("SELECT m[1].junk FROM graft.r19_edrop VERSION AS OF 1")
      .as[Long].collect() === Array(88L))
  }

  test("plain- and deep-struct drops record uncorrupted physical paths") {
    // regression (round-19 review): the array-descent marker used
    // reference identity on Seq.tail, which is not stable — every
    // plain-struct descent recorded a spurious 'element' segment
    // ('meta.junk' -> 'meta.element.junk'), so the retired-field
    // projection missed it and the dropped value LEAKED on path reads
    drop("r19_pdrop")
    spark.sql("""CREATE TABLE graft.r19_pdrop (
      k BIGINT, meta STRUCT<fmt: STRING, junk: STRING>,
      s STRUCT<a: STRUCT<b: BIGINT, c: BIGINT>, z: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r19_pdrop VALUES
      (1, named_struct('fmt', 'f', 'junk', 'SECRET'),
       named_struct('a', named_struct('b', 7L, 'c', 8L), 'z', 9L))""")
    spark.sql("ALTER TABLE graft.r19_pdrop DROP COLUMN meta.junk")
    spark.sql("ALTER TABLE graft.r19_pdrop DROP COLUMN s.a.b")
    val m = graft.catalog.GraftTableMeta.readLatest(s"$root/r19_pdrop").get
    assert(m.dropped.contains("meta.junk"), m.dropped.toString)
    assert(m.dropped.contains("s.a.b"), m.dropped.toString)
    // the PATH surface projects the retired fields away — no leak
    val row = VersionedTable.readLatest(spark, s"$root/r19_pdrop")
    assert(!row.selectExpr("meta.*").columns.contains("junk"),
      row.schema.treeString)
    assert(!row.selectExpr("s.a.*").columns.contains("b"),
      row.schema.treeString)
    assert(row.selectExpr("s.a.c", "s.z").as[(Long, Long)].head()
      === ((8L, 9L)))
    drop("r19_pdrop")
  }

  test("COMMENT reaches element fields; map entries refuse loudly") {
    drop("r19_emisc")
    spark.sql("""CREATE TABLE graft.r19_emisc (
      k BIGINT, m ARRAY<STRUCT<sz: BIGINT>>, mp MAP<STRING, BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "ALTER TABLE graft.r19_emisc ALTER COLUMN m.element.sz COMMENT 'octets'")
    val inner = graft.catalog.GraftTableMeta
      .readLatest(s"$root/r19_emisc").get.schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(inner("sz").metadata.getString("comment") === "octets")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r19_emisc ADD COLUMNS (mp.value.x BIGINT)")
    }
    // Spark's analyzer refuses map entries before the catalog sees
    // them (INVALID_FIELD_NAME: "`mp`.`value` is not a struct") —
    // loud either way; the catalog's own walk refuses too (descend)
    assert(chain(e).contains("map") || chain(e).contains("not a struct"),
      chain(e))
    spark.sql("DROP TABLE graft.r19_emisc")
  }
}
