package graft

import org.apache.spark.sql.functions._

/** Column positions (round 19 — the last ALTER refusal that was
  * neither a contract nor a capability gap, lifted): in a columnar
  * layout the declared order is pure PRESENTATION — parquet columns
  * resolve by physical NAME — so `ADD COLUMNS (c T AFTER a)` and
  * `ALTER COLUMN c FIRST / AFTER y` reorder the declared schema and
  * nothing else. Moves fence like renames: `VERSION AS OF` a
  * pre-move version presents the OLD order, and INSERT binds by the
  * order of its epoch.
  */
class ColumnPositionSpec extends SparkTestBase {
  import spark.implicits._

  private def names(t: String): Seq[String] =
    spark.table(s"graft.$t").schema.fieldNames.toSeq

  test("ALTER COLUMN FIRST/AFTER reorders; data and physical pins survive") {
    spark.sql("DROP TABLE IF EXISTS graft.pos_move")
    spark.sql("""CREATE TABLE graft.pos_move (a BIGINT, b STRING, c BIGINT)
      TBLPROPERTIES('key'='a')""")
    spark.sql("INSERT INTO graft.pos_move VALUES (1, 'x', 10)")
    spark.sql("ALTER TABLE graft.pos_move ALTER COLUMN c FIRST")
    assert(names("pos_move") === Seq("c", "a", "b"))
    spark.sql("ALTER TABLE graft.pos_move ALTER COLUMN c AFTER a")
    assert(names("pos_move") === Seq("a", "c", "b"))
    // INSERT binds by the NEW declared order
    spark.sql("INSERT INTO graft.pos_move VALUES (2, 20, 'y')")
    assert(spark.table("graft.pos_move").orderBy("a")
      .as[(Long, Long, String)].collect() ===
      Array((1L, 10L, "x"), (2L, 20L, "y")))
    // moves fence: the pre-move epoch presents the OLD order
    assert(spark.sql("SELECT * FROM graft.pos_move VERSION AS OF 1")
      .schema.fieldNames.toSeq === Seq("a", "b", "c"))
    // a move composed with rename keeps the stable physical name
    spark.sql("ALTER TABLE graft.pos_move RENAME COLUMN c TO cc")
    spark.sql("ALTER TABLE graft.pos_move ALTER COLUMN cc AFTER b")
    assert(names("pos_move") === Seq("a", "b", "cc"))
    assert(spark.table("graft.pos_move").orderBy("a")
      .selectExpr("cc").as[Long].collect() === Array(10L, 20L))
    spark.sql("DROP TABLE graft.pos_move")
  }

  test("ADD COLUMNS at a position; old batches still NULL-fill") {
    spark.sql("DROP TABLE IF EXISTS graft.pos_add")
    spark.sql("""CREATE TABLE graft.pos_add (a BIGINT, b STRING)
      TBLPROPERTIES('key'='a')""")
    spark.sql("INSERT INTO graft.pos_add VALUES (1, 'x')")
    spark.sql("ALTER TABLE graft.pos_add ADD COLUMNS (n BIGINT AFTER a)")
    assert(names("pos_add") === Seq("a", "n", "b"))
    spark.sql("INSERT INTO graft.pos_add VALUES (2, 5, 'y')")
    assert(spark.table("graft.pos_add").orderBy("a")
      .as[(Long, Option[Long], String)].collect() ===
      Array((1L, None, "x"), (2L, Some(5L), "y")))
    // a bad AFTER sibling refuses loudly — Spark's analyzer catches
    // it before the catalog (FIELD_NOT_FOUND); insertAt's own require
    // backs the non-SQL TableCatalog surface
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.pos_add ADD COLUMNS (z BIGINT AFTER nope)")
    }
    assert(e.getMessage.contains("nope") ||
      e.getMessage.contains("FIELD_NOT_FOUND"), e.getMessage)
    spark.sql("DROP TABLE graft.pos_add")
  }

  test("positions reach struct fields and array elements") {
    spark.sql("DROP TABLE IF EXISTS graft.pos_nested")
    spark.sql("""CREATE TABLE graft.pos_nested (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>,
      m ARRAY<STRUCT<x: BIGINT, y: STRING>>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.pos_nested VALUES
      (1, named_struct('fmt', 'f', 'sz', 9L),
       array(named_struct('x', 1L, 'y', 'a')))""")
    spark.sql("ALTER TABLE graft.pos_nested ALTER COLUMN meta.sz FIRST")
    spark.sql("ALTER TABLE graft.pos_nested ADD COLUMNS (m.element.w BIGINT FIRST)")
    val sch = spark.table("graft.pos_nested").schema
    assert(sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("sz", "fmt"))
    assert(sch("m").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("w", "x", "y"))
    // values unchanged under the reordered presentation
    assert(spark.table("graft.pos_nested")
      .selectExpr("meta.sz", "m[0].x", "m[0].w")
      .as[(Long, Long, Option[Long])].head() === ((9L, 1L, None)))
    spark.sql("DROP TABLE graft.pos_nested")
  }
}
