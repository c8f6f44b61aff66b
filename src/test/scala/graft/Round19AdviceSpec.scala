package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.ColumnMapping
import graft.operators.VersionedTable

/** Round-19 ADVICE hazards, each spec'd at the exact failure shape
  * the review named:
  *
  *  1. the stats key grammar joins path segments with '.', so a
  *     TOP-LEVEL column literally named "meta.bytes" collides with
  *     the struct field meta.bytes — a predicate on the literal
  *     column must make NO pruning claim (it could be tested against
  *     the nested field's envelope and wrongly prune batches);
  *  2. `statsSuffix` must still RECORD stats for a literal dotted
  *     top-level column when no nested path resolves (the flat
  *     fallback — previously the dotted walk failed and the column
  *     silently recorded nothing);
  *  3. CREATE TABLE / ADD COLUMNS must refuse INNER non-null claims
  *     (struct fields, array elements) — the write choke point
  *     enforces top-level NOT NULL only, so a stored inner claim
  *     would be trusted by Catalyst and validated by no writer;
  *  4. SET NOT NULL adoption re-validates AFTER the metadata CAS and
  *     rolls the claim back loudly when a concurrent write landed
  *     NULLs in the window (the CHECK-adoption discipline applied to
  *     the claim that feeds Catalyst nullability).
  */
class Round19AdviceSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  private def chain(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  private def manifestText(path: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, s"_v$v.manifest")), "UTF-8")

  test("a literal dotted column name makes no pruning claim against nested stats") {
    val path = tmpDir("adv19_dotcol")
    // two batches; the NESTED meta.bytes is small in b1 / large in
    // b2, while the LITERAL "meta.bytes" column carries the OPPOSITE
    // ranges — before the fix, a predicate on the literal column was
    // tested against the nested field's envelope and wrongly pruned
    // the batch actually holding the rows
    def mk(r: Range, lit0: Long): DataFrame =
      r.toDF("k").selectExpr("CAST(k AS LONG) AS k",
        "named_struct('bytes', CAST(k AS LONG)) AS meta",
        s"CAST($lit0 - k AS LONG) AS `meta.bytes`")
    VersionedTable.append(mk(0 until 100, 5000L), path,
      statsCols = Seq("meta.bytes"))
    VersionedTable.append(mk(1000 until 1100, 50L), path,
      statsCols = Seq("meta.bytes"))
    // literal column value 4950 lives in batch 1 — whose NESTED
    // envelope is [0, 99] and would exclude it
    val q = VersionedTable.readAtAuto(spark, path, 2)
      .filter(col("`meta.bytes`") === 4950L)
    assert(q.count() === 1L,
      "a predicate on the literal dotted column pruned the wrong batch")
    assert(scannedDirs(q).size === 2,
      "the literal column must make no claim — both batches stay")
    // the NESTED predicate still prunes (the claim that is sound)
    val nested = VersionedTable.readAtAuto(spark, path, 2)
      .filter($"meta.bytes" >= 1000L)
    assert(scannedDirs(nested).size === 1)
    assert(nested.count() === 100L)
  }

  test("statsSuffix falls back to a literal top-level column when no nested path resolves") {
    val path = tmpDir("adv19_dotstats")
    VersionedTable.append(
      spark.range(10).selectExpr("id AS k", "id * 7 AS `m.x`"),
      path, statsCols = Seq("m.x"))
    val m = manifestText(path, 1)
    assert(m.contains(";m.x:0:63"),
      s"literal dotted column recorded no stats: $m")
  }

  test("colsToPhysical translates a literal dotted top-level name through its mapping") {
    val f = ColumnMapping.withPhysical(
      StructField("a.b", LongType), "a.b#2")
    val schema = StructType(Seq(StructField("k", LongType), f))
    assert(ColumnMapping.colsToPhysical(Seq("a.b"), schema) === Seq("a.b#2"))
    // a genuine nested path still wins over the flat fallback
    val nested = StructType(Seq(StructField("a",
      StructType(Seq(StructField("b", LongType))))))
    assert(ColumnMapping.colsToPhysical(Seq("a.b"), nested) === Seq("a.b"))
  }

  test("CREATE TABLE refuses inner non-null claims; the CHECK adoption route works") {
    spark.sql("DROP TABLE IF EXISTS graft.adv19_innernn")
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graft.adv19_innernn (
        k BIGINT, meta STRUCT<x: BIGINT NOT NULL>)
        TBLPROPERTIES('key'='k')""")
    }
    assert(chain(e).contains("top-level columns only"), chain(e))
    assert(chain(e).contains("CHECK"), chain(e))
    // the stated workaround IS enforced: nullable field + nested CHECK
    spark.sql("""CREATE TABLE graft.adv19_innernn (
      k BIGINT, meta STRUCT<x: BIGINT>)
      TBLPROPERTIES('key'='k', 'check.xnn'='meta.x IS NOT NULL')""")
    spark.sql(
      "INSERT INTO graft.adv19_innernn VALUES (1, named_struct('x', 5L))")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.adv19_innernn " +
        "VALUES (2, named_struct('x', CAST(NULL AS BIGINT)))")
    }
    assert(chain(e2).contains("xnn"), chain(e2))
    assert(spark.table("graft.adv19_innernn").count() === 1L)
    spark.sql("DROP TABLE graft.adv19_innernn")
  }

  test("ADD COLUMNS refuses a struct column carrying inner non-null claims") {
    spark.sql("DROP TABLE IF EXISTS graft.adv19_addnn")
    spark.sql("""CREATE TABLE graft.adv19_addnn (k BIGINT)
      TBLPROPERTIES('key'='k')""")
    val e = intercept[Exception] {
      spark.sql("""ALTER TABLE graft.adv19_addnn
        ADD COLUMNS (meta STRUCT<x: BIGINT NOT NULL>)""")
    }
    assert(chain(e).contains("top-level columns only"), chain(e))
    spark.sql("DROP TABLE graft.adv19_addnn")
  }

  test("SET NOT NULL adoption re-validates after the CAS and rolls back loudly") {
    spark.sql("DROP TABLE IF EXISTS graft.adv19_nnrace")
    spark.sql("""CREATE TABLE graft.adv19_nnrace (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.adv19_nnrace VALUES (1, 10)")
    val path = s"$root/adv19_nnrace"
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array.empty[String], "adv19_nnrace")
    // a NULL-bearing INSERT lands in the exact window: it read the
    // PRE-claim meta, so the write-side gate cannot stop it — and
    // from the CAS on, Catalyst would TRUST the violated claim
    // (IsNotNull elision → wrong query results, worse than a stale
    // constraint)
    graft.catalog.GraftCatalog.testBeforeMetaWrite = Some(() => {
      spark.sql("INSERT INTO graft.adv19_nnrace VALUES (2, NULL)"); ()
    })
    val e =
      try intercept[IllegalStateException] {
        cat.alterTable(ident,
          TableChange.updateColumnNullability(Array("v"), false))
      } finally graft.catalog.GraftCatalog.testBeforeMetaWrite = None
    assert(e.getMessage.contains("ROLLED BACK"), e.getMessage)
    // the table never stands behind the violated claim
    val meta = graft.catalog.GraftTableMeta.readLatest(path).get
    assert(meta.schema("v").nullable,
      "the non-null claim must have been rolled back")
    // NULL writes still flow (the claim is gone, not half-adopted)
    spark.sql("INSERT INTO graft.adv19_nnrace VALUES (3, NULL)")
    assert(spark.table("graft.adv19_nnrace").count() === 3L)
    // after repairing the data, adoption succeeds and the gate holds.
    // The repair must be PHYSICAL (INSERT OVERWRITE): adoption proves
    // null-freedom at the parquet-footer level over every batch the
    // manifest references, and a merge-on-read DELETE leaves the NULL
    // rows physically present under tombstones
    spark.sql("INSERT OVERWRITE graft.adv19_nnrace VALUES (1, 10)")
    cat.alterTable(ident,
      TableChange.updateColumnNullability(Array("v"), false))
    assert(!graft.catalog.GraftTableMeta.readLatest(path)
      .get.schema("v").nullable)
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.adv19_nnrace VALUES (4, NULL)")
    }
    assert(chain(e2).toLowerCase.contains("null"), chain(e2))
    assert(spark.table("graft.adv19_nnrace").count() === 1L)
    spark.sql("DROP TABLE graft.adv19_nnrace")
  }
}
