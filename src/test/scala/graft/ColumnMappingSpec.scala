package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.catalog.{ColumnMapping, GraftTableMeta}

/** Metadata-only schema evolution beyond ADD: RENAME COLUMN / DROP
  * COLUMN via column mapping (stable physical parquet names behind
  * logical ones), ALTER COLUMN TYPE lossless widening as DDL, schema
  * epochs making `VERSION AS OF` name-correct across the changes, and
  * the ALTER compare-and-swap (no silent last-writer-wins).
  */
class ColumnMappingSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  test("RENAME COLUMN is metadata-only: zero data rewritten, reads + filters + DML under the new name") {
    drop("cm_rename")
    spark.sql("""CREATE TABLE graft.cm_rename (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cm_rename VALUES (1, 10), (2, 20), (3, 30)")
    val dataFiles = {
      val f = new java.io.File(s"$root/cm_rename/data")
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(c =>
          if (c.isDirectory) walk(c) else Seq(c))
      walk(f).filter(_.getName.endsWith(".parquet"))
        .map(p => p.getPath -> p.lastModified()).toMap
    }
    spark.sql("ALTER TABLE graft.cm_rename RENAME COLUMN v TO amount")
    // zero data movement: exactly the same parquet files, untouched
    val after = {
      val f = new java.io.File(s"$root/cm_rename/data")
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(c =>
          if (c.isDirectory) walk(c) else Seq(c))
      walk(f).filter(_.getName.endsWith(".parquet"))
        .map(p => p.getPath -> p.lastModified()).toMap
    }
    assert(after === dataFiles)
    // read, filter, aggregate under the NEW name
    assert(spark.sql(
      "SELECT sum(amount) FROM graft.cm_rename WHERE amount > 10")
      .as[Long].head() === 50L)
    // the old name is gone
    val e = intercept[Exception] {
      spark.sql("SELECT v FROM graft.cm_rename").collect()
    }
    assert(e.getMessage.toLowerCase.contains("v"), e.getMessage)
    // INSERT and native row-level DML under the new name
    spark.sql("INSERT INTO graft.cm_rename VALUES (4, 40)")
    spark.sql("UPDATE graft.cm_rename SET amount = amount + 1 WHERE k = 1")
    spark.sql("DELETE FROM graft.cm_rename WHERE amount = 20")
    val rows = spark.sql("SELECT k, amount FROM graft.cm_rename")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows === Array((1L, 11L), (3L, 30L), (4L, 40L)))
    drop("cm_rename")
  }

  test("DROP COLUMN retires the physical column; a re-ADD never resurfaces old values") {
    drop("cm_drop")
    spark.sql("CREATE TABLE graft.cm_drop (k BIGINT, v BIGINT, tag STRING) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql("INSERT INTO graft.cm_drop VALUES (1, 10, 'old1'), (2, 20, 'old2')")
    spark.sql("ALTER TABLE graft.cm_drop DROP COLUMN tag")
    assert(spark.table("graft.cm_drop").columns.toSeq === Seq("k", "v"))
    // re-ADD the same logical name: fresh physical column — the old
    // parquet values must NOT come back
    spark.sql("ALTER TABLE graft.cm_drop ADD COLUMNS (tag STRING)")
    val rows = spark.sql("SELECT k, tag FROM graft.cm_drop")
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(rows === Array((1L, None), (2L, None)))
    spark.sql("INSERT INTO graft.cm_drop VALUES (3, 30, 'new3')")
    val all = spark.sql("SELECT k, tag FROM graft.cm_drop")
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(all === Array((1L, None), (2L, None), (3L, Some("new3"))))
    // refusals: key column, last column
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cm_drop DROP COLUMN k")
    }
    assert(e1.getMessage.contains("row identity"), e1.getMessage)
    drop("cm_drop")
  }

  test("VERSION AS OF resolves names through the schema epochs (rename + drop history)") {
    drop("cm_epoch")
    spark.sql("""CREATE TABLE graft.cm_epoch (k BIGINT, v BIGINT, s STRING)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.cm_epoch VALUES (1, 10, 'a')") // v1
    spark.sql("ALTER TABLE graft.cm_epoch RENAME COLUMN v TO amount") // v2 (fence)
    spark.sql("INSERT INTO graft.cm_epoch VALUES (2, 20, 'b')") // v3
    spark.sql("ALTER TABLE graft.cm_epoch DROP COLUMN s") // v4 (fence)
    spark.sql("INSERT INTO graft.cm_epoch VALUES (3, 30)") // v5
    // pre-rename version: OLD name, s still present
    val v1 = spark.sql("SELECT * FROM graft.cm_epoch VERSION AS OF 1")
    assert(v1.columns.toSeq === Seq("k", "v", "s"))
    assert(v1.as[(Long, Long, String)].collect() === Array((1L, 10L, "a")))
    // post-rename, pre-drop: new name, s present
    val v3 = spark.sql("SELECT * FROM graft.cm_epoch VERSION AS OF 3")
    assert(v3.columns.toSeq === Seq("k", "amount", "s"))
    assert(v3.as[(Long, Long, String)].collect().sortBy(_._1)
      === Array((1L, 10L, "a"), (2L, 20L, "b")))
    // current: s gone, amount everywhere (old batches read through the
    // stable physical name)
    val cur = spark.sql("SELECT k, amount FROM graft.cm_epoch")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(cur === Array((1L, 10L), (2L, 20L), (3L, 30L)))
    drop("cm_epoch")
  }

  test("ALTER COLUMN TYPE: declared lossless widening, INSERTs conform, lossy refuses") {
    drop("cm_widen")
    spark.sql("CREATE TABLE graft.cm_widen (k BIGINT, n INT) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql("INSERT INTO graft.cm_widen VALUES (1, 100), (2, 200)")
    spark.sql("ALTER TABLE graft.cm_widen ALTER COLUMN n TYPE BIGINT")
    assert(spark.table("graft.cm_widen").schema("n").dataType
      === org.apache.spark.sql.types.LongType)
    // a value only a BIGINT can hold now inserts by declaration
    spark.sql("INSERT INTO graft.cm_widen VALUES (3, 3000000000)")
    assert(spark.sql("SELECT sum(n) FROM graft.cm_widen").as[Long].head()
      === 3000000300L)
    // old version still reads as INT (epoch)
    val v1 = spark.sql("SELECT * FROM graft.cm_widen VERSION AS OF 1")
    assert(v1.schema("n").dataType === org.apache.spark.sql.types.IntegerType)
    // lossy/narrowing declarations refuse loudly
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cm_widen ALTER COLUMN n TYPE INT")
    }
    assert(e1.getMessage.contains("lossless") ||
      e1.getMessage.contains("widen"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cm_widen ALTER COLUMN n TYPE DOUBLE")
    }
    assert(e2.getMessage.contains("lossless") ||
      e2.getMessage.contains("widening"), e2.getMessage)
    drop("cm_widen")
  }

  test("concurrent ALTERs CAS on the metadata generation: the loser fails loudly, nothing is lost") {
    drop("cm_cas")
    spark.sql("CREATE TABLE graft.cm_cas (k BIGINT, v BIGINT)")
    val path = s"$root/cm_cas"
    // the race, interleaved for real: the competing writer publishes
    // generation 1 INSIDE this ALTER's read-modify-write window
    graft.catalog.GraftCatalog.testBeforeMetaWrite = Some(() => {
      val m = GraftTableMeta.readLatest(path).get
      GraftTableMeta.writeGen(path, m.copy(gen = 1L,
        props = m.props + ("winner" -> "other")))
    })
    val e = try intercept[Exception] {
      spark.sql("ALTER TABLE graft.cm_cas SET TBLPROPERTIES('loser'='me')")
    } finally graft.catalog.GraftCatalog.testBeforeMetaWrite = None
    assert(e.getMessage.contains("concurrent ALTER"), e.getMessage)
    // the winner's change is intact, the loser's absent
    val after = GraftTableMeta.readLatest(path).get
    assert(after.props.get("winner") === Some("other"))
    assert(!after.props.contains("loser"))
    // rerun against the new state succeeds as generation 2
    spark.sql("ALTER TABLE graft.cm_cas SET TBLPROPERTIES('loser'='me')")
    assert(GraftTableMeta.readLatest(path).get.gen === 2L)
    drop("cm_cas")
  }

  test("rename keeps pruning + key plumbing: filters on the renamed column push to the scan") {
    drop("cm_plan")
    spark.sql("""CREATE TABLE graft.cm_plan (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'statscols'='k')""")
    spark.sql("INSERT INTO graft.cm_plan SELECT id, id * 10 FROM range(100)")
    spark.sql("ALTER TABLE graft.cm_plan RENAME COLUMN k TO id")
    // the key property followed the rename
    val meta = GraftTableMeta.readLatest(s"$root/cm_plan").get
    // the key and statscols properties followed the rename (they hold
    // LOGICAL names; writes translate to the stable physical name)
    assert(meta.props("key") === "id")
    assert(meta.props("statscols") === "id")
    val plan = spark.sql("SELECT id FROM graft.cm_plan WHERE id >= 90")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual"), plan)
    // MERGE by the renamed key still works end-to-end
    Seq((90L, 1L), (200L, 2L)).toDF("id", "delta")
      .createOrReplaceTempView("cm_plan_src")
    spark.sql("""MERGE INTO graft.cm_plan t USING cm_plan_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.delta)""")
    assert(spark.sql("SELECT v FROM graft.cm_plan WHERE id = 90")
      .as[Long].head() === 901L)
    assert(spark.sql("SELECT v FROM graft.cm_plan WHERE id = 200")
      .as[Long].head() === 2L)
    drop("cm_plan")
  }

  test("manifest-stats pruning prunes ACROSS file-level-manifest (delta) batches — plan-asserted") {
    drop("cm_prune")
    spark.sql("""CREATE TABLE graft.cm_prune (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'statscols'='k')""")
    spark.sql("INSERT INTO graft.cm_prune SELECT id, id FROM range(100)")
    // a NATIVE insert-only MERGE: its batch is a delta write whose
    // manifest entry carries @files (file-level) AND k stats
    spark.range(1000, 1100).toDF("k")
      .withColumn("v", col("k") * 2)
      .createOrReplaceTempView("cm_prune_src")
    // the MATCHED clause forces the WriteDelta route (insert-only
    // MERGE rewrites to a plain append, which has no @files entry)
    spark.sql("""MERGE INTO graft.cm_prune t USING cm_prune_src s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v
      WHEN NOT MATCHED THEN INSERT *""")
    val path = s"$root/cm_prune"
    val f = new org.apache.hadoop.fs.Path(s"$path/data").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dirs = f.listStatus(new org.apache.hadoop.fs.Path(s"$path/data"))
      .map(_.getPath.getName)
    val insertDir = dirs.find(d => d.startsWith("b1_")).get
    val deltaDir = dirs.find(d => d.endsWith("_m")).get
    // k >= 1000 prunes the INSERT batch away and scans the delta
    // batch's explicit FILE roots (the @files segment) — asserted on
    // the final executed plan, not prose
    val q = spark.sql("SELECT sum(v) FROM graft.cm_prune WHERE k >= 1000")
    assert(q.as[Long].head() === (1000L until 1100L).map(_ * 2).sum)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains(insertDir),
      s"insert batch $insertDir not pruned:\n$plan")
    assert(plan.contains(deltaDir), s"delta batch missing:\n$plan")
    drop("cm_prune")
  }
}
