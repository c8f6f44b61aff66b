package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Round-18 nested schema evolution: ADD COLUMNS and ALTER COLUMN
  * TYPE reach struct FIELDS — the two DDLs the round-17 verdict named
  * as the rest of the nested-evolution story q332 opened. Contracts
  * under test:
  *
  *  - nested ADD is metadata-only: existing batches NULL-fill the new
  *    inner field on read, new writes carry it;
  *  - a RE-ADDED inner name (dropped earlier) maps to a FRESH
  *    physical column — the retired parquet values can never
  *    resurface — while `VERSION AS OF` a pre-drop version still
  *    serves the ORIGINAL values (schema epochs);
  *  - nested ALTER COLUMN TYPE applies the lossless widening matrix
  *    one level down: old batches promote natively on scan, pre-DDL
  *    versions read narrow, lossy/narrowing changes refuse;
  *  - both refuse mid-stream per batch (shape change, restart
  *    contract) — spec'd for ADD, the same assertMappingUnchanged
  *    path covers TYPE.
  */
class Round18NestedEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"
  private def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  test("nested ADD COLUMNS null-fills old batches; re-ADD after drop never resurfaces values") {
    drop("r18_nadd")
    spark.sql("""CREATE TABLE graft.r18_nadd (
      k BIGINT, meta STRUCT<fmt: STRING, junk: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "INSERT INTO graft.r18_nadd VALUES (1, named_struct('fmt', 'a', 'junk', 77L))")
    // DROP retires the inner physical column...
    spark.sql("ALTER TABLE graft.r18_nadd DROP COLUMN meta.junk")
    // ...and a RE-ADD of the same logical name maps to a FRESH
    // physical column: row 1's stored 77 must NEVER resurface
    spark.sql("ALTER TABLE graft.r18_nadd ADD COLUMNS (meta.junk BIGINT)")
    spark.sql(
      "INSERT INTO graft.r18_nadd VALUES (2, named_struct('fmt', 'b', 'junk', 5L))")
    val cur = spark.table("graft.r18_nadd").orderBy("k")
      .selectExpr("k", "meta.junk").as[(Long, Option[Long])].collect()
    assert(cur === Array((1L, None), (2L, Some(5L))),
      "stale parquet values resurfaced under the re-added name")
    // the fresh pin is explicit in the metadata
    val path = s"$root/r18_nadd"
    val m = graft.catalog.GraftTableMeta.readLatest(path).get
    val inner = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val junkPhys = graft.catalog.ColumnMapping.physicalName(inner("junk"))
    assert(junkPhys !== "junk", s"re-added field must carry a fresh pin, got $junkPhys")
    // pre-drop epoch still serves the ORIGINAL value
    assert(spark.sql(
      "SELECT meta.junk FROM graft.r18_nadd VERSION AS OF 1")
      .as[Option[Long]].collect() === Array(Some(77L)))
    // the path surface agrees (widened read — the evolved-table read)
    val latest = VersionedTable.latestVersion(path).get
    val pathRows = VersionedTable.readAtWidened(spark, path, latest)
      .orderBy("k").selectExpr("k", "meta.junk")
      .as[(Long, Option[Long])].collect()
    assert(pathRows === Array((1L, None), (2L, Some(5L))))
    // path-API write under the current logical shape round-trips
    // through the fresh pin
    VersionedTable.upsertWithRetry(
      spark.sql("SELECT 3L AS k, named_struct('fmt', 'c', 'junk', 9L) AS meta"),
      "k", path)
    assert(spark.table("graft.r18_nadd").filter($"k" === 3L)
      .selectExpr("meta.junk").as[Long].head() === 9L)
  }

  test("plain nested ADD (no drop history) appends without a pin; old rows null-fill") {
    drop("r18_nadd2")
    spark.sql("""CREATE TABLE graft.r18_nadd2 (
      k BIGINT, meta STRUCT<a: BIGINT>) TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r18_nadd2 VALUES (1, named_struct('a', 1L))")
    spark.sql("ALTER TABLE graft.r18_nadd2 ADD COLUMNS (meta.b STRING)")
    spark.sql(
      "INSERT INTO graft.r18_nadd2 VALUES (2, named_struct('a', 2L, 'b', 'x'))")
    assert(spark.table("graft.r18_nadd2").orderBy("k")
      .selectExpr("meta.a", "meta.b")
      .as[(Long, Option[String])].collect()
      === Array((1L, None), (2L, Some("x"))))
    // no drop/rename history: the logical name IS the physical name
    val m = graft.catalog.GraftTableMeta
      .readLatest(s"$root/r18_nadd2").get
    val inner = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(graft.catalog.ColumnMapping.physicalName(inner("b")) === "b")
    // non-nullable nested adds refuse (zero-rewrite contract)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nadd2 ADD COLUMNS (meta.c BIGINT NOT NULL)")
    }
    assert(e.getMessage.contains("nullable"), e.getMessage)
    // adding under a non-struct refuses naming the shape
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nadd2 ADD COLUMNS (k.x BIGINT)")
    }
    assert(e2.getMessage.contains("not a struct") ||
      e2.getMessage.contains("does not exist"), e2.getMessage)
  }

  test("nested ALTER COLUMN TYPE widens losslessly; pre-DDL versions read narrow; lossy refuses") {
    drop("r18_nwiden")
    spark.sql("""CREATE TABLE graft.r18_nwiden (
      k BIGINT, meta STRUCT<sz: INT, fmt: STRING>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "INSERT INTO graft.r18_nwiden VALUES (1, named_struct('sz', 7, 'fmt', 'a'))")
    spark.sql("ALTER TABLE graft.r18_nwiden ALTER COLUMN meta.sz TYPE BIGINT")
    // post-DDL the declared inner type is BIGINT; a value beyond int
    // range commits fine
    spark.sql("""INSERT INTO graft.r18_nwiden VALUES
      (2, named_struct('sz', 5000000000L, 'fmt', 'b'))""")
    val cur = spark.table("graft.r18_nwiden").orderBy("k")
      .selectExpr("meta.sz").as[Long].collect()
    assert(cur === Array(7L, 5000000000L))
    assert(spark.table("graft.r18_nwiden").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("sz").dataType
      === org.apache.spark.sql.types.LongType)
    // epoch boundary: VERSION AS OF the pre-DDL version reads INT
    val old = spark.sql("SELECT meta.sz FROM graft.r18_nwiden VERSION AS OF 1")
    assert(old.schema.head.dataType === org.apache.spark.sql.types.IntegerType)
    assert(old.as[Int].collect() === Array(7))
    // narrowing and lossy changes refuse loudly
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nwiden ALTER COLUMN meta.sz TYPE INT")
    }
    assert(e1.getMessage.contains("lossless") ||
      e1.getMessage.contains("refuses") ||
      e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r18_nwiden ALTER COLUMN meta.fmt TYPE BIGINT")
    }
    assert(e2.getMessage.contains("lossless") ||
      e2.getMessage.contains("refuses") ||
      e2.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e2.getMessage)
  }

  test("nested ADD composes with nested rename and keeps the q332 surfaces consistent") {
    drop("r18_ncompose")
    spark.sql("""CREATE TABLE graft.r18_ncompose (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "INSERT INTO graft.r18_ncompose VALUES (1, named_struct('fmt', 'a', 'sz', 10L))")
    spark.sql("ALTER TABLE graft.r18_ncompose RENAME COLUMN meta.sz TO bytes")
    spark.sql("ALTER TABLE graft.r18_ncompose ADD COLUMNS (meta.lang STRING)")
    spark.sql("""INSERT INTO graft.r18_ncompose VALUES
      (2, named_struct('fmt', 'b', 'bytes', 20L, 'lang', 'en'))""")
    assert(spark.table("graft.r18_ncompose").orderBy("k")
      .selectExpr("meta.bytes", "meta.lang")
      .as[(Long, Option[String])].collect()
      === Array((10L, None), (20L, Some("en"))))
    // the renamed field still reads through its original physical
    // column (zero rewrites happened)
    assert(spark.sql(
      "SELECT meta.sz FROM graft.r18_ncompose VERSION AS OF 1")
      .as[Long].collect() === Array(10L))
    // path surface under the widened read
    val path = s"$root/r18_ncompose"
    val latest = VersionedTable.latestVersion(path).get
    assert(VersionedTable.readAtWidened(spark, path, latest)
      .agg(sum(col("meta.bytes"))).as[Long].head() === 30L)
  }

  test("nested ADD mid-stream refuses per batch naming the restart contract") {
    import org.apache.spark.sql.streaming.Trigger
    drop("r18_nstream_add")
    spark.sql("""CREATE TABLE graft.r18_nstream_add (
      k BIGINT, meta STRUCT<a: BIGINT>) TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r18_nstream_add VALUES (1, named_struct('a', 1L))")
    spark.sql("INSERT INTO graft.r18_nstream_add VALUES (2, named_struct('a', 2L))")
    val path = s"$root/r18_nstream_add"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stale = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", tmpDir("r18-nsadd-ckpt"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.count()
          if (fired.compareAndSet(false, true)) {
            spark.sql(
              "ALTER TABLE graft.r18_nstream_add ADD COLUMNS (meta.b BIGINT)")
            spark.sql("""INSERT INTO graft.r18_nstream_add VALUES
              (3, named_struct('a', 3L, 'b', 4L))""")
          }
          ()
        }.start()
      q.awaitTermination(120000)
      ()
    }
    def msgChain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgChain(stale).contains("RESTART"), msgChain(stale))
    // a FRESH stream (the named restart) picks the new shape up —
    // with `widen`, the evolved-table read: batches predating the ADD
    // null-fill the new inner field (a non-widen restart refuses, as
    // for top-level adds: mixed batch widths cannot exact-match one
    // frozen schema)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q2 = spark.readStream.format("graft").option("widen", "true")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.option("checkpointLocation", tmpDir("r18-nsadd-ckpt2"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(df.count()); ()
      }.trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    assert(seen.get() === 3L, "a fresh stream over the post-ADD table must deliver")
  }
}
