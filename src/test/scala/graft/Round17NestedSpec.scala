package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.catalog.{ColumnMapping, GraftTableMeta}

/** Round-17 verdict items #2 and #7 at the spec grain:
  *
  *  - NESTED-FIELD SCHEMA EVOLUTION: RENAME/DROP of a struct field
  *    under column mapping is metadata-only (the inner field keeps
  *    its physical parquet name; reads rename via one positional
  *    cast and project retired inner fields away), epoch-correct
  *    across time travel on BOTH surfaces (catalog and path), with
  *    the `column-mapping-nested` protocol feature gating stale
  *    readers by name;
  *  - CHECK-CONSTRAINT REWRITE ACROSS RENAME COLUMN: the stored
  *    `check.<name>` SQL follows the rename inside the same metadata
  *    CAS — the constraint keeps enforcing under the new name and
  *    DESCRIBE shows the rewritten expression (DROP of a constrained
  *    column still refuses).
  */
class Round17NestedSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  private def manifestText(path: String, v: Long): String = {
    val src = scala.io.Source.fromFile(s"$path/_v$v.manifest")
    try src.mkString finally src.close()
  }

  test("nested RENAME and DROP: metadata-only, epoch-correct on both surfaces") {
    drop("r17_nested")
    spark.sql("""CREATE TABLE graft.r17_nested (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT, junk: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r17_nested VALUES
      (1, named_struct('fmt', 'csv', 'sz', 10L, 'junk', 7L)),
      (2, named_struct('fmt', 'zip', 'sz', 20L, 'junk', 8L))""")
    val path = s"$root/r17_nested"

    spark.sql("ALTER TABLE graft.r17_nested RENAME COLUMN meta.sz TO bytes")
    spark.sql("ALTER TABLE graft.r17_nested DROP COLUMN meta.junk")
    // the DDL rewrote NO data: still exactly one data batch dir
    val fs = new org.apache.hadoop.fs.Path(s"$path/data")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/data"))
      .count(_.isDirectory) === 1)

    // post-DDL write speaks the NEW logical shape (no junk, sz->bytes)
    spark.sql("""INSERT INTO graft.r17_nested VALUES
      (3, named_struct('fmt', 'txt', 'bytes', 30L))""")

    // catalog surface: current view under the new names, junk gone
    val cur = spark.table("graft.r17_nested").orderBy("k")
      .selectExpr("k", "meta.fmt", "meta.bytes")
      .as[(Long, String, Long)].collect().toSeq
    assert(cur === Seq((1L, "csv", 10L), (2L, "zip", 20L), (3L, "txt", 30L)))
    assert(!spark.table("graft.r17_nested").select("meta.*")
      .columns.contains("junk"), "dropped nested field must not leak")

    // storage is untouched: the PRE-DDL batch's parquet still carries
    // the ORIGINAL physical inner names (sz, junk)
    val firstBatch = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$path/data"))
      .filter(_.isDirectory).map(_.getPath.toString).sorted.head
    val stored = spark.read.parquet(firstBatch).schema("meta")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(stored.fieldNames.toSeq === Seq("fmt", "sz", "junk"))

    // path surface agrees with the catalog, epoch by epoch
    val latest = VersionedTable.latestVersion(path).get
    val pathCur = VersionedTable.readAt(spark, path, latest)
      .orderBy("k").selectExpr("k", "meta.fmt", "meta.bytes")
      .as[(Long, String, Long)].collect().toSeq
    assert(pathCur === cur)
    // VERSION 1 predates the DDL: old names, junk values intact
    val v1 = VersionedTable.readAt(spark, path, 1)
      .orderBy("k").selectExpr("k", "meta.sz", "meta.junk")
      .as[(Long, Long, Long)].collect().toSeq
    assert(v1 === Seq((1L, 10L, 7L), (2L, 20L, 8L)))
    spark.sql("SELECT * FROM graft.r17_nested VERSION AS OF 1")
      .createOrReplaceTempView("r17_nested_v1")
    assert(spark.sql(
      "SELECT sum(meta.junk) FROM r17_nested_v1").as[Long].head() === 15L)

    // the protocol gate names the NESTED feature — a flat-mapping
    // reader must refuse by name, never mis-present inner fields
    assert(manifestText(path, latest)
      .contains("#protocol=column-mapping,column-mapping-nested"))

    // a stale writer still carrying the retired inner field refuses
    // (arity mismatch against the physical struct — loud, pre-commit)
    val e = intercept[Exception] {
      VersionedTable.append(
        spark.sql("""SELECT 9L AS k,
          named_struct('fmt', 'x', 'bytes', 1L, 'junk', 2L) AS meta"""),
        path)
    }
    assert(VersionedTable.latestVersion(path) === Some(latest),
      s"the stale write must not have committed: ${e.getMessage}")

    // path-API write under the CURRENT logical shape round-trips
    VersionedTable.upsertWithRetry(
      spark.sql(
        "SELECT 2L AS k, named_struct('fmt', 'zip', 'bytes', 21L) AS meta"),
      "k", path)
    assert(spark.table("graft.r17_nested").filter($"k" === 2L)
      .selectExpr("meta.bytes").as[Long].head() === 21L)
  }

  test("nested rename keeps filters pushable and nested DDL refusals stay loud") {
    drop("r17_nested2")
    spark.sql("""CREATE TABLE graft.r17_nested2 (
      k BIGINT, s STRUCT<a: BIGINT, b: STRING>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r17_nested2 VALUES
      (1, named_struct('a', 1L, 'b', 'x'))""")
    // ADD of a nested field (round 18 — previously refused): the new
    // inner field appends, existing rows NULL-fill it
    spark.sql("ALTER TABLE graft.r17_nested2 ADD COLUMNS (s.c BIGINT)")
    assert(spark.table("graft.r17_nested2").selectExpr("s.c")
      .as[Option[Long]].head() === None)
    // adding an existing sibling refuses
    val e0 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r17_nested2 ADD COLUMNS (s.a BIGINT)")
    }
    assert(e0.getMessage.contains("already exists"), e0.getMessage)
    // renaming onto an existing sibling refuses
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r17_nested2 RENAME COLUMN s.a TO b")
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // dropping the last field of a struct refuses (drop the column)
    spark.sql("ALTER TABLE graft.r17_nested2 DROP COLUMN s.b")
    spark.sql("ALTER TABLE graft.r17_nested2 DROP COLUMN s.c")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r17_nested2 DROP COLUMN s.a")
    }
    assert(e3.getMessage.contains("last field"), e3.getMessage)
  }

  test("a predicate on a nested-RENAMED field re-binds past the rename cast") {
    drop("r17_push")
    spark.sql("""CREATE TABLE graft.r17_push (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r17_push
      SELECT id, named_struct('fmt', 'f', 'sz', id * 10) FROM range(100)""")
    spark.sql("ALTER TABLE graft.r17_push RENAME COLUMN meta.sz TO bytes")
    val df = spark.table("graft.r17_push").filter("meta.bytes > 500")
    assert(df.count() === 49L)
    // the optimized Filter's condition must extract from the UNCAST
    // scan column (NestedRenamePushdown stripped the rename cast) —
    // that is what lets the predicate reach parquet PushedFilters
    // and SchemaPruning at 100 TB
    import org.apache.spark.sql.catalyst.expressions.{Cast => CCast, GetStructField}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val casts = df.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.collect {
        case GetStructField(CCast(_, _: org.apache.spark.sql.types.StructType, _, _), _, _) => 1
      }.sum
    }.sum
    assert(casts === 0,
      "the Filter still extracts through the rename cast:\n" +
        df.queryExecution.optimizedPlan.toString)
    // and the physical scan pushes the nested predicate under its
    // PHYSICAL name
    val physPlan = df.queryExecution.executedPlan.toString
    assert(physPlan.contains("meta.sz") || physPlan.contains("PushedFilters"),
      physPlan.take(2000))
    // NESTED COLUMN PRUNING through the cast: a projection of ONE
    // renamed inner field reads only its physical column (SchemaPruning
    // sees the bare extraction once the rule rewrites under the alias)
    val proj = spark.table("graft.r17_push").selectExpr("sum(meta.bytes)")
    assert(proj.as[Long].head() === (0 until 100).map(_ * 10L).sum)
    val planStr = proj.queryExecution.executedPlan.toString
    assert(planStr.contains("ReadSchema: struct<meta:struct<sz:bigint>>"),
      s"the scan must read only the one inner column:\n${planStr.take(2000)}")
  }

  test("mid-stream nested rename continues; mid-stream nested drop refuses") {
    import org.apache.spark.sql.streaming.Trigger
    drop("r17_nstream")
    spark.sql("""CREATE TABLE graft.r17_nstream (
      k BIGINT, meta STRUCT<a: BIGINT, b: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "INSERT INTO graft.r17_nstream VALUES (1, named_struct('a', 1L, 'b', 2L))")
    spark.sql(
      "INSERT INTO graft.r17_nstream VALUES (2, named_struct('a', 3L, 'b', 4L))")
    val path = s"$root/r17_nstream"
    // a nested RENAME is alias-only (physical bytes untouched): the
    // stream continues under its start-time names
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.option("checkpointLocation", tmpDir("r17-nstream-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.selectExpr("k", "meta.a").as[(Long, Long)].collect()
        if (fired.compareAndSet(false, true)) {
          spark.sql(
            "ALTER TABLE graft.r17_nstream RENAME COLUMN meta.a TO alpha")
        }
        ()
      }.start()
    q.awaitTermination(120000)
    assert(got.sorted.toSeq === Seq((1L, 1L), (2L, 3L)),
      "a nested rename mid-flight must not interrupt delivery")
    // a nested DROP retires stored bytes: refuse, naming the restart
    spark.sql(
      "INSERT INTO graft.r17_nstream VALUES (3, named_struct('alpha', 5L, 'b', 6L))")
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stale = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", tmpDir("r17-nstream-ckpt2"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.count()
          if (fired2.compareAndSet(false, true)) {
            spark.sql("ALTER TABLE graft.r17_nstream DROP COLUMN meta.b")
            spark.sql("""INSERT INTO graft.r17_nstream VALUES
              (4, named_struct('alpha', 7L))""")
          }
          ()
        }.start()
      q2.awaitTermination(120000)
      ()
    }
    def msgChain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgChain(stale).contains("RESTART"), msgChain(stale))
  }

  test("CHECK constraints follow RENAME COLUMN; DROP still refuses") {
    drop("r17_ck_rename")
    spark.sql("""CREATE TABLE graft.r17_ck_rename (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'check.non_negative'='v >= 0')""")
    spark.sql("INSERT INTO graft.r17_ck_rename VALUES (1, 10)")
    // the rename REWRITES the stored constraint in the same CAS
    spark.sql("ALTER TABLE graft.r17_ck_rename RENAME COLUMN v TO amount")
    val props = spark.sql("SHOW TBLPROPERTIES graft.r17_ck_rename")
      .as[(String, String)].collect().toMap
    assert(props("check.non_negative").toLowerCase.contains("amount"),
      s"constraint must be rewritten, got: ${props("check.non_negative")}")
    // ... and keeps ENFORCING under the new name
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.r17_ck_rename VALUES (2, -5)")
    }
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(chain(e).contains("non_negative"), chain(e))
    spark.sql("INSERT INTO graft.r17_ck_rename VALUES (3, 30)")
    assert(spark.table("graft.r17_ck_rename").count() === 2L)
    // DROP of a constrained column still refuses naming the constraint
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.r17_ck_rename DROP COLUMN amount")
    }
    assert(e2.getMessage.contains("non_negative"), e2.getMessage)
  }
}
