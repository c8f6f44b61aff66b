package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.VersionedTable
import graft.catalog.ColumnMapping

/** Round-17 ADVICE items at the spec grain:
  *
  *  - SINGLE TRANSLATION POINT (the round-16 advisory's high item):
  *    the catalog write path no longer pre-renames frames to
  *    physical names before `toStored` translates again. The double
  *    hop broke exactly when a physical name collided with a LATER
  *    logical name: RENAME v TO v_old + ADD COLUMNS (v ...) refused
  *    every catalog INSERT, and a 3-rename column swap permuted
  *    values silently;
  *  - MONOTONE COMMIT CLOCK: `#ts=` is clamped to
  *    max(now, prev + 1) (Delta's in-commit-timestamp rule), so
  *    TIMESTAMP AS OF resolution is order-consistent under
  *    multi-writer clock skew;
  *  - COMPOSITE BLOOM SPEC TRIMMING: `'bloomcols'='a + b'` under an
  *    active mapping translates per trimmed component, matching the
  *    sidecar writer's canonicalization.
  */
class Round17AdviceSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  test("catalog INSERT works after RENAME + re-ADD of the same name") {
    drop("r17_readd")
    spark.sql("""CREATE TABLE graft.r17_readd (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r17_readd VALUES (1, 10)")
    spark.sql("ALTER TABLE graft.r17_readd RENAME COLUMN v TO v_old")
    spark.sql("ALTER TABLE graft.r17_readd ADD COLUMNS (v BIGINT)")
    // physical 'v' (v_old's storage name) now collides with the NEW
    // logical 'v' under a naive double translation — this INSERT
    // refused before the fix
    spark.sql("INSERT INTO graft.r17_readd VALUES (2, 20, 200)")
    assert(spark.table("graft.r17_readd").orderBy("k")
      .select("k", "v_old", "v")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq ===
      Seq((1L, Some(10L), None), (2L, Some(20L), Some(200L))))
    // the stored batch speaks PHYSICAL names: v_old's data is under
    // 'v', the re-added column under a FRESH physical name
    val path = s"$root/r17_readd"
    val latest = VersionedTable.latestVersion(path).get
    val stored = VersionedTable.readAtWidenedPhysical(spark, path, latest)
    assert(stored.columns.contains("v"))
    assert(!stored.columns.contains("v_old"))
  }

  test("a 3-rename column swap reads and writes unpermuted values") {
    drop("r17_swap")
    spark.sql("""CREATE TABLE graft.r17_swap (k BIGINT, a BIGINT, b BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r17_swap VALUES (1, 10, 20)")
    // swap a and b via a temp rename: logical 'a' now presents the
    // old b values and vice versa
    spark.sql("ALTER TABLE graft.r17_swap RENAME COLUMN a TO tmpc")
    spark.sql("ALTER TABLE graft.r17_swap RENAME COLUMN b TO a")
    spark.sql("ALTER TABLE graft.r17_swap RENAME COLUMN tmpc TO b")
    assert(spark.table("graft.r17_swap").select("k", "a", "b")
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 20L, 10L)))
    // renames keep POSITIONS, so the declared order is now (k, b, a)
    assert(spark.table("graft.r17_swap").columns.toSeq ===
      Seq("k", "b", "a"))
    // a positional INSERT follows the declared order: b=200, a=100.
    // The crossed mapping must store b under physical 'a' and a under
    // physical 'b' — the naive double translation landed them swapped
    spark.sql("INSERT INTO graft.r17_swap VALUES (2, 200, 100)")
    assert(spark.table("graft.r17_swap").orderBy("k").select("k", "a", "b")
      .as[(Long, Long, Long)].collect().toSeq ===
      Seq((1L, 20L, 10L), (2L, 100L, 200L)))
    // the path API under logical names agrees
    VersionedTable.upsertWithRetry(
      Seq((3L, 300L, 301L)).toDF("k", "a", "b"), "k", s"$root/r17_swap")
    assert(spark.table("graft.r17_swap").orderBy("k").select("k", "a", "b")
      .as[(Long, Long, Long)].collect().toSeq ===
      Seq((1L, 20L, 10L), (2L, 100L, 200L), (3L, 300L, 301L)))
  }

  test("commit timestamps stay monotone under injected clock skew") {
    val path = tmpDir("r17-ts-skew") + "/t"
    VersionedTable.append(Seq((1L, 1L)).toDF("k", "v"), path)
    // simulate a fast-clock writer: push v1's recorded ts far ahead
    val mf = java.nio.file.Paths.get(s"$path/_v1.manifest")
    val txt = java.nio.file.Files.readString(mf)
    val ts1 = VersionedTable.commitTimeMillis(path, 1L).get
    val future = ts1 + 10_000_000L
    java.nio.file.Files.writeString(mf,
      txt.replace(s"#ts=$ts1", s"#ts=$future"))
    // the local FS keeps a checksum sidecar; the in-place edit above
    // invalidates it — drop it so Hadoop re-reads cleanly
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/._v1.manifest.crc"))
    assert(VersionedTable.commitTimeMillis(path, 1L) === Some(future))
    // the next commit's clock clamps to prev + 1 instead of running
    // backward — versionAtTime stays order-consistent
    VersionedTable.append(Seq((2L, 2L)).toDF("k", "v"), path)
    val ts2 = VersionedTable.commitTimeMillis(path, 2L).get
    assert(ts2 === future + 1L)
    assert(VersionedTable.versionAtTime(path, future * 1000L) === Some(1L))
    assert(VersionedTable.versionAtTime(path, ts2 * 1000L) === Some(2L))
  }

  test("composite bloom specs trim components before translation") {
    val schema = StructType(Seq(
      ColumnMapping.withPhysical(StructField("exp", LongType), "c1"),
      ColumnMapping.withPhysical(StructField("file", StringType), "c2")))
    assert(ColumnMapping.colsToPhysical(Seq("exp + file"), schema) ===
      Seq("c1+c2"))
    assert(ColumnMapping.colsToPhysical(Seq("exp+file"), schema) ===
      Seq("c1+c2"))
  }

  test("first mapping activation mid-stream: rename-only continues, a drop refuses") {
    import org.apache.spark.sql.streaming.Trigger
    drop("r17_activate")
    spark.sql("""CREATE TABLE graft.r17_activate (k BIGINT, v BIGINT, w BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r17_activate VALUES (1, 10, 100)")
    spark.sql("INSERT INTO graft.r17_activate VALUES (2, 20, 200)")
    val path = s"$root/r17_activate"
    // stream starts on the UNMAPPED table (mapColumns freezes false);
    // the FIRST rename activates the mapping mid-flight — alias-only,
    // so the stream continues under its start-time (physical) names
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.option("checkpointLocation", tmpDir("r17-act-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.select("k", "v").as[(Long, Long)].collect()
        if (fired.compareAndSet(false, true)) {
          spark.sql(
            "ALTER TABLE graft.r17_activate RENAME COLUMN v TO amount")
          spark.sql("INSERT INTO graft.r17_activate VALUES (3, 30, 300)")
        }
        ()
      }.start()
    q.awaitTermination(120000)
    // batch 2 (version 2) was delivered AFTER the rename landed —
    // continuation proven; the mid-flight INSERT (3) lies beyond the
    // AvailableNow target frozen at start and arrives on a later run
    assert(got.sorted.toSeq === Seq((1L, 10L), (2L, 20L)),
      "a rename-only activation must not interrupt a physical stream")
    // a DROP activating retirement mid-flight REFUSES — a physical
    // stream would otherwise deliver the dropped column's stale values
    spark.sql("INSERT INTO graft.r17_activate VALUES (4, 40, 400)")
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stale = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", tmpDir("r17-act-ckpt2"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.count()
          if (fired2.compareAndSet(false, true)) {
            spark.sql("ALTER TABLE graft.r17_activate DROP COLUMN w")
            spark.sql("INSERT INTO graft.r17_activate VALUES (5, 50)")
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
    assert(msgChain(stale).contains("RESTART"))
  }
}
