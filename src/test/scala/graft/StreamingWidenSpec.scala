package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.VersionedTable

/** Streaming schema evolution on the graft source — previously
  * UNDEFINED (new columns silently dropped, a type change crashed
  * deep in the scan); now a contract with two legs, both footer-
  * checked BEFORE any scan:
  *
  *  - default: a mid-stream widening/add-column commit REFUSES loudly
  *    naming the restart contract;
  *  - `widen = true`: the stream declares the widened-at-start
  *    schema; narrower epochs promote natively and absent columns
  *    null-fill — while a batch WIDER than declared still refuses
  *    (a stream cannot change schema mid-flight) and a RESTART picks
  *    the new schema up.
  */
class StreamingWidenSpec extends SparkTestBase {
  import spark.implicits._

  private def drainTo(src: String, ckpt: String, dst: String,
      widen: Boolean): Unit = {
    val reader = spark.readStream.format("graft")
    val q = (if (widen) reader.option("widen", "true") else reader)
      .load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    ()
  }

  test("default stream: a mid-stream type widening refuses loudly naming the restart contract") {
    val src = tmpDir("sw_refuse_src")
    val ckpt = tmpDir("sw_refuse_ckpt")
    val dst = tmpDir("sw_refuse_dst")
    VersionedTable.append(
      Seq((1, 10)).toDF("k", "v")
        .select(col("k").cast("int"), col("v").cast("int")), src)
    drainTo(src, ckpt, dst, widen = false)
    assert(VersionedTable.readLatest(spark, dst).count() === 1L)
    // the migration lands mid-stream: a LONG-typed batch
    VersionedTable.append(
      Seq((2L, 20L)).toDF("k", "v"), src)
    val e = intercept[Exception] { drainTo(src, ckpt, dst, widen = false) }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("RESTART"), s"must name the restart contract: $msg")
  }

  test("default stream: a mid-stream ADD COLUMN refuses instead of silently dropping data") {
    val src = tmpDir("sw_addcol_src")
    val ckpt = tmpDir("sw_addcol_ckpt")
    val dst = tmpDir("sw_addcol_dst")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), src)
    drainTo(src, ckpt, dst, widen = false)
    VersionedTable.append(
      Seq((2L, 20L, "extra")).toDF("k", "v", "note"), src)
    val e = intercept[Exception] { drainTo(src, ckpt, dst, widen = false) }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("adds column") && msg.contains("RESTART"), msg)
  }

  test("widen=true: mixed epochs deliver under the widened schema; narrow appends keep flowing") {
    val src = tmpDir("sw_widen_src")
    val ckpt = tmpDir("sw_widen_ckpt")
    val dst = tmpDir("sw_widen_dst")
    VersionedTable.append(
      Seq((1, 1.5f)).toDF("k", "q")
        .select(col("k").cast("int"), col("q").cast("float")), src)
    VersionedTable.append(
      Seq((2L, 2.5d, 7L)).toDF("k", "q", "tax"), src)
    drainTo(src, ckpt, dst, widen = true) // snapshot: both epochs
    val schema = VersionedTable.readLatest(spark, dst).schema
    assert(schema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(schema("q").dataType === org.apache.spark.sql.types.DoubleType)
    // post-start NARROW append widens into the declaration and flows
    VersionedTable.append(
      Seq((3, 3.5f)).toDF("k", "q")
        .select(col("k").cast("int"), col("q").cast("float")), src)
    drainTo(src, ckpt, dst, widen = true)
    val rows = VersionedTable.readLatest(spark, dst)
      .select(col("k"), col("q"), col("tax")).as[(Long, Double, Option[Long])]
      .collect().sortBy(_._1)
    assert(rows === Array((1L, 1.5d, None), (2L, 2.5d, Some(7L)),
      (3L, 3.5d, None)))
  }

  test("widen=true composes with readChangeFeed: preimages deliver under the widened schema") {
    // round 19 — previously a construction-time refusal: the CDC
    // walk's per-commit reads (insert batches AND the preimage views
    // tombstones semi-join against) now go through the widened
    // physical schema; a NARROW-typed tombstone key batch casts to
    // the widened types before the join
    val src = tmpDir("sw_cdc_src")
    val ckpt = tmpDir("sw_cdc_ckpt")
    VersionedTable.append(
      Seq((1, 1.5f)).toDF("k", "q")
        .select(col("k").cast("int"), col("q").cast("float")), src)
    VersionedTable.append(Seq((2L, 2.5d, 7L)).toDF("k", "q", "tax"), src)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Option[Long], String)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("widen", "true").option("readChangeFeed", "true")
        .load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= df.select("k", "q", "tax", "_change_type")
            .as[(Long, Double, Option[Long], String)].collect(); ()
        }.start()
      q.awaitTermination(120000)
    }
    drain() // initial snapshot: both epochs as inserts, widened
    assert(got.sortBy(_._1).toSeq === Seq(
      (1L, 1.5d, None, "insert"), (2L, 2.5d, Some(7L), "insert")), got)
    got.clear()
    // delete the NARROW-epoch row with an INT-typed key frame (the
    // stored tombstone is narrow too), then append — the next drain
    // delivers the widened preimage delete plus the insert
    VersionedTable.deleteKeys(
      Seq(1).toDF("k").select(col("k").cast("int")), "k", src)
    VersionedTable.append(Seq((4L, 4.5d, 9L)).toDF("k", "q", "tax"), src)
    drain()
    assert(got.sortBy(r => (r._1, r._4)).toSeq === Seq(
      (1L, 1.5d, None, "delete"), (4L, 4.5d, Some(9L), "insert")), got)
  }

  test("widen=true: a batch WIDER than the declaration refuses; a restart picks it up") {
    import org.apache.spark.sql.types.{IntegerType, StructType}
    val src = tmpDir("sw_wider_src")
    val ckpt = tmpDir("sw_wider_ckpt")
    val dst = tmpDir("sw_wider_dst")
    VersionedTable.append(
      Seq((1, 10)).toDF("k", "v")
        .select(col("k").cast("int"), col("v").cast("int")), src)
    // the declaration is PINNED at int/int (an explicit .schema — the
    // stream a long-running job froze before the migration; an
    // unpinned AvailableNow restart would legitimately re-widen)
    val pinned = new StructType().add("k", IntegerType).add("v", IntegerType)
    def drainPinned(): Unit = {
      val q = spark.readStream.format("graft").schema(pinned)
        .option("widen", "true").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(120000)
      ()
    }
    drainPinned()
    assert(VersionedTable.readLatest(spark, dst).count() === 1L)
    // the migration commits a LONG batch: wider than the pinned
    // declaration — must refuse, not mis-read under int
    VersionedTable.append(Seq((2L, 20L)).toDF("k", "v"), src)
    val e = intercept[Exception] { drainPinned() }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("RESTART"), msg)
    // the restart contract: an UNPINNED fresh start re-widens over
    // every committed batch and delivers everything
    val ckpt2 = tmpDir("sw_wider_ckpt2")
    val dst2 = tmpDir("sw_wider_dst2")
    drainTo(src, ckpt2, dst2, widen = true)
    assert(VersionedTable.readLatest(spark, dst2)
      .select(col("k")).as[Long].collect().sorted === Array(1L, 2L))
  }

  test("widen=true composes with a NESTED column mapping and delivers across a restart") {
    // round 18 — previously a construction-time refusal: the widened
    // explicit-schema scan now speaks nested PHYSICAL names
    // (toPhysical renames the declared fields recursively), so a
    // widen stream over a nested-RENAMED table delivers the logical
    // view: old batches read through the stable physical inner name,
    // absent fields null-fill, narrow epochs promote
    spark.sql("DROP TABLE IF EXISTS graft.sw_nested")
    spark.sql("""CREATE TABLE graft.sw_nested (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql(
      "INSERT INTO graft.sw_nested VALUES (1, named_struct('fmt', 'a', 'sz', 10L))")
    spark.sql("ALTER TABLE graft.sw_nested RENAME COLUMN meta.sz TO bytes")
    spark.sql(
      "INSERT INTO graft.sw_nested VALUES (2, named_struct('fmt', 'b', 'bytes', 20L))")
    val src = "/tmp/graft-test-catalog/sw_nested"
    val ckpt = tmpDir("sw_nested_ckpt")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft").option("widen", "true")
        .load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= df.selectExpr("k", "meta.bytes").as[(Long, Long)].collect()
          ()
        }.start()
      q.awaitTermination(120000)
      ()
    }
    drain()
    assert(got.sorted.toSeq === Seq((1L, 10L), (2L, 20L)),
      s"the widen stream must deliver the LOGICAL nested view, got $got")
    // across a restart: a third commit arrives under the mapped shape
    spark.sql(
      "INSERT INTO graft.sw_nested VALUES (3, named_struct('fmt', 'c', 'bytes', 30L))")
    drain()
    assert(got.sorted.toSeq === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }
}
