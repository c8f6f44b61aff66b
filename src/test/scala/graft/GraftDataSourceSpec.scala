package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.VersionedTable

/** The `format("graft")` connector contract: batch reads plan the
  * SAME pruned parquet relation as `readAtAuto` (native path,
  * pruning parity proven on the optimized plans), merge-on-read
  * versions stay correct through the fallback scan, writes commit
  * through the same OCC/txn machinery, and the streaming source's
  * offsets-are-versions model survives checkpointed restarts with
  * compactions never re-delivered.
  */
class GraftDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def base(d: String): String = d.substring(d.lastIndexOf('/') + 1)

  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  test("batch read: native relation, readAtAuto parity, pruning parity, time travel") {
    val path = tmpDir("ds_batch")
    Seq(0 until 100, 100 until 200, 200 until 300).foreach { r =>
      VersionedTable.append(r.toDF("k").withColumn("v", $"k" * 2), path,
        statsCols = Seq("k"))
    }
    val viaFormat = spark.read.format("graft").load(path)
    val viaApi = VersionedTable.readAtAuto(spark, path, 3)
    assert(viaFormat.as[(Int, Int)].collect().sorted
      === viaApi.as[(Int, Int)].collect().sorted)
    // pruning parity: the same filter opens the same batch dirs
    val fDirs = scannedDirs(viaFormat.filter($"k" >= 150))
    val aDirs = scannedDirs(viaApi.filter($"k" >= 150))
    assert(fDirs === aDirs && fDirs.size === 2,
      s"format=$fDirs api=$aDirs")
    // time travel via versionAsOf
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(path)
    assert(v1.count() === 100L)
  }

  test("merge-on-read fallback: tombstoned versions read correctly through format()") {
    val path = tmpDir("ds_mor")
    VersionedTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      path, statsCols = Seq("k"))
    VersionedTable.append(Seq((10L, "x"), (11L, "y")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    VersionedTable.deleteKeys(Seq(2L, 11L).toDF("k"), "k", path)
    val df = spark.read.format("graft").load(path)
    assert(df.as[(Long, String)].collect().sorted
      === Array((1L, "a"), (3L, "c"), (10L, "x")))
    // filters and projections through the fallback stay exact
    assert(df.filter($"k" >= 3L).select("v").as[String].collect().sorted
      === Array("a", "c", "x").filter(_ != "a"))
    assert(df.count() === 3L)
    // after OPTIMIZE the native path returns
    VersionedTable.compact(spark, path)
    val compacted = spark.read.format("graft").load(path)
    assert(scannedDirs(compacted).nonEmpty, "native relation expected")
    assert(compacted.count() === 3L)
  }

  test("write path: append / overwrite / errorifexists / ignore / txn idempotence") {
    val path = tmpDir("ds_write")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft").mode("append").save(path)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graft").mode("append").save(path)
    assert(VersionedTable.latestVersion(path) === Some(2L))
    assert(VersionedTable.readLatest(spark, path).count() === 3L)
    // txn-guarded replay is a no-op
    Seq((9L, "z")).toDF("k", "v").write.format("graft")
      .mode("append").option("txnId", "batch-7").save(path)
    Seq((9L, "z")).toDF("k", "v").write.format("graft")
      .mode("append").option("txnId", "batch-7").save(path)
    assert(VersionedTable.latestVersion(path) === Some(3L))
    assert(VersionedTable.readLatest(spark, path).count() === 4L)
    // overwrite replaces content atomically; history survives
    Seq((100L, "new")).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(path)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect() === Array((100L, "new")))
    assert(VersionedTable.readAt(spark, path, 3).count() === 4L,
      "overwrite must not erase history")
    // errorifexists refuses on a non-empty table
    intercept[IllegalStateException] {
      Seq((0L, "no")).toDF("k", "v")
        .write.format("graft").mode("errorifexists").save(path)
    }
    // ignore is a no-op on a non-empty table
    Seq((0L, "no")).toDF("k", "v")
      .write.format("graft").mode("ignore").save(path)
    assert(VersionedTable.readLatest(spark, path).count() === 1L)
    // stats options flow through: a filter on the written table prunes
    val path2 = tmpDir("ds_write_stats")
    Seq(1L, 2L).toDF("k").write.format("graft").mode("append")
      .option("statsCols", "k").save(path2)
    Seq(100L, 200L).toDF("k").write.format("graft").mode("append")
      .option("statsCols", "k").save(path2)
    val pruned = spark.read.format("graft").load(path2).filter($"k" >= 50L)
    assert(scannedDirs(pruned).size === 1)
    assert(pruned.count() === 2L)
  }

  test("streaming source: snapshot + per-version deliveries, restart resumes, compaction silent") {
    val path = tmpDir("ds_stream")
    val ckpt = tmpDir("ds_stream_ckpt")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    VersionedTable.append((1 to 10).toDF("x"), path)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          sink.add((id, df.select("x").as[Int](spark.implicits.newIntEncoder)
            .collect().toSeq.sorted))
          ()
        }.start()
      q.awaitTermination(60000)
      ()
    }

    runOnce() // initial snapshot
    val first = sink.toArray.map(_.asInstanceOf[(Long, Seq[Int])]).toSeq
    assert(first.map(_._2.size).sum === 10, s"snapshot missing: $first")

    // publisher moves on: append, compact (must stay silent), append
    VersionedTable.append((11 to 15).toDF("x"), path)
    VersionedTable.compact(spark, path)
    VersionedTable.append((16 to 18).toDF("x"), path)
    runOnce() // restart from the SAME checkpoint
    val all = sink.toArray.map(_.asInstanceOf[(Long, Seq[Int])]).toSeq
    val delivered = all.flatMap(_._2)
    assert(delivered.sorted === (1 to 18),
      s"restart lost or duplicated rows: $all")

    // steady state: a third run delivers nothing
    val n = all.size
    runOnce()
    val after = sink.toArray.map(_.asInstanceOf[(Long, Seq[Int])]).toSeq
    assert(after.flatMap(_._2).sorted === (1 to 18),
      s"steady-state run re-delivered: $after")
    assert(after.drop(n).forall(_._2.isEmpty),
      s"steady-state batches must be empty: ${after.drop(n)}")
  }

  test("streaming sink: table-to-table pipeline is exactly-once across a restart, no foreachBatch") {
    val src = tmpDir("ds_sink_src")
    val dst = tmpDir("ds_sink_dst")
    val ckpt = tmpDir("ds_sink_ckpt")
    VersionedTable.append((1 to 10).toDF("x"), src)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .withColumn("x2", $"x" * 2)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(60000)
      ()
    }
    runOnce()
    assert(VersionedTable.readLatest(spark, dst)
      .select("x2").as[Int].collect().sorted === (1 to 10).map(_ * 2))
    // restart after more commits: only the delta lands, exactly once
    VersionedTable.append((11 to 13).toDF("x"), src)
    runOnce()
    runOnce() // steady state: empty batches may commit nothing new...
    val rows = VersionedTable.readLatest(spark, dst)
      .select("x2").as[Int].collect().sorted
    assert(rows === (1 to 13).map(_ * 2),
      s"restart lost or duplicated micro-batches: ${rows.toSeq}")
  }

  test("streaming sink Update mode maintains a keyed view via upsert") {
    val src = tmpDir("ds_sink_upd_src")
    val dst = tmpDir("ds_sink_upd_dst")
    val ckpt = tmpDir("ds_sink_upd_ckpt")
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .option("mergeKey", "k")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(60000)
      ()
    }
    runOnce()
    // the source re-keys 2 and adds 9: the keyed view must replace,
    // not duplicate
    VersionedTable.append(Seq((2L, "B"), (9L, "z")).toDF("k", "v"), src)
    runOnce()
    assert(VersionedTable.readLatest(spark, dst)
      .as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "B"), (9L, "z")))
    // without mergeKey, Update refuses loudly
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft").outputMode("update")
        .option("checkpointLocation", tmpDir("ds_sink_upd_ckpt2"))
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ds_sink_upd_dst2"))
      q.awaitTermination(60000)
    }
    assert(e.getMessage.contains("mergeKey") ||
      e.getCause != null && e.getCause.getMessage.contains("mergeKey"))
  }

  test("readChangeFeed stream delivers tagged inserts AND deletes; a materializer stays exact") {
    val src = tmpDir("ds_cdf_src")
    val ckpt = tmpDir("ds_cdf_ckpt")
    val changes = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    VersionedTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      src)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("k", "v", "_change_type").collect().foreach(r =>
            changes.add((r.getLong(0), r.getString(1), r.getString(2))))
          ()
        }.start()
      q.awaitTermination(60000)
      ()
    }
    runOnce() // snapshot: all inserts
    VersionedTable.deleteKeys(Seq(2L).toDF("k"), "k", src)
    VersionedTable.upsert(Seq((3L, "C"), (9L, "z")).toDF("k", "v"), "k", src)
    runOnce() // restart: the delete + the upsert's preimage/postimage
    val all = changes.toArray.map(_.asInstanceOf[(Long, String, String)]).toSeq
    // applying the feed to nothing reproduces the current view exactly
    val applied = all.foldLeft(Map.empty[Long, String]) {
      case (m, (k, v, "insert")) => m + (k -> v)
      case (m, (k, _, "delete")) => m - k
      case (m, _) => m
    }
    assert(applied === Map(1L -> "a", 3L -> "C", 9L -> "z"),
      s"materialized replica diverged: $all")
    assert(all.contains((2L, "b", "delete")) && all.contains((3L, "c", "delete")),
      s"deleted rows must arrive tagged: $all")
  }

  test("widen option: format() reads mixed-epoch types under the widened schema, pruning intact") {
    val path = tmpDir("ds_widen")
    VersionedTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    VersionedTable.append(Seq((3000000000L, "c")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    val df = spark.read.format("graft").option("widen", "true").load(path)
    assert(df.schema("k").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.select("k").as[Long].collect().sorted
      === Array(1L, 2L, 3000000000L))
    // typed pruning composes with widening: the long literal prunes
    // the int-stats batch (same integral domain)
    val pruned = df.filter($"k" >= 100L)
    assert(scannedDirs(pruned).size === 1, s"scanned ${scannedDirs(pruned)}")
    assert(pruned.count() === 1L)
    // without widen, the same mixed table refuses under mergeSchema
    intercept[Exception] {
      spark.read.format("graft").option("mergeSchema", "true").load(path)
        .collect()
    }
  }

  test("maxVersionsPerTrigger rate-limits the version range per micro-batch") {
    val path = tmpDir("ds_stream_rate")
    val ckpt = tmpDir("ds_stream_rate_ckpt")
    (1 to 4).foreach(i => VersionedTable.append(Seq(i).toDF("x"), path))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Int]]()
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.add(df.select("x").as[Int](spark.implicits.newIntEncoder)
          .collect().toSeq.sorted)
        ()
      }.start()
    q.awaitTermination(60000)
    val bs = batches.toArray.map(_.asInstanceOf[Seq[Int]]).toSeq
    assert(bs.flatten.sorted === (1 to 4), s"lost rows: $bs")
    // the first batch is the v0->v1 snapshot; each later version
    // arrives in its own micro-batch
    assert(bs.count(_.nonEmpty) === 4, s"expected 4 rate-limited batches: $bs")
  }
}
