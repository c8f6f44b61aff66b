package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** The versioned-table publish contract: commits are atomic (one
  * manifest rename), history is time-travelable until vacuumed, a
  * failed commit leaves the previous version fully intact, and
  * vacuum reclaims both expired versions and crash orphans without
  * touching what kept manifests reference.
  */
class VersionedTableSpec extends SparkTestBase {
  import spark.implicits._

  test("append/readAt/readLatest: versions are append-composed and time-travelable") {
    val path = tmpDir("vt_basic")
    val v1 = VersionedTable.append((1 to 10).toDF("x"), path)
    val v2 = VersionedTable.append((11 to 15).toDF("x"), path)
    assert(v1 === 1L && v2 === 2L)
    assert(VersionedTable.latestVersion(path) === Some(2L))
    assert(VersionedTable.readAt(spark, path, 1).as[Int].collect().sorted
      === (1 to 10).toArray)
    assert(VersionedTable.readAt(spark, path, 2).as[Int].collect().sorted
      === (1 to 15).toArray)
    assert(VersionedTable.readLatest(spark, path).count() === 15L)
  }

  test("a failed commit rename publishes nothing; the previous version stays intact") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.failrename.impl", classOf[FailRenameFileSystem].getName)
    // failrename:// overlays the SAME local directory, so v1 commits
    // through the plain path and only v2's commit goes through the
    // rename-refusing scheme — isolating the commit point itself
    val dir = tmpDir("vt_failcommit")
    VersionedTable.append((1 to 5).toDF("x"), dir)
    val e = intercept[java.io.IOException] {
      VersionedTable.append((6 to 9).toDF("x"), "failrename://" + dir)
    }
    assert(e.getMessage.contains("NOT published"))
    // the manifest rename never happened: version 2 does not exist,
    // version 1 reads exactly as before, and the orphaned batch dir
    // is invisible to every reader
    assert(VersionedTable.latestVersion(dir) === Some(1L))
    assert(VersionedTable.readLatest(spark, dir).count() === 5L)
    intercept[IllegalArgumentException] {
      VersionedTable.readAt(spark, dir, 2).collect()
    }
  }

  test("txn-guarded append: a replayed commit is a no-op returning the committed version") {
    val path = tmpDir("vt_txn")
    val v1 = VersionedTable.append((1 to 5).toDF("x"), path,
      txnId = Some("batch-0"))
    // at-least-once replay of the SAME micro-batch: no new version,
    // no duplicate rows
    val replay = VersionedTable.append((1 to 5).toDF("x"), path,
      txnId = Some("batch-0"))
    assert(v1 === 1L && replay === 1L)
    assert(VersionedTable.latestVersion(path) === Some(1L))
    assert(VersionedTable.readLatest(spark, path).count() === 5L)
    // the NEXT batch commits normally and carries its own txn
    val v2 = VersionedTable.append((6 to 7).toDF("x"), path,
      txnId = Some("batch-1"))
    assert(v2 === 2L)
    assert(VersionedTable.committedTxn(path, 2) === Some("batch-1"))
    assert(VersionedTable.readLatest(spark, path).count() === 7L)
  }

  test("merge-on-read delete: deletion is versioned; time travel sees pre-delete rows") {
    val path = tmpDir("vt_delete")
    VersionedTable.append((1 to 10).toDF("x"), path)
    VersionedTable.append((11 to 15).toDF("x"), path)
    val v3 = VersionedTable.deleteKeys(Seq(2, 4, 11).toDF("x"), "x", path)
    assert(v3 === 3L)
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === (1 to 15).filterNot(Set(2, 4, 11)).toArray)
    // the delete did not rewrite history: v2 still has every row
    assert(VersionedTable.readAt(spark, path, 2).count() === 15L)
    // vacuum to the delete version only: the tombstone batch is as
    // referenced as the data batches and must survive
    VersionedTable.vacuum(path, keep = 1)
    assert(VersionedTable.readLatest(spark, path).count() === 12L)
    // deleting from an empty path refuses
    intercept[IllegalArgumentException] {
      VersionedTable.deleteKeys(Seq(1).toDF("x"), "x", tmpDir("vt_del_empty"))
    }
  }

  test("compact folds tombstones into one batch; content identical; history until vacuum") {
    val path = tmpDir("vt_compact")
    VersionedTable.append((1 to 10).toDF("x"), path)
    VersionedTable.append((11 to 15).toDF("x"), path)
    VersionedTable.deleteKeys(Seq(3, 12).toDF("x"), "x", path)
    val before = VersionedTable.readLatest(spark, path)
      .as[Int].collect().sorted
    val v4 = VersionedTable.compact(spark, path)
    assert(v4 === 4L)
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === before, "compaction changed the table content")
    // pre-compaction versions still time-travel until vacuumed
    assert(VersionedTable.readAt(spark, path, 2).count() === 15L)
    VersionedTable.vacuum(path, keep = 1)
    val dirs = new java.io.File(s"$path/data").listFiles().map(_.getName)
    assert(dirs.toSeq === Seq("b4"),
      s"vacuum after compact should leave only the compacted batch: ${dirs.toSeq}")
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === before)
  }

  test("vacuum drops expired versions and crash orphans, keeps referenced batches byte-identical") {
    val path = tmpDir("vt_vacuum")
    VersionedTable.append((1 to 4).toDF("x"), path)
    VersionedTable.append((5 to 6).toDF("x"), path)
    VersionedTable.append((7 to 9).toDF("x"), path)
    // crash orphan: a batch dir that no manifest references
    (100 to 101).toDF("x").write.parquet(s"$path/data/b99_orphan")
    val fsDir = new java.io.File(s"$path/data")
    val before = new java.io.File(s"$path/data/b3").listFiles().map(f =>
      f.getName -> f.length()).toMap

    intercept[IllegalArgumentException] { VersionedTable.vacuum(path, 0) }
    VersionedTable.vacuum(path, keep = 2)

    // versions 2 and 3 survive; version 1's manifest is gone; batch
    // b1 is still referenced by v2/v3 manifests so it must remain
    assert(VersionedTable.readAt(spark, path, 3).count() === 9L)
    assert(VersionedTable.readAt(spark, path, 2).count() === 6L)
    intercept[IllegalArgumentException] {
      VersionedTable.readAt(spark, path, 1).collect()
    }
    assert(!fsDir.listFiles().map(_.getName).contains("b99_orphan"),
      "crash orphan survived the vacuum")
    val after = new java.io.File(s"$path/data/b3").listFiles().map(f =>
      f.getName -> f.length()).toMap
    assert(after === before, "a referenced batch dir was touched by vacuum")
  }
}
