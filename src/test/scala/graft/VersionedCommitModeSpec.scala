package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Test-only Hadoop FileSystem simulating a rename-free object store
  * under `fakes3://`: "rename" is copy-semantics last-writer-wins (an
  * existing destination is silently REPLACED — S3 has no atomic
  * rename), while exclusive create (`create(f, overwrite = false)`)
  * refuses an existing object — the conditional-PUT
  * (`If-None-Match: *`) contract Hadoop s3a maps conditional writes
  * onto.
  */
class FakeS3FileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "fakes3"
  override def getUri: java.net.URI = java.net.URI.create("fakes3:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}

/** Round-12 commit hardening:
  *
  *  1. the conditional-put commit mode — on a simulated object store,
  *     rename-mode's check-then-rename window demonstrably LOSES a
  *     commit, and put-if-absent mode closes it (two committers to
  *     one version cannot both succeed);
  *  2. maintenance-commit OCC — compaction retries against
  *     interleaved appends/deletes/upserts with content preserved
  *     exactly, and refuses interleaved maintenance loudly.
  */
class VersionedCommitModeSpec extends SparkTestBase {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration.set(
    "fs.fakes3.impl", classOf[FakeS3FileSystem].getName)

  test("rename mode on an object store loses a commit; put-if-absent refuses it") {
    // the hazard, demonstrated with the exact steps commitManifest
    // takes in rename mode: both writers pass the exists check while
    // the version is uncommitted, then both renames 'succeed' — the
    // second silently replaces the first (a LOST commit)
    val dir = tmpDir("vt_fakes3")
    VersionedTable.append(Seq(1).toDF("x"), "fakes3://" + dir)
    val f = new Path("fakes3://" + dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val fin = new Path("fakes3://" + dir, "_v2.manifest")
    assert(!f.exists(fin)) // both writers' exists checks pass here
    def stage(name: String, content: String): Path = {
      val tmp = new Path("fakes3://" + dir, name)
      val out = f.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      tmp
    }
    val a = stage("_v2.manifest.tmpA", "bA")
    val b = stage("_v2.manifest.tmpB", "bB")
    assert(f.rename(a, fin), "writer A's rename succeeds")
    assert(f.rename(b, fin), "writer B's rename ALSO succeeds: A is lost")
    assert(f.delete(fin, false))

    // put-if-absent: the exclusive create IS the atomic point — the
    // second committer fails even though it never ran an exists check
    spark.conf.set(VersionedTable.CommitModeConf, "put-if-absent")
    try {
      VersionedTable.commitManifest("fakes3://" + dir, 2, Seq("bA"))
      val e = intercept[java.io.IOException] {
        VersionedTable.commitManifest("fakes3://" + dir, 2, Seq("bB"))
      }
      assert(e.getMessage.contains("already committed"))
      // the winner's manifest content is intact
      assert(VersionedTable.latestVersion("fakes3://" + dir) === Some(2L))
    } finally spark.conf.unset(VersionedTable.CommitModeConf)
  }

  test("the full table lifecycle works under put-if-absent commits") {
    spark.conf.set(VersionedTable.CommitModeConf, "put-if-absent")
    try {
      val path = tmpDir("vt_pia_lifecycle")
      VersionedTable.append((1 to 10).toDF("x"), path)
      VersionedTable.deleteKeys(Seq(3).toDF("x"), "x", path)
      VersionedTable.compact(spark, path)
      assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
        === (1 to 10).filterNot(_ == 3).toArray)
      // OCC append still retries through the refusal
      var injected = false
      val v = VersionedTable.appendRetrying((11 to 12).toDF("x"), path,
        txnId = None, statsCols = Nil, maxRetries = 5, beforeCommit = { _ =>
          if (!injected) { injected = true
            VersionedTable.append(Seq(100).toDF("x"), path) }
        })
      assert(v === 5L)
      assert(VersionedTable.readLatest(spark, path).count() === 12L)
    } finally spark.conf.unset(VersionedTable.CommitModeConf)
  }

  private def stageCompaction(path: String): (Long, Seq[String]) = {
    val v = VersionedTable.latestVersion(path).get
    val batch = s"b${v + 1}_staged${v}"
    VersionedTable.readAt(spark, path, v)
      .write.mode("overwrite").parquet(s"$path/data/$batch")
    (v, Seq("=" + batch))
  }

  test("maintenance OCC: interleaved append, delete, and upsert all merge content-exactly") {
    // APPEND interleave
    val p1 = tmpDir("vt_maint_app")
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p1)
    val (s1, e1) = stageCompaction(p1)
    var done = false
    val v1 = VersionedTable.commitMaintenance(p1, s1, e1, maxRetries = 3,
      beforeCommit = { _ =>
        if (!done) { done = true
          VersionedTable.append(Seq((9L, "z")).toDF("k", "v"), p1) }
      })
    assert(v1 === 3L)
    assert(VersionedTable.readLatest(spark, p1)
      .as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (9L, "z")))
    // the compacted batch is dataChange=false: a consumer checkpointed
    // before it sees ONLY the interleaved append
    assert(VersionedTable.readChanges(spark, p1, 1, 3)
      .as[(Long, String)].collect() === Array((9L, "z")))

    // DELETE interleave: the tombstone must delete from OUR rewrite
    val p2 = tmpDir("vt_maint_del")
    VersionedTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), p2)
    val (s2, e2) = stageCompaction(p2)
    done = false
    val v2 = VersionedTable.commitMaintenance(p2, s2, e2, maxRetries = 3,
      beforeCommit = { _ =>
        if (!done) { done = true
          VersionedTable.deleteKeys(Seq(2L).toDF("k"), "k", p2) }
      })
    assert(v2 === 3L)
    assert(VersionedTable.readLatest(spark, p2)
      .as[(Long, String)].collect().sorted === Array((1L, "a"), (3L, "c")),
      "the interleaved delete must apply to the compacted batch")

    // UPSERT interleave: replaced value wins over the rewrite
    val p3 = tmpDir("vt_maint_up")
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p3)
    val (s3, e3) = stageCompaction(p3)
    done = false
    val v3 = VersionedTable.commitMaintenance(p3, s3, e3, maxRetries = 3,
      beforeCommit = { _ =>
        if (!done) { done = true
          VersionedTable.upsert(Seq((2L, "B"), (7L, "n")).toDF("k", "v"),
            "k", p3) }
      })
    assert(v3 === 3L)
    assert(VersionedTable.readLatest(spark, p3)
      .as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "B"), (7L, "n")))
  }

  test("maintenance OCC: an interleaved compaction refuses loudly; content intact") {
    val path = tmpDir("vt_maint_refuse")
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val (snap, entries) = stageCompaction(path)
    var done = false
    val e = intercept[java.io.IOException] {
      VersionedTable.commitMaintenance(path, snap, entries, maxRetries = 3,
        beforeCommit = { _ =>
          if (!done) { done = true; VersionedTable.compact(spark, path) }
        })
    }
    assert(e.getMessage.contains("maintenance conflict"))
    // the competitor's compaction stands; nothing was lost
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().sorted === Array((1L, "a"), (2L, "b")))
    assert(VersionedTable.latestVersion(path) === Some(2L))
  }

  test("clustered (multi-entry) maintenance merges with an interleaved append") {
    // the compactByRange/compactByZOrderN shape: the rewrite commits
    // SEVERAL '=' bucket entries; an interleaved append must ride
    // after all of them, and every bucket must survive the merge
    val path = tmpDir("vt_maint_multi")
    VersionedTable.append(
      Seq((1L, "a"), (50L, "b"), (99L, "c")).toDF("k", "v"), path)
    val snap = VersionedTable.latestVersion(path).get
    val content = VersionedTable.readAt(spark, path, snap)
    content.filter($"k" < 60L).write.mode("overwrite")
      .parquet(s"$path/data/b2_low")
    content.filter($"k" >= 60L).write.mode("overwrite")
      .parquet(s"$path/data/b2_high")
    var done = false
    val v = VersionedTable.commitMaintenance(path, snap,
      Seq("=b2_low;k:1:50", "=b2_high;k:99:99"), maxRetries = 3,
      beforeCommit = { _ =>
        if (!done) { done = true
          VersionedTable.append(Seq((200L, "late")).toDF("k", "v"), path) }
      })
    assert(v === 3L)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().sorted
      === Array((1L, "a"), (50L, "b"), (99L, "c"), (200L, "late")))
    // both bucket entries AND their stats survived the merge; the
    // interleaved batch rides after them
    val pruned = VersionedTable.readAtPruned(spark, path, v, "k", 90L, 100L)
    assert(pruned.as[(Long, String)].collect().sorted
      === Array((99L, "c"), (200L, "late")),
      "stats-less interleaved batch must survive pruning; low bucket prunes")
  }
}
