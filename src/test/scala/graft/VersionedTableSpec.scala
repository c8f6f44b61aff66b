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
    assert(dirs.length === 1 && dirs.head.startsWith("b4_"),
      s"vacuum after compact should leave only the compacted batch: ${dirs.toSeq}")
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === before)
  }

  test("position-scoped tombstones: a key deleted then re-appended is visible again") {
    val path = tmpDir("vt_reappend")
    VersionedTable.append((1 to 5).toDF("x"), path)
    VersionedTable.deleteKeys(Seq(3).toDF("x"), "x", path)
    // v2: 3 is gone
    assert(VersionedTable.readAt(spark, path, 2).as[Int].collect().sorted
      === Array(1, 2, 4, 5))
    // v3 re-appends 3 (plus a fresh 6): the delete only affected rows
    // that existed at delete time, so the re-append is visible — the
    // Delta/Iceberg merge-on-read semantics, not delete-wins-forever
    VersionedTable.append(Seq(3, 6).toDF("x"), path)
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === Array(1, 2, 3, 4, 5, 6))
    // and the delete version still reads as it did
    assert(VersionedTable.readAt(spark, path, 2).as[Int].collect().sorted
      === Array(1, 2, 4, 5))
    // compaction preserves the re-appended content
    VersionedTable.compact(spark, path)
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === Array(1, 2, 3, 4, 5, 6))
  }

  test("upsert: one-commit replace-or-insert; readers never see delete without insert") {
    val path = tmpDir("vt_upsert")
    VersionedTable.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), path)
    // replace k=2, insert k=9 — ONE commit
    val v2 = VersionedTable.upsert(Seq((2, "B"), (9, "z")).toDF("k", "v"), "k", path)
    assert(v2 === 2L)
    assert(VersionedTable.readLatest(spark, path).as[(Int, String)].collect().sorted
      === Array((1, "a"), (2, "B"), (3, "c"), (9, "z")))
    // time travel: the pre-upsert version is untouched
    assert(VersionedTable.readAt(spark, path, 1).as[(Int, String)].collect().sorted
      === Array((1, "a"), (2, "b"), (3, "c")))
    // there is no intermediate version where k=2 is deleted but "B"
    // absent: versions go straight 1 -> 2
    assert(VersionedTable.latestVersion(path) === Some(2L))
    // replayed upsert with the same txn id is a no-op
    val v3 = VersionedTable.upsert(Seq((3, "C")).toDF("k", "v"), "k", path,
      txnId = Some("up-1"))
    val replay = VersionedTable.upsert(Seq((3, "C")).toDF("k", "v"), "k", path,
      txnId = Some("up-1"))
    assert(v3 === 3L && replay === 3L)
    assert(VersionedTable.readLatest(spark, path).count() === 4L)
    // upsert into an empty table is a plain insert
    val fresh = tmpDir("vt_upsert_empty")
    VersionedTable.upsert(Seq((1, "a")).toDF("k", "v"), "k", fresh)
    assert(VersionedTable.readLatest(spark, fresh).count() === 1L)
  }

  test("upsert insertOnly: existing keys win (J3 insert-if-absent)") {
    val path = tmpDir("vt_upsert_io")
    VersionedTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    VersionedTable.upsert(Seq((2, "CLOBBER"), (5, "e")).toDF("k", "v"), "k",
      path, insertOnly = true)
    // k=2 kept its original value; k=5 inserted
    assert(VersionedTable.readLatest(spark, path).as[(Int, String)].collect().sorted
      === Array((1, "a"), (2, "b"), (5, "e")))
  }

  test("txn guard holds across interleaved commits, not just the latest manifest") {
    val path = tmpDir("vt_txn_interleaved")
    val v1 = VersionedTable.append((1 to 5).toDF("x"), path,
      txnId = Some("batch-A"))
    // another writer interleaves: a delete (no txn line at all)
    VersionedTable.deleteKeys(Seq(5).toDF("x"), "x", path)
    // and a compact (its manifest carries no txn either)
    VersionedTable.compact(spark, path)
    // the replayed micro-batch must STILL no-op — the guard scans all
    // retained manifests, not just the latest
    val replay = VersionedTable.append((1 to 5).toDF("x"), path,
      txnId = Some("batch-A"))
    assert(v1 === 1L && replay === 1L)
    assert(VersionedTable.latestVersion(path) === Some(3L))
    assert(VersionedTable.readLatest(spark, path).count() === 4L)
  }

  test("a commit racing into an already-committed version refuses and mutates nothing") {
    val path = tmpDir("vt_race")
    VersionedTable.append((1 to 5).toDF("x"), path)
    VersionedTable.append((6 to 8).toDF("x"), path)
    val before = VersionedTable.readLatest(spark, path).as[Int].collect().sorted
    // simulate the loser of a two-writer race: its attempt computed
    // next = 2, wrote its own (unique) batch dir, and now tries to
    // commit version 2 — the manifest already exists, so the commit
    // must refuse, and the winner's committed bytes are untouched
    // (the loser's dir name is attempt-unique by construction)
    (100 to 101).toDF("x").write.parquet(s"$path/data/b2_loser")
    val e = intercept[java.io.IOException] {
      VersionedTable.commitManifest(path, 2, Seq("b2_loser"))
    }
    assert(e.getMessage.contains("already committed"))
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === before)
    // vacuum reclaims the loser's orphan
    VersionedTable.vacuum(path, keep = 2)
    assert(!new java.io.File(s"$path/data").listFiles().map(_.getName)
      .contains("b2_loser"))
  }

  test("vacuum with a widened keep skips versions an earlier vacuum removed") {
    val path = tmpDir("vt_vacuum_widen")
    (1 to 5).foreach(i => VersionedTable.append(Seq(i).toDF("x"), path))
    VersionedTable.vacuum(path, keep = 1)
    // widening retention later must not abort on the missing manifests
    VersionedTable.vacuum(path, keep = 5)
    assert(VersionedTable.readLatest(spark, path).count() === 5L)
  }

  test("change feed skips compaction batches (dataChange=false); deliveries are exact") {
    val path = tmpDir("vt_changefeed")
    VersionedTable.append((1 to 10).toDF("x"), path)   // v1
    VersionedTable.append((11 to 15).toDF("x"), path)  // v2
    VersionedTable.compact(spark, path)                // v3 (= batch)
    VersionedTable.append((16 to 18).toDF("x"), path)  // v4
    // consumer checkpointed at v2, catching up to v4: ONLY v4's rows —
    // the compaction batch is flagged dataChange=false and skipped
    assert(VersionedTable.readChanges(spark, path, 2, 4).as[Int].collect().sorted
      === (16 to 18).toArray)
    // checkpointed exactly at the compaction: nothing but v4 either
    assert(VersionedTable.readChanges(spark, path, 3, 4).as[Int].collect().sorted
      === (16 to 18).toArray)
    // initial snapshot (from = 0): the full current view, not raw batches
    assert(VersionedTable.readChanges(spark, path, 0, 4).count() === 18L)
  }

  test("checkpointed consumer: at-least-once on crash, no redelivery after success") {
    val path = tmpDir("vt_consume")
    val ckpt = tmpDir("vt_consume_ckpt")
    VersionedTable.append((1 to 10).toDF("x"), path)
    // first delivery: the initial snapshot
    var delivered = Seq.empty[Int]
    val d1 = VersionedTable.consumeChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 0L && to === 1L)
      delivered = df.as[Int].collect().toSeq.sorted
    }
    assert(d1 === Some((0L, 1L)) && delivered === (1 to 10))
    // nothing new: no delivery, checkpoint untouched
    assert(VersionedTable.consumeChanges(spark, path, ckpt)((_, _, _) =>
      fail("delivered with nothing new")) === None)
    // publisher moves on: compact + append
    VersionedTable.compact(spark, path)
    VersionedTable.append((11 to 12).toDF("x"), path)
    // a crashing consumer does NOT advance the checkpoint ...
    intercept[RuntimeException] {
      VersionedTable.consumeChanges(spark, path, ckpt)((_, _, _) =>
        throw new RuntimeException("sink crashed"))
    }
    // ... so the next attempt re-delivers the SAME range (at-least-once),
    // and the compaction batch is never part of it
    val d2 = VersionedTable.consumeChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 1L && to === 3L)
      delivered = df.as[Int].collect().toSeq.sorted
    }
    assert(d2 === Some((1L, 3L)) && delivered === Seq(11, 12))
    assert(VersionedTable.consumeChanges(spark, path, ckpt)((_, _, _) =>
      fail("redelivered after success")) === None)
  }

  test("optimistic append: a version conflict retries the commit only, no data rewrite") {
    val path = tmpDir("vt_retry")
    VersionedTable.append((1 to 5).toDF("x"), path)
    // deterministic race: a competing writer commits version 2 right
    // before OUR first commit attempt — the test seam injects it
    var injected = false
    val v = VersionedTable.appendRetrying((6 to 8).toDF("x"), path,
      txnId = None, statsCols = Nil, maxRetries = 5, beforeCommit = { _ =>
        if (!injected) {
          injected = true
          VersionedTable.append(Seq(100).toDF("x"), path)
        }
      })
    // the retry landed AFTER the competing commit; nothing was lost
    assert(v === 3L)
    assert(VersionedTable.readLatest(spark, path).as[Int].collect().sorted
      === ((1 to 8) :+ 100).sorted.toArray)
    // exactly one batch dir was written for the retried append: the
    // conflict re-committed the manifest, it did not rewrite data
    val dirs = new java.io.File(s"$path/data").listFiles().map(_.getName)
    assert(dirs.length === 3, s"unexpected batch dirs: ${dirs.toSeq}")
    // with retries exhausted, the conflict surfaces loudly
    val e = intercept[java.io.IOException] {
      VersionedTable.appendRetrying(Seq(9).toDF("x"), path,
        txnId = None, statsCols = Nil, maxRetries = 0, beforeCommit = { _ =>
          if (VersionedTable.latestVersion(path).contains(3L))
            VersionedTable.append(Seq(101).toDF("x"), path)
        })
    }
    assert(e.getMessage.contains("already committed"))
  }

  test("manifest stats + readAtPruned: non-matching batches are never opened") {
    val path = tmpDir("vt_stats")
    VersionedTable.append(Seq((1L, "a"), (10L, "b")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    VersionedTable.append(Seq((20L, "c"), (30L, "d")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    VersionedTable.append(Seq((40L, "e")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    // range [15, 35] intersects only batch 2
    val pruned = VersionedTable.readAtPruned(spark, path, 3, "k", 15L, 35L)
    assert(pruned.as[(Long, String)].collect().sorted
      === Array((20L, "c"), (30L, "d")))
    // the pruned plan opens ONLY the matching batch dir — skipping
    // happened at the manifest, before any file was touched
    val touched = pruned.inputFiles.toSeq
    assert(touched.nonEmpty && touched.forall(_.contains("/data/b2_")),
      s"pruned read touched non-matching batches: $touched")
    // a range matching nothing: empty result, correct schema
    val none = VersionedTable.readAtPruned(spark, path, 3, "k", 500L, 600L)
    assert(none.count() === 0L && none.columns.toSeq === Seq("k", "v"))
    // stats survive later commits (entries copied forward) and
    // tombstones still apply on the pruned read
    VersionedTable.deleteKeys(Seq(30L).toDF("k"), "k", path)
    val afterDelete = VersionedTable.readAtPruned(spark, path, 4, "k", 15L, 35L)
    assert(afterDelete.as[(Long, String)].collect().toSeq === Seq((20L, "c")))
    // a batch WITHOUT stats is never pruned (no stats = no claim)
    VersionedTable.append(Seq((1000L, "z")).toDF("k", "v"), path)
    val withUnstated = VersionedTable.readAtPruned(spark, path, 5, "k", 15L, 35L)
    assert(withUnstated.as[(Long, String)].collect().sorted
      === Array((20L, "c"), (1000L, "z")),
      "a stats-less batch must survive pruning for the caller's filter")
  }

  test("compactByRange: content identical, tight per-bucket stats, skipping restored after churn") {
    val path = tmpDir("vt_cluster")
    // arrival-order churn: each append spans the FULL key range, so
    // per-batch stats (if any) would be useless for range queries
    VersionedTable.append(Seq((1L, "a"), (50L, "b"), (99L, "c")).toDF("k", "v"), path)
    VersionedTable.append(Seq((10L, "d"), (60L, "e"), (90L, "f")).toDF("k", "v"), path)
    VersionedTable.append(Seq((5L, "g"), (55L, "h"), (95L, "i")).toDF("k", "v"), path)
    val before = VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().sorted.toSeq

    val v4 = VersionedTable.compactByRange(spark, path, "k", nBuckets = 3)
    assert(v4 === 4L)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().sorted.toSeq === before,
      "clustering compaction changed the table content")
    // a narrow range query now opens a strict subset of bucket dirs
    val pruned = VersionedTable.readAtPruned(spark, path, v4, "k", 50L, 60L)
    assert(pruned.filter(col("k").between(50L, 60L))
      .as[(Long, String)].collect().sorted.toSeq
      === before.filter(t => t._1 >= 50L && t._1 <= 60L))
    val touched = pruned.inputFiles.toSeq.flatMap(
      _.split("/").find(_.startsWith("__rb="))).distinct
    val all = VersionedTable.readAt(spark, path, v4).inputFiles.toSeq
      .flatMap(_.split("/").find(_.startsWith("__rb="))).distinct
    assert(all.size === 3 && touched.size < all.size,
      s"clustering did not restore skipping: touched $touched of $all")
    // dataChange=false: a consumer checkpointed before the clustering
    // is re-delivered nothing
    assert(VersionedTable.readChanges(spark, path, 3, v4).count() === 0L)
    // vacuum keeps the (nested) clustered layout intact
    VersionedTable.vacuum(path, keep = 1)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().sorted.toSeq === before)
  }

  test("change data feed: inserts and full deleted rows tagged; upsert = preimage/postimage") {
    val path = tmpDir("vt_cdf")
    VersionedTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), path) // v1
    VersionedTable.append(Seq((4L, "d")).toDF("k", "v"), path)                        // v2
    VersionedTable.deleteKeys(Seq(2L, 4L).toDF("k"), "k", path)                       // v3
    VersionedTable.compact(spark, path)                                               // v4
    VersionedTable.upsert(Seq((3L, "C"), (9L, "z")).toDF("k", "v"), "k", path)        // v5

    def feed(from: Long, to: Long): Seq[(Long, String, String)] =
      VersionedTable.readChangeFeed(spark, path, from, to)
        .select(col("k"), col("v"), col("_change_type"))
        .as[(Long, String, String)].collect().sorted.toSeq

    // v1 -> v3: insert of v2's row, deletes of the FULL rows (2,"b")
    // from pre-range v1 and (4,"d") from in-range v2 — both tagged
    assert(feed(1, 3) === Seq((2L, "b", "delete"), (4L, "d", "delete"),
      (4L, "d", "insert")))
    // across the compaction: nothing re-delivered (dataChange=false)
    assert(feed(3, 4) === Seq.empty[(Long, String, String)])
    // the upsert delivers the replaced row as delete + new rows as insert
    assert(feed(4, 5) === Seq((3L, "C", "insert"), (3L, "c", "delete"),
      (9L, "z", "insert")))
    // initial snapshot: the current view, all insert
    assert(feed(0, 5).count(_._3 == "insert") === 3 &&
      feed(0, 5).forall(_._3 == "insert"))
    // applying the v1->v5 feed to the v1 view reproduces readAt(v5):
    // the exactness an incremental materializer depends on
    val v1 = VersionedTable.readAt(spark, path, 1)
      .as[(Long, String)].collect().toSet
    val f = feed(1, 5)
    val applied = (v1 ++ f.filter(_._3 == "insert").map(t => (t._1, t._2)))
      .diff(f.filter(_._3 == "delete").map(t => (t._1, t._2)).toSet)
    assert(applied === VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().toSet)
  }

  test("vacuum drops expired versions and crash orphans, keeps referenced batches byte-identical") {
    val path = tmpDir("vt_vacuum")
    VersionedTable.append((1 to 4).toDF("x"), path)
    VersionedTable.append((5 to 6).toDF("x"), path)
    VersionedTable.append((7 to 9).toDF("x"), path)
    // crash orphan: a batch dir that no manifest references
    (100 to 101).toDF("x").write.parquet(s"$path/data/b99_orphan")
    val fsDir = new java.io.File(s"$path/data")
    val b3 = fsDir.listFiles().map(_.getName).find(_.startsWith("b3_")).get
    val before = new java.io.File(s"$path/data/$b3").listFiles().map(f =>
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
    val after = new java.io.File(s"$path/data/$b3").listFiles().map(f =>
      f.getName -> f.length()).toMap
    assert(after === before, "a referenced batch dir was touched by vacuum")
  }

  test("OCC upsert, last-writer-wins: a blind retry is serializable as them-then-us") {
    val path = tmpDir("vt_occ_upsert")
    VersionedTable.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), path)
    var injected = false
    val v = VersionedTable.upsertRetrying(
      Seq((2L, 200L), (3L, 300L)).toDF("k", "v"), Seq("k"), path,
      txnId = None, insertOnly = false, bloomCols = Nil, maxRetries = 5,
      beforeCommit = { _ =>
        if (!injected) {
          injected = true
          // the competitor also writes key 2 AND an unrelated key
          VersionedTable.append(Seq((2L, -2L), (7L, 70L)).toDF("k", "v"), path)
        }
      })
    assert(v === 3L)
    val rows = VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().toMap
    // serial order "them, then us": our tombstone position-scopes
    // over the interleaved batch, so OUR value wins for key 2; the
    // competitor's unrelated key survives untouched
    assert(rows === Map(1L -> 10L, 2L -> 200L, 3L -> 300L, 7L -> 70L))
  }

  test("OCC insert-if-absent: a conflicting interleaved insert forces the batch rewrite") {
    val path = tmpDir("vt_occ_insonly")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path,
      bloomCols = Seq("k"))
    var injected = false
    val v = VersionedTable.upsertRetrying(
      Seq((1L, -1L), (5L, 50L), (6L, 60L)).toDF("k", "v"), Seq("k"), path,
      txnId = None, insertOnly = true, bloomCols = Seq("k"), maxRetries = 5,
      beforeCommit = { _ =>
        if (!injected) {
          injected = true
          // the competitor inserts key 5 first
          VersionedTable.append(Seq((5L, -5L)).toDF("k", "v"), path,
            bloomCols = Seq("k"))
        }
      })
    assert(v === 3L)
    val rows = VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().toMap
    // no duplicate key 5: the retry anti-joined the pending batch
    // against the interleaved commit, so the competitor's row wins
    // (serial them-then-us); key 1 was dropped at the snapshot
    // anti-join; key 6 is genuinely new and inserts
    assert(rows === Map(1L -> 10L, 5L -> -5L, 6L -> 60L))
    assert(VersionedTable.readLatest(spark, path).count() === 3L)
  }

  test("OCC insert-if-absent: a NON-conflicting interleave commits without a rewrite") {
    val path = tmpDir("vt_occ_noconf")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path,
      bloomCols = Seq("k"))
    var injected = false
    val v = VersionedTable.upsertRetrying(
      Seq((8L, 80L)).toDF("k", "v"), Seq("k"), path,
      txnId = None, insertOnly = true, bloomCols = Seq("k"), maxRetries = 5,
      beforeCommit = { _ =>
        if (!injected) {
          injected = true
          VersionedTable.append(Seq((9L, 90L)).toDF("k", "v"), path,
            bloomCols = Seq("k"))
        }
      })
    assert(v === 3L)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 10L, 8L -> 80L, 9L -> 90L))
    // the Bloom probe proved no key overlap, so the pending batch
    // committed AS WRITTEN: exactly three data dirs on disk (no
    // rewrite orphan)
    val dirs = new java.io.File(s"$path/data").listFiles().map(_.getName)
    assert(dirs.length === 3, s"unexpected rewrite orphan: ${dirs.toSeq}")
  }

  test("streamChanges: the cadence-driven consumer delivers contiguous ranges without polling") {
    val path = tmpDir("vt_stream_changes")
    val ckpt = tmpDir("vt_stream_changes_ckpt")
    VersionedTable.append((1 to 10).toDF("x"), path)
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q = VersionedTable.streamChanges(spark, path, ckpt, "1 second") {
      (df, from, to) => delivered.add((from, to, df.count()))
    }
    try {
      def awaitTotal(n: Long): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (delivered.toArray.map(_.asInstanceOf[(Long, Long, Long)]._3).sum < n
            && System.nanoTime() < deadline) Thread.sleep(100)
      }
      awaitTotal(10)
      VersionedTable.append((11 to 15).toDF("x"), path)
      awaitTotal(15)
      VersionedTable.append((16 to 17).toDF("x"), path)
      awaitTotal(17)
      val ds = delivered.toArray.map(_.asInstanceOf[(Long, Long, Long)]).toSeq
      assert(ds.map(_._3).sum === 17L, s"deliveries: $ds")
      // ranges are contiguous and non-overlapping: each delivery
      // starts where the previous checkpoint ended
      ds.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 === b._1, s"gap between $a and $b")
        case _ => ()
      }
      assert(ds.head._1 === 0L, "the first delivery is the initial snapshot")
    } finally q.stop()
  }
}
