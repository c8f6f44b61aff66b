package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Round-12 hardening of the versioned table, one test per audited
  * hazard:
  *
  *  1. a batch appended after a consumer's checkpoint and folded by a
  *     LATER compaction before the consumer catches up must still be
  *     delivered (readChanges walks per commit, not endpoint diff);
  *  2. countAt / statsRange must be exact over clustered layouts
  *     (`__rb=`/`__zb=` bucket dirs are data, not hidden files);
  *  3. a refused/crashed checkpoint cleanup must never lose the
  *     consumer position (versioned markers, max-on-read);
  *  4. Bloom point-lookup must not false-negative on non-long key
  *     columns (probe keys cast to the batch's native type);
  *  5. insert-only OCC must not suppress an insert of a key the
  *     interleave inserted AND deleted (position-scoped theirKeys).
  */
class VersionedAdviceFixSpec extends SparkTestBase {
  import spark.implicits._

  test("readChanges delivers a batch folded away by a later in-range compaction") {
    val path = tmpDir("vt_fold")
    VersionedTable.append((1 to 10).toDF("x"), path)   // v1 — checkpoint here
    VersionedTable.append((11 to 15).toDF("x"), path)  // v2 — the at-risk batch
    VersionedTable.compact(spark, path)                // v3 — folds v2 away
    // endpoint set-difference would see only the '=' entry and return
    // EMPTY; the per-commit walk finds v2's batch
    assert(VersionedTable.readChanges(spark, path, 1, 3).as[Int].collect().sorted
      === (11 to 15).toArray)
    // and nothing is double-delivered: from the compaction on, empty
    assert(VersionedTable.readChanges(spark, path, 3, 3).count() === 0L)
  }

  test("consumeChanges: append-then-compact inside one consumer interval loses nothing") {
    val path = tmpDir("vt_fold_consume")
    val ckpt = tmpDir("vt_fold_consume_ckpt")
    VersionedTable.append((1 to 10).toDF("x"), path)
    // consumer seeds its snapshot and checkpoints at v1
    var delivered = Seq.empty[Int]
    VersionedTable.consumeChanges(spark, path, ckpt) { (df, _, _) =>
      delivered = df.as[Int].collect().toSeq.sorted
    }
    assert(delivered === (1 to 10))
    // while the consumer sleeps: append, then compact folds the append
    VersionedTable.append((11 to 15).toDF("x"), path)
    VersionedTable.compact(spark, path)
    val d = VersionedTable.consumeChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 1L && to === 3L)
      delivered = df.as[Int].collect().toSeq.sorted
    }
    assert(d === Some((1L, 3L)))
    assert(delivered === (11 to 15), "the folded batch was never delivered")
    // steady state afterwards
    assert(VersionedTable.consumeChanges(spark, path, ckpt)((_, _, _) =>
      fail("redelivered after success")) === None)
  }

  test("countAt and statsRange are exact over clustered (__rb=/__zb=) layouts") {
    val path = tmpDir("vt_meta_clustered")
    val rows = Seq((1L, 5L, "a"), (40L, 10L, "b"), (80L, 2L, "c"),
      (120L, 70L, "d"), (200L, 55L, "e"), (250L, 90L, "f"))
    VersionedTable.append(rows.toDF("k", "w", "v"), path,
      statsCols = Seq("k", "w"))
    val vr = VersionedTable.compactByRange(spark, path, "k", nBuckets = 3)
    // every data file now lives under a __rb=N dir whose name starts
    // with '_': a full-path hidden check would count the table as 0
    assert(VersionedTable.countAt(spark, path, vr) === Some(6L))
    assert(VersionedTable.statsRange(spark, path, vr, "k") === Some((1L, 250L)))
    val vz = VersionedTable.compactByZOrder(spark, path, "k", "w", nBuckets = 2)
    assert(VersionedTable.countAt(spark, path, vz) === Some(6L))
    assert(VersionedTable.statsRange(spark, path, vz, "k") === Some((1L, 250L)))
    assert(VersionedTable.statsRange(spark, path, vz, "w") === Some((2L, 90L)))
    // honesty leg: a column with stats on a LATER append but none on
    // the (non-empty) clustered buckets must refuse — treating a
    // populated bucket as empty would fabricate a too-tight envelope
    VersionedTable.append(Seq((300L, 1L, "g")).toDF("k", "w", "v"), path,
      statsCols = Seq("k"))
    assert(VersionedTable.statsRange(spark, path, vz + 1, "w") === None,
      "non-empty stats-less buckets must force None, not a partial envelope")
    // countAt still exact across the mixed manifest
    assert(VersionedTable.countAt(spark, path, vz + 1) === Some(7L))
  }

  test("a refused checkpoint cleanup never loses or regresses the consumer position") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.faildelete.impl", classOf[FailDeleteFileSystem].getName)
    val path = tmpDir("vt_ckpt_safe")
    val ckptDir = tmpDir("vt_ckpt_safe_ckpt")
    val ckpt = "faildelete://" + ckptDir
    VersionedTable.append((1 to 4).toDF("x"), path)
    VersionedTable.consumeChanges(spark, path, ckpt) { (_, _, _) => () }
    VersionedTable.append((5 to 6).toDF("x"), path)
    // the cleanup delete of _version.1 is refused silently; the
    // delivery must still succeed and the position must advance
    val d = VersionedTable.consumeChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 1L && to === 2L)
      assert(df.as[Int].collect().sorted === Array(5, 6))
    }
    assert(d === Some((1L, 2L)))
    // both markers are on disk (the crash-between-steps state) ...
    val names = new java.io.File(ckptDir).listFiles().map(_.getName).toSet
    assert(names.contains("_version.1") && names.contains("_version.2"),
      s"expected both markers, got $names")
    // ... and max-on-read ignores the stale one: no re-delivery
    assert(VersionedTable.consumeChanges(spark, path, ckpt)((_, _, _) =>
      fail("position regressed to the stale marker")) === None)
  }

  test("a legacy _version content file is honored and upgraded") {
    val path = tmpDir("vt_ckpt_legacy")
    val ckpt = tmpDir("vt_ckpt_legacy_ckpt")
    VersionedTable.append((1 to 3).toDF("x"), path)
    VersionedTable.append((4 to 5).toDF("x"), path)
    // pre-upgrade checkpoint: a content file saying "1"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ckpt, "_version"), "1".getBytes("UTF-8"))
    val d = VersionedTable.consumeChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 1L && to === 2L)
      assert(df.as[Int].collect().sorted === Array(4, 5))
    }
    assert(d === Some((1L, 2L)))
    val names = new java.io.File(ckpt).listFiles().map(_.getName).toSet
    assert(names.contains("_version.2") && !names.contains("_version"),
      s"legacy file should be upgraded away, got $names")
  }

  test("Bloom point lookup has no false negatives on an int-typed key column") {
    val path = tmpDir("vt_bloom_int")
    // IntegerType keys: the sidecar bits hash the native int column
    VersionedTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path,
      bloomCols = Seq("k"))
    VersionedTable.append(Seq((7, "c"), (9, "d")).toDF("k", "v"), path,
      bloomCols = Seq("k"))
    // a long-typed probe hashed as long would miss every lane and
    // prune both batches as 'definite' negatives
    val hit = VersionedTable.lookupKeys(spark, path, 2L, "k", Seq(2L, 9L))
      .as[(Int, String)].collect().sorted
    assert(hit === Array((2, "b"), (9, "d")),
      "int-keyed rows were dropped by a mistyped Bloom probe")
    // the exactness contract vs the plain filtered read
    val plain = VersionedTable.readAt(spark, path, 2L)
      .filter(col("k").isin(2L, 9L)).as[(Int, String)].collect().sorted
    assert(hit === plain)
    // a sidecar built for ANOTHER column makes no claim for this one
    val path2 = tmpDir("vt_bloom_other")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "w"), path2,
      bloomCols = Seq("w"))
    assert(VersionedTable.lookupKeys(spark, path2, 1L, "k", Seq(1L))
      .count() === 1L,
      "a k-less sidecar must not claim absence of k")
  }

  test("insert-only OCC: a key the interleave inserted AND deleted does not suppress our insert") {
    val path = tmpDir("vt_occ_insdel")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path,
      bloomCols = Seq("k"))
    var injected = false
    val v = VersionedTable.upsertRetrying(
      Seq((5L, 50L), (6L, 60L)).toDF("k", "v"), Seq("k"), path,
      txnId = None, insertOnly = true, bloomCols = Seq("k"), maxRetries = 5,
      beforeCommit = { _ =>
        if (!injected) {
          injected = true
          // the interleave inserts key 5 ... and deletes it again: at
          // our commit time key 5 does NOT exist, so the serial order
          // "them, then us" admits our insert
          VersionedTable.append(Seq((5L, -5L), (8L, 80L)).toDF("k", "v"),
            path, bloomCols = Seq("k"))
          VersionedTable.deleteKeys(Seq(5L).toDF("k"), "k", path)
        }
      })
    assert(v === 4L)
    val rows = VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 10L, 5L -> 50L, 6L -> 60L, 8L -> 80L),
      "raw-dir theirKeys would have dropped our (5, 50)")
  }
}
