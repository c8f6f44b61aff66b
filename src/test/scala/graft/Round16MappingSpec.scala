package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.catalog.{ColumnMapping, GraftTableMeta}

/** Round-16 verdict items #1–#3 at the spec grain:
  *
  *  - the PROTOCOL/FEATURE GATE: manifests of column-mapped tables
  *    declare `#protocol=column-mapping`, and a manifest declaring a
  *    feature this reader does not implement refuses LOUDLY naming it
  *    — never wrong rows under an unknown contract;
  *  - MAPPING-AWARE PATH READS: raw `readAt` over a renamed+dropped
  *    table speaks the epoch's logical names and can never leak a
  *    `__dropped` column's stale parquet values;
  *  - WRITE-SIDE translation: path-API writes under logical names
  *    land under the stored physical names; a stale writer still
  *    carrying a retired column refuses;
  *  - STREAMING-BY-NAME over a mapped table (the lifted q318
  *    refusal), with the mid-flight-DDL refusal leg kept;
  *  - MANIFEST-RECORDED COMMIT TIMESTAMPS with the mtime fallback
  *    for legacy (pre-header) manifests.
  */
class Round16MappingSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$t"); ()
  }

  private def manifestText(path: String, v: Long): String = {
    val src = scala.io.Source.fromFile(s"$path/_v$v.manifest")
    try src.mkString finally src.close()
  }

  test("manifests of a mapped table carry the protocol gate; an unknown feature refuses loudly") {
    drop("r16_gate")
    spark.sql("""CREATE TABLE graft.r16_gate (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r16_gate VALUES (1, 10), (2, 20)")
    val path = s"$root/r16_gate"
    // pre-mapping commit: no gate
    assert(!manifestText(path, 1).contains("#protocol="))
    spark.sql("ALTER TABLE graft.r16_gate RENAME COLUMN v TO amount")
    // the DDL fence itself carries the gate (it is the first manifest
    // that could expose the mapping to a feature-unaware reader) ...
    assert(manifestText(path, 2).contains("#protocol=column-mapping"))
    // ... and every commit after activation re-declares it
    spark.sql("INSERT INTO graft.r16_gate VALUES (3, 30)")
    assert(manifestText(path, 3).contains("#protocol=column-mapping"))
    // a manifest declaring a feature THIS reader does not implement
    // refuses loudly, naming the feature — hand-forge one
    val forged = manifestText(path, 3)
      .replace("#protocol=column-mapping",
        "#protocol=column-mapping,deletion-vectors-v9")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_v4.manifest"), forged)
    val e = intercept[java.io.IOException] {
      VersionedTable.readAt(spark, path, 4L).collect()
    }
    assert(e.getMessage.contains("deletion-vectors-v9"))
    assert(e.getMessage.contains("does not support"))
    // the poisoned manifest gates EVERY reader of that version,
    // including latest-version resolution through it
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/_v4.manifest"))
  }

  test("path readAt speaks the epoch's logical names and never leaks __dropped data") {
    drop("r16_path")
    spark.sql("""CREATE TABLE graft.r16_path (k BIGINT, v BIGINT, junk BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r16_path VALUES (1, 10, 77), (2, 20, 88)")
    spark.sql("ALTER TABLE graft.r16_path RENAME COLUMN v TO amount")
    spark.sql("ALTER TABLE graft.r16_path DROP COLUMN junk")
    val path = s"$root/r16_path"
    val latest = VersionedTable.latestVersion(path).get
    // current epoch: logical names, retired column GONE (its stale
    // parquet values are still in the footers — they must not leak)
    val cur = VersionedTable.readAt(spark, path, latest)
    assert(cur.columns.toSeq === Seq("k", "amount"))
    assert(cur.orderBy("k").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L)))
    // pre-DDL epoch through the SAME path API: old names, old width
    val old = VersionedTable.readAt(spark, path, 1L)
    assert(old.columns.toSeq === Seq("k", "v", "junk"))
    assert(old.orderBy("k").as[(Long, Long, Long)].collect().toSeq ===
      Seq((1L, 10L, 77L), (2L, 20L, 88L)))
    // the storage view is still reachable for physical tooling
    assert(VersionedTable.readAtPhysical(spark, path, latest)
      .columns.toSeq === Seq("k", "v", "junk"))
  }

  test("path writes under logical names land physically; a stale writer of a retired column refuses") {
    drop("r16_write")
    spark.sql("""CREATE TABLE graft.r16_write (k BIGINT, v BIGINT, junk BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r16_write VALUES (1, 10, 5), (2, 20, 6)")
    spark.sql("ALTER TABLE graft.r16_write RENAME COLUMN v TO amount")
    spark.sql("ALTER TABLE graft.r16_write DROP COLUMN junk")
    val path = s"$root/r16_write"
    // a path-API upsert speaking the CURRENT logical names: replaces
    // k=2, inserts k=3 — and the catalog reads it back coherently
    VersionedTable.upsertWithRetry(
      Seq((2L, 21L), (3L, 30L)).toDF("k", "amount"), "k", path)
    assert(spark.table("graft.r16_write").orderBy("k")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 21L), (3L, 30L)))
    // the committed batch stores the PHYSICAL name (v), not "amount"
    val latest = VersionedTable.latestVersion(path).get
    assert(VersionedTable.readAtWidenedPhysical(spark, path, latest)
      .columns.contains("v"))
    // path delete under the logical key name
    VersionedTable.deleteKeys(Seq(1L).toDF("k"), "k", path)
    assert(spark.table("graft.r16_write").orderBy("k")
      .as[(Long, Long)].collect().toSeq === Seq((2L, 21L), (3L, 30L)))
    // a STALE writer still carrying the retired column refuses loudly
    val e = intercept[IllegalStateException] {
      VersionedTable.append(
        Seq((9L, 90L, 99L)).toDF("k", "amount", "junk"), path)
    }
    assert(e.getMessage.contains("junk"))
    assert(e.getMessage.contains("DROPPED"))
  }

  test("streaming by name over a mapped table works; mid-flight rename continues, shape change refuses") {
    import org.apache.spark.sql.streaming.Trigger
    drop("r16_stream")
    spark.sql("""CREATE TABLE graft.r16_stream (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r16_stream VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft.r16_stream RENAME COLUMN v TO amount")
    spark.sql("INSERT INTO graft.r16_stream VALUES (3, 30)")
    val ckpt = tmpDir("r16-stream-ckpt")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // by-name stream over the RENAMED table: rows arrive under the
    // CURRENT logical names (previously a loud refusal at v1Table)
    val q = spark.readStream.table("graft.r16_stream")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.select("k", "amount").as[(Long, Long)].collect(); ()
      }.start()
    q.awaitTermination(60000)
    assert(got.sorted.toSeq === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // mid-flight RENAME-ONLY DDL (round 17): an alias-only change
    // landing while a RUNNING stream is between batches CONTINUES —
    // the physical column set, types, and retired set are unchanged,
    // so the data is bit-identical; Spark pins the declared schema,
    // so rows keep arriving under the START-TIME names, and a
    // restart adopts the new ones. Rate-limit to one version per
    // batch so the DDL (fired from the first batch) is provably
    // mid-flight for the second
    spark.sql("ALTER TABLE graft.r16_stream RENAME COLUMN amount TO total")
    spark.sql("INSERT INTO graft.r16_stream VALUES (4, 40)")
    val path = s"$root/r16_stream"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q2 = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.option("checkpointLocation", tmpDir("r16-mid-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= df.select("k", "total").as[(Long, Long)].collect()
        if (fired.compareAndSet(false, true)) {
          // rename lands while THIS query is mid-flight — the next
          // batch still arrives (under the frozen start-time name)
          spark.sql(
            "ALTER TABLE graft.r16_stream RENAME COLUMN total TO grand")
          spark.sql("INSERT INTO graft.r16_stream VALUES (5, 50)")
        }
        ()
      }.start()
    q2.awaitTermination(120000)
    // versions 2..5 were delivered AFTER the rename landed —
    // continuation proven; the mid-flight INSERT (5) lies beyond the
    // AvailableNow target frozen at start and arrives on the restart
    // below (which also adopts the new name)
    assert(got2.sorted.toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)),
      "a rename-only mid-flight DDL must not interrupt delivery")
    // and after an honest restart the stream delivers under the
    // NEWEST names again
    val ckpt3 = tmpDir("r16-stream-ckpt3")
    val got3 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q3 = spark.readStream.table("graft.r16_stream")
      .writeStream.option("checkpointLocation", ckpt3)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got3 ++= df.select("k", "grand").as[(Long, Long)].collect(); ()
      }.start()
    q3.awaitTermination(60000)
    assert(got3.sorted.toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)))
    // mid-flight SHAPE change (ADD COLUMN): still refuses loudly
    // naming the restart contract (rename-only continues; a shape
    // change cannot)
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stale = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2b = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", tmpDir("r16-mid-ckpt2"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.count()
          if (fired2.compareAndSet(false, true)) {
            spark.sql(
              "ALTER TABLE graft.r16_stream ADD COLUMNS (extra BIGINT)")
            spark.sql("INSERT INTO graft.r16_stream VALUES (6, 60, 66)")
          }
          ()
        }.start()
      q2b.awaitTermination(120000)
      ()
    }
    def msgChain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgChain(stale).contains("RESTART"))
  }

  test("commit timestamps ride the manifest; legacy manifests fall back to mtime") {
    val path = tmpDir("r16-ts") + "/t"
    VersionedTable.append(Seq((1L, 1L)).toDF("k", "v"), path)
    VersionedTable.append(Seq((2L, 2L)).toDF("k", "v"), path)
    val ts1 = VersionedTable.commitTimeMillis(path, 1L).get
    val ts2 = VersionedTable.commitTimeMillis(path, 2L).get
    assert(ts1 <= ts2)
    // the simulated copy: clobber mtimes — resolution still exact
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1L, 2L).foreach(v =>
      f.setTimes(new org.apache.hadoop.fs.Path(s"$path/_v$v.manifest"),
        1000L, 1000L))
    assert(VersionedTable.versionAtTime(path, ts1 * 1000L) === Some(1L))
    assert(VersionedTable.versionAtTime(path, ts2 * 1000L) === Some(2L))
    assert(VersionedTable.versionAtTime(path, ts1 * 1000L - 1000L).isEmpty)
    // LEGACY manifest (pre-header): strip the #ts line — resolution
    // falls back to the file mtime, the old clock
    val v1 = manifestText(path, 1L).split("\n")
      .filterNot(_.startsWith("#ts=")).mkString("\n")
    // rewrite through the Hadoop FS so the local checksum follows
    val out = f.create(new org.apache.hadoop.fs.Path(s"$path/_v1.manifest"),
      true)
    try out.write(v1.getBytes("UTF-8")) finally out.close()
    f.setTimes(new org.apache.hadoop.fs.Path(s"$path/_v1.manifest"),
      5000L, 5000L)
    assert(VersionedTable.commitTimeMillis(path, 1L).isEmpty)
    // the commit-clock memo (round 19) relies on manifest
    // immutability, so the in-place strip above is observable only
    // the way a legacy table actually arrives: by copy/restore, at a
    // path this JVM has never memoized
    val path2 = tmpDir("r16-ts-copy") + "/t"
    org.apache.hadoop.fs.FileUtil.copy(f, p, f,
      new org.apache.hadoop.fs.Path(path2), false,
      spark.sparkContext.hadoopConfiguration)
    f.setTimes(new org.apache.hadoop.fs.Path(s"$path2/_v1.manifest"),
      5000L, 5000L)
    assert(VersionedTable.versionAtTime(path2, 5000L * 1000L) === Some(1L))
    // DESCRIBE HISTORY surfaces the recorded clock (null for legacy)
    val hist = VersionedTable.history(spark, path)
      .select("version", "ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(hist(1L).isEmpty) // legacy manifest: no recorded ts
    assert(hist(2L) === Some(ts2))
  }

  test("vacuum bounds metadata generations; epoch reads at retained versions unchanged") {
    drop("r16_metavac")
    spark.sql("""CREATE TABLE graft.r16_metavac (k BIGINT, c0 BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.r16_metavac VALUES (1, 10)")
    // a LONG DDL history: 6 renames, each fencing a data version and
    // publishing a new metadata generation
    (1 to 6).foreach { i =>
      val from = if (i == 1) "c0" else s"c${i - 1}"
      spark.sql(
        s"ALTER TABLE graft.r16_metavac RENAME COLUMN $from TO c$i")
      spark.sql(s"INSERT INTO graft.r16_metavac VALUES (${i + 1}, ${i}0)")
    }
    val path = s"$root/r16_metavac"
    val gensBefore = GraftTableMeta.metaGens(path)
    assert(gensBefore.size === 7) // gen0 + 6 renames
    val latest = VersionedTable.latestVersion(path).get
    // retain the last 4 versions; generations governing only vacuumed
    // versions are reclaimed with them
    val floor = latest - 3
    val dry = VersionedTable.vacuumDryRun(spark, path, 4)
      .collect().filter(_.getString(0) == "meta-gen").map(_.getString(1))
    VersionedTable.vacuum(path, 4)
    val gensAfter = GraftTableMeta.metaGens(path)
    assert(gensAfter.size < gensBefore.size)
    assert(dry.toSet ===
      (gensBefore.toSet -- gensAfter.toSet).map(g => s"_meta.$g"))
    // gen0 and the latest generation always survive
    assert(gensAfter.contains(0L) && gensAfter.contains(gensBefore.max))
    // every RETAINED version still reads under its exact epoch names
    (floor to latest).foreach { v =>
      val m = GraftTableMeta.metaForVersion(path, v).get
      val got = VersionedTable.readAt(spark, path, v).columns.toSet
      assert(got === m.schema.map(_.name).toSet,
        s"version $v reads ${got} but epoch says ${m.schema.map(_.name)}")
    }
    // and the current view is untouched
    assert(spark.table("graft.r16_metavac").columns.toSeq ===
      Seq("k", "c6"))
  }

  test("lookupKeys prunes and answers under logical names on a mapped table") {
    drop("r16_lookup")
    spark.sql("""CREATE TABLE graft.r16_lookup (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'bloomcols'='k')""")
    spark.sql("INSERT INTO graft.r16_lookup VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO graft.r16_lookup VALUES (100, 1000), (200, 2000)")
    spark.sql("ALTER TABLE graft.r16_lookup RENAME COLUMN v TO amount")
    spark.sql("ALTER TABLE graft.r16_lookup RENAME COLUMN k TO id")
    val path = s"$root/r16_lookup"
    val latest = VersionedTable.latestVersion(path).get
    val hit = VersionedTable.lookupKeys(spark, path, latest, "id", Seq(100L))
    assert(hit.columns.toSeq === Seq("id", "amount"))
    assert(hit.as[(Long, Long)].collect().toSeq === Seq((100L, 1000L)))
    val multi = VersionedTable.lookupKeysMulti(spark, path, latest,
      Seq("id"), Seq(2L).toDF("id"))
    assert(multi.as[(Long, Long)].collect().toSeq === Seq((2L, 20L)))
  }
}
