package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with atomic manifest commits — the
  * publish primitive under every "table format": writers never mutate
  * what readers see, a commit is ONE filesystem rename, and history
  * stays queryable until retention removes it.
  *
  * Layout under `path`:
  *   data/b<N>/  — the batch committed by version N, an immutable
  *                 parquet directory written exactly once;
  *   _v<N>.manifest — newline-separated batch-dir names composing
  *                 version N (each version = its predecessor's dirs
  *                 plus its own batch). Written to a temp name and
  *                 RENAMED into place: the rename IS the commit
  *                 point, so a crash anywhere before it leaves the
  *                 previous version fully intact and the orphaned
  *                 batch dir invisible (vacuum reclaims it).
  *
  * Reads: `readAt(version)` opens exactly the dirs that version's
  * manifest lists — time travel is manifest selection, zero data
  * movement. `latestVersion` is a directory listing, not a scan.
  *
  * Retention: `vacuum(keep)` deletes manifests older than the newest
  * `keep` versions and any batch dir no kept manifest references
  * (including crash orphans); every filesystem return value is
  * checked (the signature-store discipline). Time travel to a
  * vacuumed version fails loudly at the manifest check — never a
  * silent partial read.
  *
  * At 100 TB: batches are partitioned parquet writes, manifests stay
  * KB-sized (a name per batch, not per file), and the single-rename
  * commit is exactly the atomicity object stores provide for small
  * control files.
  */
object VersionedTable {

  private def fs(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    // the session's hadoop conf, so test/deployment filesystem
    // registrations (e.g. custom schemes) apply to the control files
    // exactly as they do to the data writes
    (p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration), p)
  }

  private val ManifestRe = "_v(\\d+)\\.manifest".r

  def latestVersion(path: String): Option[Long] = {
    val (f, p) = fs(path)
    if (!f.exists(p)) return None
    val vs = f.listStatus(p).map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toLong
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def manifestLines(path: String, version: Long): Seq[String] = {
    val (f, p) = fs(path)
    val m = new Path(p, s"_v$version.manifest")
    require(f.exists(m),
      s"version $version of $path does not exist (never committed, or vacuumed)")
    val in = f.open(m)
    val text =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r >= 0) { bytes.write(buf, 0, r); r = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8")
      } finally in.close()
    text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** All manifest entries (data and tombstone batches), comments
    * stripped. Data batches are plain dir names; tombstone batches
    * (committed by `deleteKeys`) carry a `~` prefix.
    */
  private def manifestEntries(path: String, version: Long): Seq[String] =
    manifestLines(path, version).filterNot(_.startsWith("#"))

  private def dataDirsOf(entries: Seq[String]): Seq[String] =
    entries.filterNot(_.startsWith("~"))

  private def tombstoneDirsOf(entries: Seq[String]): Seq[String] =
    entries.filter(_.startsWith("~")).map(_.stripPrefix("~"))

  private def manifestDirs(path: String, version: Long): Seq[String] =
    dataDirsOf(manifestEntries(path, version))

  /** The writer transaction id carried by `version`'s manifest, if
    * its commit declared one.
    */
  def committedTxn(path: String, version: Long): Option[String] =
    manifestLines(path, version)
      .find(_.startsWith("#txn=")).map(_.stripPrefix("#txn="))

  /** Append `df` as a new version; returns the committed version
    * number. The batch dir is written first; the manifest rename is
    * the commit point. `txnId` makes the commit IDEMPOTENT for
    * at-least-once writers (a streaming foreachBatch): when the
    * LATEST version already carries the same txn id, the replayed
    * commit is a no-op returning that version — the Delta-style txn
    * guard, so a replayed micro-batch can never double-publish.
    */
  def append(df: DataFrame, path: String,
      txnId: Option[String] = None): Long = {
    val latest = latestVersion(path)
    txnId.foreach { t =>
      latest.foreach { v =>
        if (committedTxn(path, v).contains(t)) return v
      }
    }
    val next = latest.getOrElse(0L) + 1
    val prev =
      if (next == 1) Seq.empty
      else manifestEntries(path, next - 1)
    val batch = s"b$next"
    df.write.mode("overwrite").parquet(s"$path/data/$batch")
    commitManifest(path, next,
      txnId.map(t => s"#txn=$t").toSeq ++ prev :+ batch)
    next
  }

  private def commitManifest(path: String, version: Long,
      lines: Seq[String]): Unit = {
    val (f, p) = fs(path)
    val tmp = new Path(p, s"_v$version.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new Path(p, s"_v$version.manifest")
    if (!f.rename(tmp, fin))
      throw new java.io.IOException(
        s"VersionedTable: commit rename $tmp -> $fin failed; version $version " +
          "is NOT published (previous version remains intact)")
  }

  /** MERGE-ON-READ delete: commit the keys as a tombstone batch — no
    * data file is rewritten; `readAt` anti-joins live rows against
    * the accumulated tombstones. Deletion is itself versioned (time
    * travel BEFORE the delete still sees the rows — spec-proven),
    * and a rewrite-on-delete compaction can fold tombstones in later
    * without changing any reader's view.
    */
  def deleteKeys(keys: DataFrame, keyCol: String, path: String,
      txnId: Option[String] = None): Long = {
    val latest = latestVersion(path)
    require(latest.nonEmpty, s"cannot delete from empty table $path")
    txnId.foreach { t =>
      latest.foreach { v =>
        if (committedTxn(path, v).contains(t)) return v
      }
    }
    val next = latest.get + 1
    val prev = manifestEntries(path, next - 1)
    val batch = s"b$next"
    keys.select(keys(keyCol)).distinct()
      .write.mode("overwrite").parquet(s"$path/data/$batch")
    commitManifest(path, next,
      txnId.map(t => s"#txn=$t").toSeq ++ prev :+ s"~$batch")
    next
  }

  /** Read the table as of `version` — exactly the dirs its manifest
    * lists, minus rows whose key appears in any tombstone batch
    * (merge-on-read). `mergeSchema` unions the batch schemas (schema
    * EVOLUTION across versions: batches written before a column
    * existed read back NULL-filled under the merged schema — the
    * add-a-column migration with zero rewrites).
    */
  def readAt(spark: SparkSession, path: String, version: Long,
      mergeSchema: Boolean = false): DataFrame = {
    val entries = manifestEntries(path, version)
    val dirs = dataDirsOf(entries).map(b => s"$path/data/$b")
    val live = spark.read
      .option("mergeSchema", mergeSchema.toString).parquet(dirs: _*)
    val tombs = tombstoneDirsOf(entries).map(b => s"$path/data/$b")
    if (tombs.isEmpty) live
    else {
      val keys = spark.read.parquet(tombs: _*)
      val keyCol = keys.columns.head
      require(live.columns.contains(keyCol),
        s"tombstone key column $keyCol absent from the data schema")
      live.join(keys.select(keys(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
    }
  }

  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    readAt(spark, path, v)
  }

  /** Compaction (OPTIMIZE): rewrite the CURRENT content — tombstones
    * folded in — as one batch and commit it as a new version whose
    * manifest references only that batch. Readers of the new version
    * stop paying the merge-on-read anti-join and the many-batch scan;
    * prior versions stay time-travelable until vacuum reclaims them.
    * Content-identical by construction (the new batch IS readAt of
    * the old latest), spec-asserted.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"nothing to compact at $path"))
    val next = v + 1
    val batch = s"b$next"
    readAt(spark, path, v)
      .write.mode("overwrite").parquet(s"$path/data/$batch")
    commitManifest(path, next, Seq(batch))
    next
  }

  /** Incremental read: only the batches committed AFTER `fromVersion`
    * up to `toVersion` — the consumer primitive versioning exists
    * for ("give me what's new since my checkpoint"), computed as a
    * manifest set difference over KB-sized control files. A consumer
    * that stores its last-seen version gets exactly-once batch
    * delivery without any log infrastructure.
    */
  def readChanges(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    val to = manifestDirs(path, toVersion).toSet
    val from =
      if (fromVersion == 0) Set.empty[String]
      else manifestDirs(path, fromVersion).toSet
    val fresh = (to -- from).toSeq.sorted.map(b => s"$path/data/$b")
    if (fresh.isEmpty)
      readAt(spark, path, toVersion).limit(0)
    else spark.read.parquet(fresh: _*)
  }

  /** Drop history: keep the newest `keep` versions' manifests, delete
    * older manifests and every batch dir no kept manifest references
    * (including crash-orphaned dirs that were never committed).
    */
  def vacuum(path: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the latest version")
    val (f, p) = fs(path)
    val latest = latestVersion(path).getOrElse(return)
    val keptVersions = (math.max(1L, latest - keep + 1) to latest)
    // data AND tombstone batches: a kept version's delete set is as
    // load-bearing as its rows
    val referenced = keptVersions.flatMap { v =>
      val e = manifestEntries(path, v)
      dataDirsOf(e) ++ tombstoneDirsOf(e)
    }.toSet
    // old manifests first: a reader landing mid-vacuum sees either a
    // kept version (complete) or a missing manifest (loud failure) —
    // never a manifest whose dirs are partially deleted
    f.listStatus(p).map(_.getPath).foreach { mp =>
      mp.getName match {
        case ManifestRe(n) if n.toLong < keptVersions.head =>
          if (!f.delete(mp, false) && f.exists(mp))
            throw new java.io.IOException(
              s"VersionedTable vacuum: delete of manifest $mp failed")
        case _ => ()
      }
    }
    val dataDir = new Path(p, "data")
    if (f.exists(dataDir)) {
      f.listStatus(dataDir).map(_.getPath).foreach { bp =>
        if (!referenced.contains(bp.getName)) {
          if (!f.delete(bp, true) && f.exists(bp))
            throw new java.io.IOException(
              s"VersionedTable vacuum: delete of batch dir $bp failed")
        }
      }
    }
  }
}
