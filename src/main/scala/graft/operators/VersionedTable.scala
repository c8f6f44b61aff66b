package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, explode, lit, pmod, xxhash64}

/** Versioned parquet table with atomic manifest commits — the
  * publish primitive under every "table format": writers never mutate
  * what readers see, a commit is ONE filesystem rename, and history
  * stays queryable until retention removes it.
  *
  * Layout under `path`:
  *   data/<dir>/ — immutable parquet directories, each written
  *                 exactly once by the commit attempt that created it.
  *                 Dir names carry a per-attempt unique token, so two
  *                 concurrent writers racing for the same version can
  *                 NEVER write into each other's directory: the loser
  *                 leaves an orphan (reclaimed by vacuum), the
  *                 winner's committed bytes are untouched.
  *   _v<N>.manifest — newline-separated entries composing version N
  *                 (each version = its predecessor's entries plus its
  *                 own). Entry grammar, in commit order:
  *                   `#txn=<id>`  writer-transaction comment;
  *                   `<dir>`      a data batch;
  *                   `~<dir>`     a tombstone batch (deleted keys) —
  *                                applies ONLY to data batches that
  *                                PRECEDE it in the manifest, so a
  *                                key deleted at version N and
  *                                re-appended at N+1 is visible again
  *                                (Delta/Iceberg merge-on-read
  *                                semantics);
  *                   `=<dir>`     a compaction batch: read as data,
  *                                but flagged dataChange=false so the
  *                                change feed never re-delivers the
  *                                whole table across an OPTIMIZE.
  *
  * Commit protocol: batch dirs first, then the manifest is written to
  * a temp name and RENAMED into place — the rename IS the commit
  * point, so a crash anywhere before it leaves the previous version
  * fully intact and the orphaned dirs invisible. Concurrent commits
  * to the same version: the commit refuses if the target manifest
  * already exists, and the unique dir tokens guarantee the loser
  * never mutated committed data. Atomicity honesty: on HDFS the
  * rename itself refuses an existing destination atomically; on the
  * local filesystem the exists-check narrows but does not close the
  * window (test-grade); on raw S3 there is no atomic rename at all —
  * set [[CommitModeConf]] to `"put-if-absent"` there: the commit
  * becomes one exclusive create (the conditional-PUT
  * `If-None-Match: *` contract, Hadoop s3a's conditional-write
  * mapping) with no check-then-act window at all — spec-proven on a
  * simulated object store where rename mode demonstrably loses a
  * commit and put-if-absent refuses it.
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
  * KB-sized (a name per batch, not per file), and all control-plane
  * work (txn scan, change-feed set difference, vacuum listing) is
  * bounded by the retained version count, never by data volume.
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

  /** Per-attempt unique token for batch dir names — the guarantee
    * that two writers racing for the same version never share a
    * directory.
    */
  private def newToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  def latestVersion(path: String): Option[Long] = {
    val (f, p) = fs(path)
    if (!f.exists(p)) return None
    val vs = f.listStatus(p).map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toLong
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** TIMESTAMP-AS-OF resolution: the newest retained version that
    * COMMITTED at or before `micros` (microseconds since the epoch).
    * The clock is the commit wall-time every manifest records in its
    * own `#ts=` header line — so a table copied or restored between
    * filesystems (mtimes clobbered) keeps its commit history
    * addressable. Manifests written before the header existed fall
    * back to file modification time — the Delta convention, with its
    * honesty caveats (writing host's clock; vacuum removes versions
    * from the addressable range). One directory listing per call;
    * manifest HEADER reads are memoized per path (round 19 — the
    * [[txnCommittedAt]] discipline applied to the commit clock):
    * manifests are immutable, so a (version → `#ts=`) entry never
    * goes stale, and the last-scanned manifest's own stamp is the
    * INCARNATION identity — a table deleted and rebuilt at the same
    * path re-scans instead of serving the old incarnation's clock.
    * Steady state on a high-commit-rate table: the listing plus ONE
    * header read (the identity check) plus one per NEW commit —
    * measured 2.1–4.7 s/call at 10k retained manifests before, the
    * listing (~250 ms) after. Legacy manifests without the header
    * memoize as "no stamp" and fall back to the CURRENT listing's
    * mtime each call, so a restore that clobbers mtimes is never
    * served from cache.
    */
  def versionAtTime(path: String, micros: Long): Option[Long] = {
    val (f, p) = fs(path)
    if (!f.exists(p)) return None
    val listed = f.listStatus(p).flatMap { st =>
      st.getPath.getName match {
        case ManifestRe(n) => Some((n.toLong, st.getModificationTime))
        case _ => None
      }
    }
    if (listed.isEmpty) { clockMemo.remove(path); return None }
    val maxV = listed.map(_._1).max
    val (scannedTo, scannedTs, known) = Option(clockMemo.get(path))
      .getOrElse((-1L, None: Option[Long], Map.empty[Long, Option[Long]]))
    val incremental = scannedTo >= 0 &&
      listed.exists(_._1 == scannedTo) &&
      commitTimeMillis(path, scannedTo) == scannedTs
    val clock: Map[Long, Option[Long]] =
      if (incremental && maxV <= scannedTo) known
      else {
        val base = if (incremental) known else Map.empty[Long, Option[Long]]
        val floor = if (incremental) scannedTo else -1L
        // a TRANSIENT read failure must not memoize as "no stamp" —
        // that would pin the version to the mtime fallback for the
        // JVM's life; failed reads stay out of the map (the per-call
        // fallback below re-reads them), and the memo only advances
        // when every fresh header read succeeded
        var failed = false
        val m = base ++ listed.collect {
          case (v, _) if v > floor => v
        }.flatMap { v =>
          try Some(v -> commitTimeMillisUnsafe(path, v))
          catch {
            case scala.util.control.NonFatal(_) => failed = true; None
          }
        }
        if (!failed)
          clockMemo.put(path, (maxV, m.getOrElse(maxV, None), m))
        m
      }
    val eligible = listed.flatMap { case (v, mtime) =>
      val millis = clock.get(v) match {
        case Some(stamp) => stamp.getOrElse(mtime)
        // listed but below the incremental floor and absent from the
        // memo (a version gap backfilled out of band): read directly
        case None => commitTimeMillis(path, v).getOrElse(mtime)
      }
      if (millis * 1000L <= micros) Some(v) else None
    }
    if (eligible.isEmpty) None else Some(eligible.max)
  }

  /** Per-path memo of (version → manifest `#ts=` stamp) plus the
    * highest version scanned and ITS stamp (the incarnation pin) —
    * see [[versionAtTime]]. KB-grain per path per JVM, like
    * [[txnMemo]].
    */
  private val clockMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (Long, Option[Long], Map[Long, Option[Long]])]()

  /** The commit wall-time (epoch millis) recorded in `version`'s
    * manifest header (`#ts=`); None for manifests written before the
    * header existed — callers fall back to file mtime (the legacy
    * clock). Raw read: torn/protocol checks don't gate a clock probe.
    */
  def commitTimeMillis(path: String, version: Long): Option[Long] =
    try commitTimeMillisUnsafe(path, version)
    catch { case scala.util.control.NonFatal(_) => None }

  /** [[commitTimeMillis]] that PROPAGATES read failures — the memo
    * scan in [[versionAtTime]] must distinguish "no stamp" (cacheable
    * forever) from "could not read" (must not cache).
    */
  private def commitTimeMillisUnsafe(path: String,
      version: Long): Option[Long] =
    rawManifestLines(path, version).find(_.startsWith("#ts="))
      .flatMap(l => scala.util.Try(l.stripPrefix("#ts=").toLong).toOption)

  private def committedVersions(path: String): Seq[Long] = {
    val (f, p) = fs(path)
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toLong
    }.toSeq.sorted
  }

  /** Terminator comment every commit writes as its manifest's last
    * line, making a TORN manifest (a create that became visible
    * before its bytes finished landing — the put-if-absent hazard on
    * create-visible filesystems like HDFS and local) DETECTABLE: a
    * reader that observes the file mid-write sees content without the
    * terminator and fails loudly instead of treating a prefix of the
    * entry list as a committed version.
    */
  private[graft] val Terminator = "#eof"

  /** First manifest line of every put-if-absent commit — the mode
    * the manifest was WRITTEN under, recorded in the manifest itself
    * so torn-commit detection never keys off the reader session's
    * conf: only manifests declaring this marker require the
    * [[Terminator]]; marker-less non-empty manifests are legacy
    * rename commits (published in full before the rename) and read
    * under any session mode.
    */
  private[graft] val ModeMarker = "#mode=put-if-absent"

  /** Whether `version`'s manifest carries the [[Terminator]] — the
    * completeness probe build-if-absent guards use so a table
    * persisted by a pre-terminator build is rebuilt, not trusted.
    */
  private[graft] def terminated(path: String, version: Long): Boolean =
    rawManifestLines(path, version).lastOption.contains(Terminator)

  /** UPGRADE-WINDOW strict tear detection: a torn put-if-absent
    * manifest written by a PRE-MARKER release (entries present, no
    * terminator, no `#mode=` line — that release wrote no marker)
    * is indistinguishable from an accepted legacy rename manifest by
    * the manifest's own declaration. Tables KNOWN to have used
    * put-if-absent commits across the upgrade set this conf while
    * repairing: marker-less, terminator-less manifests then refuse
    * loudly instead of reading a truncated entry prefix as committed.
    * Default off — legacy rename-committed tables (published in full
    * before the rename) must keep reading under any session mode.
    */
  val StrictTearConf = "spark.graft.versioned.strictTear"

  /** TABLE FEATURES this reader understands (the Delta protocol-
    * version idea, as named feature flags): a manifest may declare
    * `#protocol=<feature>[,<feature>…]`, and [[manifestLines]] —
    * the single read gate every manifest passes — REFUSES any
    * manifest declaring a feature outside this set, naming it. That
    * is what makes the gate load-bearing: a future feature this
    * binary cannot read correctly fails loudly at the manifest,
    * never as silently wrong rows. Commits write the line
    * automatically when the table's catalog metadata activates a
    * gated feature (see [[commitManifest]]).
    *
    *  - `column-mapping`: batches store stable PHYSICAL column names
    *    that differ from the table's logical schema, and/or retired
    *    (`__dropped`) physical columns whose stale parquet values
    *    must not be served — a reader that scans parquet without
    *    resolving `_table.meta`/`_meta.<N>` would return wrong
    *    column names and resurrect dropped data.
    */
  private[graft] val SupportedFeatures =
    Set("column-mapping", "column-mapping-nested")

  private def rawManifestLines(path: String, version: Long): Seq[String] = {
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

  private def manifestLines(path: String, version: Long): Seq[String] = {
    val lines = rawManifestLines(path, version)
    // torn-commit detection keyed off the manifest's OWN declared
    // write mode, never the reader session's conf (a put-if-absent
    // reader must not refuse legacy rename-committed manifests as
    // torn — following that repair advice would destroy committed
    // data). Put-if-absent commits write [[ModeMarker]] as their
    // FIRST line, so a create observed mid-write on a create-visible
    // store is detectable at every truncation point:
    //  - empty file, or comments-only (no entry ever legitimately
    //    commits without one) -> torn in any mode;
    //  - first line starts with the marker prefix (even truncated
    //    within the mode word) but the [[Terminator]] is missing ->
    //    a torn put-if-absent commit;
    //  - entries without marker or terminator -> a LEGACY manifest
    //    (pre-terminator rename commit, published in full before the
    //    rename) — accepted under any session mode.
    val markedPia = lines.headOption.exists(_.startsWith("#mode="))
    val unterminated = !lines.lastOption.contains(Terminator)
    // the upgrade-window fallback ([[StrictTearConf]]): a marker-less
    // unterminated manifest is legacy-accepted by default, but a
    // table known to have committed put-if-absent under the
    // pre-marker release opts into refusing it as potentially torn
    val strict =
      try SparkSession.active.conf
        .get(StrictTearConf, "false").toBoolean
      catch { case scala.util.control.NonFatal(_) => false }
    val torn = lines.forall(_.startsWith("#")) ||
      (markedPia && unterminated) ||
      (strict && unterminated)
    if (torn)
      throw new java.io.IOException(
        s"VersionedTable: manifest _v$version at $path is torn or still " +
          "in flight (missing content/terminator). Either a reader raced " +
          "a put-if-absent commit (retry shortly) or the committer " +
          "crashed between create and close — repair by deleting the " +
          s"torn _v$version.manifest (that commit never published; its " +
          "batch dirs are orphans for vacuum)")
    // FEATURE GATE: refuse any manifest declaring a protocol feature
    // this reader does not implement (see [[SupportedFeatures]]) —
    // the loud alternative to serving wrong rows under an unknown
    // table contract
    val unsupported = lines.filter(_.startsWith("#protocol="))
      .flatMap(_.stripPrefix("#protocol=").split(","))
      .map(_.trim).filter(_.nonEmpty)
      .filterNot(SupportedFeatures)
    if (unsupported.nonEmpty)
      throw new java.io.IOException(
        s"VersionedTable: manifest _v$version at $path requires table " +
          s"feature(s) ${unsupported.mkString(", ")} this reader does " +
          s"not support (it implements: ${SupportedFeatures.toSeq.sorted
            .mkString(", ")}). Reading without the feature would return " +
          "WRONG data, not a degraded view — upgrade the reader")
    lines
  }

  /** All manifest entries (data, compaction, and tombstone batches),
    * comments stripped, in commit order.
    */
  private def manifestEntries(path: String, version: Long): Seq[String] =
    manifestLines(path, version).filterNot(_.startsWith("#"))

  private def isTombstone(e: String): Boolean = e.startsWith("~")
  private def isCompaction(e: String): Boolean = e.startsWith("=")

  /** An entry is `<dir>` optionally followed by `;col:min:max` stats
    * segments (see [[append]]'s `statsCols`); stats ride the entry so
    * they are copied forward verbatim by every later commit.
    */
  private def dirOf(e: String): String =
    e.stripPrefix("~").stripPrefix("=").split(";").head

  /** Per-column (min, max) long stats carried by a data entry. */
  private def statsOf(e: String): Map[String, (Long, Long)] =
    e.split(";").drop(1).flatMap { seg =>
      seg.split(":") match {
        case Array(c, lo, hi) => Some(c -> (lo.toLong, hi.toLong))
        case _ => None
      }
    }.toMap

  /** FILE-LEVEL manifest segment (`;@files:a.parquet|b.parquet`): the
    * exact file names a commit's tasks reported. Entries written by
    * Spark-job batch writes don't need it (the Hadoop commit protocol
    * already quarantines failed attempts under `_temporary`), but the
    * native delta write streams files DIRECTLY into its staged dirs —
    * a ZOMBIE task attempt that flushes after the driver's prune
    * could otherwise become committed content. With the segment,
    * readers scan exactly the named files and a late-landing stray is
    * provably invisible (vacuum reclaims it with the dir's history).
    * The stats-pruning grammar ignores the segment (its parser keys
    * on `col:lo:hi` shapes), and entries copy forward verbatim like
    * every other suffix.
    */
  private val FilesSeg = "@files:"

  private[graft] def filesSegment(files: Seq[String]): String = {
    if (files.isEmpty) return ""
    files.foreach(f => require(!f.exists(";|:\n".contains(_)),
      s"file name $f would corrupt the manifest grammar"))
    s";$FilesSeg${files.sorted.mkString("|")}"
  }

  private def filesOf(e: String): Option[Seq[String]] =
    e.split(";").drop(1).find(_.startsWith(FilesSeg))
      .map(_.stripPrefix(FilesSeg).split("\\|").toSeq.filter(_.nonEmpty))

  /** The concrete scan roots of one entry: the whole batch dir, or —
    * when the entry carries a file-level manifest — exactly the
    * committed files.
    */
  private[graft] def scanPaths(path: String, e: String): Seq[String] = {
    val dir = dirOf(e)
    filesOf(e) match {
      case Some(names) => names.map(n => s"$path/data/$dir/$n")
      case None => Seq(s"$path/data/$dir")
    }
  }

  /** The writer transaction id carried by `version`'s manifest, if
    * its commit declared one.
    */
  def committedTxn(path: String, version: Long): Option[String] =
    manifestLines(path, version)
      .find(_.startsWith("#txn=")).map(_.stripPrefix("#txn="))

  /** Per-path memo of every txn id observed in retained manifests,
    * plus the highest version already scanned. Manifests are
    * IMMUTABLE once committed, so entries never go stale; a vacuumed
    * version lingering in the memo still answers the idempotency
    * question correctly (its txn DID commit — if anything the memo
    * dedups replays the post-vacuum listing no longer could). Memory
    * is one (txnId, version) pair per txn-carrying commit per JVM —
    * KB-grain, like the manifests themselves.
    */
  private val txnMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[Long], Map[String, Long])]()

  /** The newest retained version whose manifest carries `txnId` —
    * scanned across ALL retained manifests (not just the latest), so
    * the idempotency guard holds even when other commits (another
    * stream, a delete, a compact) interleave between a failed
    * micro-batch and its replay. Cost: AMORTIZED one KB-sized
    * manifest read per NEW version since the last scan (the per-path
    * memo above — manifests are immutable); the first probe on a
    * path pays one read per retained version, bounded by vacuum
    * retention. Measured at 10k retained manifests
    * (tools.ManifestScaleProbe): the uncached miss cost ~3.6 s PER
    * COMMIT on a local fs — linear in retention, paid by every
    * streaming micro-batch — and the memo removes it from the
    * steady state.
    */
  private def txnCommittedAt(path: String, txnId: String): Option[Long] = {
    val versions = committedVersions(path)
    if (versions.isEmpty) { txnMemo.remove(path); return None }
    val (scannedTo, scannedTs, known) =
      Option(txnMemo.get(path))
        .getOrElse((-1L, None: Option[Long], Map.empty[String, Long]))
    // incremental ONLY while the last-scanned manifest is still
    // listed AND is the same file (its `#ts=` commit stamp — the
    // monotone clock — identifies the incarnation): a vacuum forces
    // a cheap rescan of the post-vacuum retention window, and a
    // table DELETED and REBUILT at the same path (tests,
    // reprovisioned sinks) can never dedup against the old
    // incarnation's ids even when version numbers coincide
    val incremental = scannedTo >= 0 && versions.contains(scannedTo) &&
      commitTimeMillis(path, scannedTo) == scannedTs
    val merged =
      if (incremental && versions.last <= scannedTo) known
      else {
        val base = if (incremental) known else Map.empty[String, Long]
        val floor = if (incremental) scannedTo else -1L
        // ascending, so a (pathological) re-used id resolves to its
        // NEWEST version — parity with the pre-memo newest-first scan
        val fresh = versions.filter(_ > floor)
          .flatMap(v => committedTxn(path, v).map(_ -> v))
        val m = base ++ fresh
        txnMemo.put(path,
          (versions.last, commitTimeMillis(path, versions.last), m))
        m
      }
    merged.get(txnId)
  }

  /** Append `df` as a new version; returns the committed version
    * number. The batch dir is written first; the manifest rename is
    * the commit point. `txnId` makes the commit IDEMPOTENT for
    * at-least-once writers (a streaming foreachBatch): when any
    * retained version already carries the same txn id, the replayed
    * commit is a no-op returning that version — the Delta-style txn
    * guard, so a replayed micro-batch can never double-publish even
    * if other commits interleaved before the replay.
    *
    * `statsCols` records TYPED per-batch min/max on the manifest
    * entry — long stats for integral columns (the legacy grammar,
    * unchanged on disk), and `@`-tagged typed stats for date /
    * timestamp / string / decimal / double columns (see
    * [[statsSuffix]]) — the data-skipping stats [[readAtPruned]]
    * (longs) and the [[readAtAuto]] optimizer rule (all types) prune
    * with. Cost: one column-pruned aggregate over the just-written
    * batch (footer-friendly); entries carry their stats forward
    * verbatim through every later commit.
    *
    * A version conflict (another writer committed first) fails
    * loudly; [[appendWithRetry]] is the optimistic-concurrency
    * variant that re-commits the manifest without rewriting data.
    */
  def append(df: DataFrame, path: String,
      bloomCols: Seq[String] = Nil,
      txnId: Option[String] = None,
      statsCols: Seq[String] = Nil): Long =
    appendRetrying(df, path, txnId, statsCols, maxRetries = 0, _ => (),
      bloomCols = bloomCols)

  /** Optimistic-concurrency append (the Delta protocol for
    * commute-safe commits): the batch dir is written ONCE under its
    * attempt-unique name; on a version-conflict refusal the commit —
    * and only the commit, one KB-sized manifest write — retries
    * against the new latest version. Appends always commute with
    * interleaved appends, deletes, and compactions because manifest
    * entries are append-ordered, so the retry needs no conflict
    * analysis. Gives up after `maxRetries` conflicts (pathological
    * contention should back off at the caller).
    */
  def appendWithRetry(df: DataFrame, path: String,
      txnId: Option[String] = None, statsCols: Seq[String] = Nil,
      maxRetries: Int = 10, bloomCols: Seq[String] = Nil): Long =
    appendRetrying(df, path, txnId, statsCols, maxRetries, _ => (),
      bloomCols = bloomCols)

  /** Test seam: `beforeCommit(version)` runs before each commit
    * attempt, letting a spec inject a deterministic competing commit.
    */
  private[graft] def appendRetrying(df: DataFrame, path: String,
      txnId: Option[String], statsCols: Seq[String], maxRetries: Int,
      beforeCommit: Long => Unit, bloomCols: Seq[String] = Nil): Long = {
    txnId.flatMap(txnCommittedAt(path, _)).foreach(return _)
    val stored = toStored(df, path)
    val first = latestVersion(path).getOrElse(0L) + 1
    val batch = s"b${first}_${newToken()}"
    stored.write.mode("overwrite").parquet(s"$path/data/$batch")
    assertKeysNonNull(df.sparkSession, path, s"$path/data/$batch", Nil,
      "append")
    // stats from the WRITTEN batch (column-pruned re-read), so the
    // source plan is never executed twice
    writeBloomSidecar(df.sparkSession, s"$path/data/$batch",
      storedCols(path, bloomCols))
    val entry = batch +
      statsSuffix(df.sparkSession, s"$path/data/$batch",
        storedCols(path, statsCols))
    var attempt = 0
    while (true) {
      val next = latestVersion(path).getOrElse(0L) + 1
      val prev =
        if (next == 1) Seq.empty
        else manifestEntries(path, next - 1)
      beforeCommit(next)
      try {
        commitManifest(path, next,
          txnId.map(t => s"#txn=$t").toSeq ++ prev :+ entry)
        return next
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("already committed") &&
              attempt < maxRetries =>
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** WRITE-SIDE COLUMN-MAPPING TRANSLATION — the storage twin of
    * [[readAt]]'s logical view: a write frame arriving under the
    * table's CURRENT logical names lands under the stable PHYSICAL
    * parquet names (the same rename the catalog's V1Write fallback
    * applies), so a path-API read-modify-write round-trips on a
    * renamed table instead of committing logical names the mapping
    * cannot see. Columns matching no logical name pass through
    * (path-API extras, physical-named internal frames); a frame still
    * carrying a RETIRED (`__dropped`) physical column refuses loudly
    * — a stale writer would resurrect dropped data under a dead
    * column. Identity — zero plan nodes — without metadata/mapping.
    */
  private[graft] def toStored(df: DataFrame, path: String): DataFrame = {
    val meta =
      try graft.catalog.GraftTableMeta.readLatest(path)
      catch { case scala.util.control.NonFatal(_) => None }
    meta.filter(graft.catalog.ColumnMapping.needsLogicalView) match {
      case None => df
      case Some(m) =>
        val lc = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
        val physOf = m.schema.map(f =>
          lc(f.name) -> graft.catalog.ColumnMapping.physicalName(f)).toMap
        val droppedLc = m.dropped.map(lc).toSet
        df.columns.foreach { c =>
          if (droppedLc(lc(c)) && !physOf.contains(lc(c)))
            throw new IllegalStateException(
              s"graft write to $path refused: column '$c' was DROPPED " +
                "from the table (its physical name is retired) — a " +
                "write carrying it would resurrect dropped data. " +
                "Re-read the table's current schema (the writer is " +
                "stale), or ALTER TABLE ADD COLUMNS to declare a new " +
                "column of that name first")
        }
        val renamed = df.columns.map(c => physOf.getOrElse(lc(c), c))
        require(renamed.map(lc).distinct.length == renamed.length,
          s"graft write to $path: renaming logical columns to their " +
            s"physical names collides (${renamed.mkString(", ")}) — the " +
            "frame mixes a logical name with another column's physical " +
            "name; project one of them away")
        val flat = df.toDF(renamed.toIndexedSeq: _*)
        // NESTED mapping: struct columns land under the stable nested
        // PHYSICAL names via one positional cast (logical order ==
        // physical order; a stale frame still carrying a retired
        // nested field fails the cast's arity check loudly)
        val nestedCast = m.schema.filter(f =>
          graft.catalog.ColumnMapping.physicalType(f.dataType) !=
            graft.catalog.ColumnMapping.logicalType(f.dataType))
        if (nestedCast.isEmpty) flat
        else {
          val physLcOf = nestedCast.map(f =>
            lc(graft.catalog.ColumnMapping.physicalName(f)) -> f).toMap
          flat.select(flat.columns.toIndexedSeq.map { c =>
            physLcOf.get(lc(c)) match {
              case Some(f) => col(c).cast(
                graft.catalog.ColumnMapping.physicalType(f.dataType)).as(c)
              case None => col(c)
            }
          }: _*)
        }
    }
  }

  /** Logical → physical translation for caller-supplied key columns
    * under the CURRENT metadata (identity without mapping) — the
    * column-argument twin of [[toStored]].
    */
  private def storedCols(path: String, cols: Seq[String]): Seq[String] =
    try graft.catalog.ColumnMapping.colsToPhysicalAt(path, cols)
    catch { case scala.util.control.NonFatal(_) => cols }

  /** WRITE-SIDE KEY NULL ENFORCEMENT — what licenses the catalog's
    * non-nullable key claim: `loadTable` declares merge-key columns
    * `nullable = false` (row identity; Spark's row-level operations
    * and the optimizer both lean on it), so a committed batch holding
    * a NULL key would make predicates like `WHERE k IS NULL` and
    * null-aware joins silently WRONG. Every engine write path that
    * publishes a data batch into a key-declaring table therefore
    * proves the written batch null-free BEFORE the manifest commit:
    * parquet FOOTER null counts (file metadata, zero data pages; one
    * column-chunk statistics read per key column per file), falling
    * back to one column-pruned scan only when a footer carries no
    * null-count claim. A batch missing the key column entirely also
    * refuses — its rows would read back NULL-keyed. Violations fail
    * loudly naming the column and the fix; the batch dir stays an
    * orphan for vacuum, the previous version intact. Tombstone
    * batches are exempt: a NULL key in an anti-join matches nothing
    * (no-op), never a wrong row. Hand-written parquet + hand-edited
    * manifests are outside the contract, stated plainly.
    */
  private[graft] def assertKeysNonNull(spark: SparkSession, path: String,
      batchDir: String, files: Seq[String], context: String): Unit = {
    val meta =
      try graft.catalog.GraftTableMeta.readLatest(path)
      catch { case scala.util.control.NonFatal(_) => None }
    val keys = meta.flatMap(_.props.get("key"))
      .map(graft.sql.GraftSql.splitKey).getOrElse(Nil)
    val roots =
      if (files.nonEmpty) files.map(n => s"$batchDir/$n")
      else Seq(batchDir)
    if (keys.nonEmpty) {
      val phys = graft.catalog.ColumnMapping
        .colsToPhysical(keys, meta.get.schema)
      assertColsNonNull(spark, roots, phys, context)
    }
    // declared NOT NULL columns share the choke point (round 18 —
    // ALTER COLUMN SET NOT NULL / CREATE TABLE ... NOT NULL): the
    // catalog write path already refuses at analysis, this covers
    // PATH-level writers. Footer null counts, zero data pages.
    val keyLc = keys.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val declaredNonNull = meta.map(_.schema.fields.toSeq
      .filter(f => !f.nullable &&
        !keyLc(f.name.toLowerCase(java.util.Locale.ROOT)))
      .map(graft.catalog.ColumnMapping.physicalName)).getOrElse(Nil)
    if (declaredNonNull.nonEmpty)
      assertColsNonNull(spark, roots, declaredNonNull, context,
        colKind = "declared NOT NULL column",
        fixHint = "Filter or fill the rows before writing, or relax " +
          "the claim via ALTER TABLE ... ALTER COLUMN ... DROP NOT NULL")
    // CHECK constraints share the choke point: every engine write
    // path that publishes a data batch already passes through here
    val checks = meta.map(m => checkProps(m.props)).getOrElse(Map.empty)
    if (checks.nonEmpty) {
      val roots =
        if (files.nonEmpty) files.map(n => s"$batchDir/$n")
        else Seq(batchDir)
      val raw = spark.read.parquet(roots: _*)
      // constraint expressions speak the table's LOGICAL names
      val view = meta.map(m =>
        graft.catalog.ColumnMapping.toLogical(raw, m)).getOrElse(raw)
      assertChecksOnView(view, checks, context)
    }
  }

  /** The `check.<name>` TBLPROPERTIES — Delta CHECK constraints on
    * the versioned catalog table: each value is a boolean SQL
    * expression over the table's LOGICAL columns, enforced on the
    * WRITTEN batch BEFORE any manifest references it (the key-null
    * discipline), so a reader can never observe a constraint-
    * violating version. SQL-standard semantics: a row violates when
    * the expression is definitively FALSE (NULL passes, like SQL
    * CHECK). Declaring a constraint over existing data validates the
    * committed content first; renaming or dropping a column a
    * constraint references refuses loudly naming it (the expression
    * text would go stale — Delta's rule).
    */
  private[graft] def checkProps(
      props: Map[String, String]): Map[String, String] =
    props.filter(_._1.toLowerCase(java.util.Locale.ROOT)
      .startsWith("check."))

  /** One aggregate pass counting violations per declared constraint
    * over `view` (logical names); throws naming the first violated
    * constraint, its expression, and the row count.
    */
  private[graft] def assertChecksOnView(view: DataFrame,
      checks: Map[String, String], context: String): Unit = {
    if (checks.isEmpty) return
    import org.apache.spark.sql.functions.{expr, sum, when}
    val names = checks.keys.toSeq.sorted
    val aggs = names.map { n =>
      sum(when(!coalesce(expr(checks(n)).cast("boolean"), lit(true)),
        1L).otherwise(0L)).as(n)
    }
    val row = view.agg(aggs.head, aggs.tail: _*).head()
    names.zipWithIndex.foreach { case (n, i) =>
      val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (bad > 0)
        throw new IllegalStateException(
          s"graft $context refused: CHECK constraint " +
            s"'${n.stripPrefix("check.")}' (${checks(n)}) is violated " +
            s"by $bad row(s) — nothing was published (the staged batch " +
            "is an orphan for vacuum). Fix the data, or drop the " +
            "constraint via ALTER TABLE ... UNSET TBLPROPERTIES")
    }
  }

  /** The footer-level core of [[assertKeysNonNull]], parameterized so
    * key ADOPTION (ALTER TABLE SET TBLPROPERTIES('key'=...) over
    * existing data) can validate committed batches under the key
    * being declared, before the claim is ever made.
    */
  private[graft] def assertColsNonNull(spark: SparkSession,
      scanRoots: Seq[String], physCols: Seq[String],
      context: String,
      colKind: String = "merge-key column",
      fixHint: String = "Filter or fill the keys before writing, or " +
        "UNSET the table's 'key' property"): Unit = {
    if (physCols.isEmpty) return
    def violation(c: String, what: String): Nothing =
      throw new IllegalStateException(
        s"graft $context refused: $colKind '$c' $what — a non-null " +
          s"claim cannot stand over NULL rows. $fixHint")
    val conf = spark.sparkContext.hadoopConfiguration
    var unproven = false
    scanRoots.foreach { root =>
      val rp = new Path(root)
      val f = rp.getFileSystem(conf)
      val filesHere: Seq[Path] =
        if (f.getFileStatus(rp).isFile) Seq(rp)
        else {
          val rootPrefix = f.makeQualified(rp).toString.stripSuffix("/") + "/"
          val it = f.listFiles(rp, true)
          val acc = scala.collection.mutable.ArrayBuffer.empty[Path]
          while (it.hasNext) {
            val st = it.next()
            val full = st.getPath.toString
            val rel = if (full.startsWith(rootPrefix))
              full.substring(rootPrefix.length) else full
            val hidden = rel.split("/").exists(seg =>
              seg.startsWith("_") || seg.startsWith("."))
            if (st.isFile && full.endsWith(".parquet") && !hidden)
              acc += st.getPath
          }
          acc.toSeq
        }
      filesHere.foreach { fp =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(fp, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val footer = reader.getFooter
          val fileSchema = footer.getFileMetaData.getSchema
          physCols.foreach { c =>
            if (!fileSchema.containsField(c))
              violation(c, "is absent from a written batch file (its " +
                "rows would read back NULL-keyed)")
            footer.getBlocks.forEach { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == c).foreach { cc =>
                  val st = cc.getStatistics
                  if (st == null || !st.isNumNullsSet) unproven = true
                  else if (st.getNumNulls > 0)
                    violation(c, s"holds ${st.getNumNulls} NULL value(s) " +
                      s"in $fp")
                }
            }
          }
        } finally reader.close()
      }
    }
    // a footer without a null-count claim (foreign writer): one
    // column-pruned scan settles it — correctness is never assumed
    if (unproven) {
      val scan = spark.read.parquet(scanRoots: _*)
      physCols.foreach { c =>
        if (!scan.filter(col(c).isNull).isEmpty)
          violation(c, "holds NULL value(s)")
      }
    }
  }

  /** Key ADOPTION gate: validate every data batch of `version`
    * null-free under the physical key columns being declared — run by
    * ALTER TABLE SET TBLPROPERTIES('key'=...) over existing data,
    * BEFORE the non-nullable claim is ever made.
    */
  private[graft] def assertVersionKeysNonNull(spark: SparkSession,
      path: String, version: Long, physCols: Seq[String]): Unit =
    manifestEntries(path, version).filterNot(isTombstone).foreach(e =>
      assertColsNonNull(spark, scanPaths(path, e), physCols,
        "key adoption (ALTER TABLE SET TBLPROPERTIES)"))

  /** Validate every data batch of `version` carries `physCol` with
    * zero nulls — the SET NOT NULL adoption gate (the key-adoption
    * discipline applied to one declared column).
    */
  private[graft] def assertVersionColNonNull(spark: SparkSession,
      path: String, version: Long, physCol: String): Unit =
    manifestEntries(path, version).filterNot(isTombstone).foreach(e =>
      assertColsNonNull(spark, scanPaths(path, e), Seq(physCol),
        "ALTER COLUMN SET NOT NULL (adoption)",
        colKind = "column",
        fixHint = "Fill or delete the NULL rows first, then rerun"))

  /** Longest string prefix recorded as a stats bound — the Delta
    * truncated-stats convention: a KB-sized manifest must not carry
    * arbitrarily long document keys. A truncated MIN prefix is still
    * a valid lower bound (a prefix orders <= every extension in
    * binary order); a truncated MAX cannot claim an upper bound, so
    * it is recorded as unbounded (`*`) — strictly conservative.
    */
  private val StringStatsPrefixChars = 64

  private def hexEncode(s: String): String =
    "x" + s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString

  /** TYPED per-batch min/max manifest stats, one column-pruned agg
    * pass over the written batch (footer-friendly). Encoding by the
    * column's NATIVE type — the grammar stays `;`-segmented with `:`
    * fields, values never contain either character:
    *
    *   - integral (byte/short/int/long): the legacy 3-field
    *     `col:<lo>:<hi>` longs — unchanged on disk, so every
    *     pre-round-12 manifest reads back identically;
    *   - DateType:       `col:@d:<epochDayLo>:<epochDayHi>`;
    *   - TimestampType:  `col:@t:<microsLo>:<microsHi>`;
    *   - StringType:     `col:@s:x<hexLo>:x<hexHi>` — UTF-8 hex of a
    *     <=64-char prefix; a truncated max becomes `*` (no upper
    *     claim); min/max follow Spark's binary UTF8 ordering;
    *   - DecimalType:    `col:@m:<plain>:<plain>` (BigDecimal plain
    *     strings — exact);
    *   - Double/Float:   `col:@f:<repr>:<repr>` (shortest
    *     round-trip repr; NaN ordered greatest, as Spark orders it).
    *
    * Any other type records nothing (no stats = no claim — the
    * conservative default every pruning path already honors). This
    * is what makes a plain `.filter($"o_date" >= lit(d))` on a
    * date-typed column prune batch dirs through
    * [[graft.plans.VersionedStatsPruning]] — THE 100 TB predicate —
    * instead of requiring the caller to pre-encode epoch longs.
    */
  /** REPLACE the table's content with `df` as one atomic commit: the
    * new version's manifest references ONLY the new batch, so readers
    * flip from the old content to the new at the manifest rename —
    * never a mix. Prior versions stay time-travelable until vacuum
    * (an overwrite is a commit, not an erasure). The batch is a data
    * change (no `=` flag): [[readChanges]] delivers the new content
    * as appended rows, and — stated honestly, the Delta streaming
    * caveat — the REPLACED rows are not signaled; an incremental
    * consumer that must track replacements reads [[readChangeFeed]]
    * across the boundary or re-seeds from the snapshot. Same txn
    * guard and stats/Bloom options as [[append]].
    */
  def overwrite(df: DataFrame, path: String,
      txnId: Option[String] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Long = {
    txnId.flatMap(txnCommittedAt(path, _)).foreach(return _)
    val stored = toStored(df, path)
    val next = latestVersion(path).getOrElse(0L) + 1
    val batch = s"b${next}_${newToken()}"
    stored.write.mode("overwrite").parquet(s"$path/data/$batch")
    assertKeysNonNull(df.sparkSession, path, s"$path/data/$batch", Nil,
      "overwrite")
    writeBloomSidecar(df.sparkSession, s"$path/data/$batch",
      storedCols(path, bloomCols))
    val entry = batch +
      statsSuffix(df.sparkSession, s"$path/data/$batch",
        storedCols(path, statsCols))
    commitManifest(path, next, txnId.map(t => s"#txn=$t").toSeq :+ entry)
    next
  }

  private def statsSuffix(spark: SparkSession, batchDir: String,
      statsCols: Seq[String]): String =
    if (statsCols.isEmpty) ""
    else {
      statsCols.foreach { c =>
        require(!c.exists(";:".contains(_)),
          s"stats column name $c would corrupt the manifest grammar")
      }
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions.{min, max, datediff, unix_micros}
      val batch = spark.read.parquet(batchDir)
      val topOf = batch.schema.map(f => f.name -> f.dataType).toMap
      // a DOTTED stats column names a nested struct field (round 18):
      // resolve its type by walking the path; `col("a.b")` aggregates
      // the extraction, NULL parents skip like NULL values. Stats
      // record under the dotted (physical) path — the same name the
      // pruning rule derives from a GetStructField chain. A dotted
      // name whose path walk fails FALLS BACK to a literal top-level
      // column of that exact name (backtick-quoted so Spark does not
      // re-parse it as an extraction) — its stats key collides with
      // the nested grammar, so the pruning rule makes no claim for
      // it, but recording stays lossless rather than silently absent.
      // Returns (inner type, per-row LO expr, per-row HI expr): a
      // scalar path extracts once for both; a path through an ARRAY
      // ("element" segment, round 19) envelopes per row with
      // array_min/array_max over the per-element extraction —
      // `m.element.bytes` records the batch's envelope over ALL
      // elements, the claim an `exists(m, x -> x.bytes >= k)`
      // predicate prunes against. One array level (the file_manifest
      // shape); deeper element nesting makes no claim.
      def structWalk(dt: DataType, segs: Seq[String]): Option[DataType] =
        segs.foldLeft(Option(dt)) {
          case (Some(st: StructType), seg) =>
            st.find(_.name == seg).map(_.dataType)
          case _ => None
        }
      // whether the ARRAY branch claims this spec (prefix resolves to
      // an array whose element struct carries the suffix)
      def arraySplit(c: String): Option[(Seq[String], Seq[String])] = {
        val parts = c.split("\\.").toSeq
        val elemAt = parts.indexWhere(_.equalsIgnoreCase("element"))
        if (elemAt < 0) None
        else {
          val prefix = parts.take(elemAt)
          val suffix = parts.drop(elemAt + 1)
          if (prefix.isEmpty || suffix.isEmpty ||
            suffix.exists(_.equalsIgnoreCase("element"))) None
          else structWalk(batch.schema, prefix) match {
            case Some(at: org.apache.spark.sql.types.ArrayType)
                if structWalk(at.elementType, suffix).isDefined =>
              Some((prefix, suffix))
            case _ => None
          }
        }
      }
      // the key the pruning rule derives spells the structural
      // segment lowercase — record under the same canonical spelling
      // (a mixed-case 'Element' spec would otherwise record stats
      // that can never prune)
      def canonKey(c: String): String = arraySplit(c) match {
        case Some((prefix, suffix)) =>
          (prefix ++ Seq("element") ++ suffix).mkString(".")
        case None => c
      }
      def typeOf(c: String):
          Option[(DataType, org.apache.spark.sql.Column,
            org.apache.spark.sql.Column)] = {
        val parts = c.split("\\.").toSeq
        val elemAt = parts.indexWhere(_.equalsIgnoreCase("element"))
        val nested: Option[(DataType, org.apache.spark.sql.Column,
            org.apache.spark.sql.Column)] =
          if (!c.contains(".")) None
          else if (elemAt < 0)
            structWalk(batch.schema, parts).map(dt => (dt, col(c), col(c)))
          else {
            val viaArray = arraySplit(c).flatMap { case (prefix, suffix) =>
              structWalk(batch.schema, prefix) match {
                case Some(at: org.apache.spark.sql.types.ArrayType) =>
                  structWalk(at.elementType, suffix).map { dt =>
                    val per = org.apache.spark.sql.functions.transform(
                      col(prefix.mkString(".")),
                      x => suffix.foldLeft(x)((e, s) => e.getField(s)))
                    (dt, org.apache.spark.sql.functions.array_min(per),
                      org.apache.spark.sql.functions.array_max(per))
                  }
                case _ => None
              }
            }
            // a STRUCT field literally named "element" keeps the
            // plain struct-walk semantics (the array form above only
            // claims genuine arrays)
            viaArray.orElse(
              structWalk(batch.schema, parts).map(dt => (dt, col(c), col(c))))
          }
        nested.orElse(
          topOf.get(c).map { dt =>
            val cc = col(s"`${c.replace("`", "``")}`")
            (dt, cc, cc)
          })
      }
      val aggs = statsCols.flatMap { c =>
        typeOf(c) match {
          case Some((ByteType | ShortType | IntegerType | LongType, lo, hi)) =>
            Seq(min(lo).cast("long"), max(hi).cast("long"))
          case Some((DateType, lo, hi)) =>
            Seq(datediff(min(lo), lit("1970-01-01")).cast("long"),
              datediff(max(hi), lit("1970-01-01")).cast("long"))
          case Some((TimestampType, lo, hi)) =>
            Seq(unix_micros(min(lo)), unix_micros(max(hi)))
          case Some((StringType | _: DecimalType | DoubleType | FloatType,
              lo, hi)) =>
            Seq(min(lo), max(hi))
          case _ => Seq.empty // unsupported/absent: no claim
        }
      }
      if (aggs.isEmpty) return ""
      val row = batch.agg(aggs.head, aggs.tail: _*).head()
      var i = 0
      statsCols.flatMap { c =>
        typeOf(c).map(_._1) match {
          case Some(dt @ (ByteType | ShortType | IntegerType | LongType |
              DateType | TimestampType)) =>
            val (lo, hi) = (i, i + 1); i += 2
            if (row.isNullAt(lo) || row.isNullAt(hi)) None
            else {
              val tag = dt match {
                case DateType => "@d:"
                case TimestampType => "@t:"
                case _ => ""
              }
              Some(s";${canonKey(c)}:$tag${row.getLong(lo)}:${row.getLong(hi)}")
            }
          case Some(StringType) =>
            val (lo, hi) = (i, i + 1); i += 2
            if (row.isNullAt(lo) || row.isNullAt(hi)) None
            else {
              val mn = row.getString(lo); val mx = row.getString(hi)
              val mnEnc = hexEncode(mn.take(StringStatsPrefixChars))
              val mxEnc =
                if (mx.length <= StringStatsPrefixChars) hexEncode(mx)
                else "*"
              Some(s";${canonKey(c)}:@s:$mnEnc:$mxEnc")
            }
          case Some(_: DecimalType) =>
            val (lo, hi) = (i, i + 1); i += 2
            if (row.isNullAt(lo) || row.isNullAt(hi)) None
            else Some(s";${canonKey(c)}:@m:${row.getDecimal(lo).toPlainString}" +
              s":${row.getDecimal(hi).toPlainString}")
          case Some(DoubleType | FloatType) =>
            val (lo, hi) = (i, i + 1); i += 2
            val get = (j: Int) => row.get(j) match {
              case d: java.lang.Double => d.doubleValue
              case f: java.lang.Float => f.doubleValue
            }
            if (row.isNullAt(lo) || row.isNullAt(hi)) None
            else Some(s";${canonKey(c)}:@f:${get(lo)}:${get(hi)}")
          case _ => None
        }
      }.mkString
    }

  /** Per-batch key Bloom filters, the POINT-LOOKUP index zone maps
    * cannot be: on hash- or arrival-distributed layouts every batch's
    * [min, max] spans the whole key domain and stats pruning
    * degenerates to a full read ([[graft.operators.FileSkipping]]'s
    * file-level argument, lifted to the table's commit grain). The
    * sidecar lives INSIDE the batch dir as `_bloom/` — the
    * underscore prefix keeps it invisible to every data scan (the
    * parquet hidden-file convention), it travels with the batch
    * through manifest copy-forward, and vacuum reclaims it with its
    * batch. Self-describing (col, bit, bits) rows, k = 2 seeded
    * xxhash64 lanes — the same lanes as `FileSkipping.bloomBits`, so
    * build and probe share one hash definition. No manifest grammar
    * change: presence of `_bloom` IS the index.
    */
  /** A `bloomCols` entry is a single column name, or a COMPOSITE
    * spec `a+b` (round-16 verdict #4): the composite lane hashes the
    * whole key TUPLE, canonicalized by sorting the component names —
    * so a `(k1, k2)` point lookup or upsert anti-join prunes on the
    * full key instead of the first component's sound-but-loose
    * superset (the difference on first-component-hot tables: one
    * batch opened instead of every batch sharing the hot component).
    */
  private def writeBloomSidecar(spark: SparkSession, batchDir: String,
      bloomCols: Seq[String], bits: Int = 0): Unit =
    if (bloomCols.nonEmpty) {
      // ADAPTIVE domain (round 16): a saturated Bloom never lies but
      // prunes NOTHING — at 2^16 bits a ~37k-key batch is ~75% full
      // and every probe is a false positive. The sidecar stores SET
      // BITS AS ROWS, so widening the domain costs zero extra rows,
      // only larger bit values: size it ~16× the batch's row count
      // (footer metadata, zero data pages — an upper bound on
      // distinct keys), floored at the legacy 2^16 and capped at
      // 2^26. Probes read the domain from the sidecar's own `bits`
      // column, so mixed-domain batches coexist.
      val sized =
        if (bits > 0) bits
        else {
          val n = footerRowCount(
            spark.sparkContext.hadoopConfiguration, batchDir)
          val want = math.min(1L << 26, math.max(BloomBits.toLong, 16L * n))
          java.lang.Long.highestOneBit(want).toInt match {
            case p if p.toLong == want => p
            case p => p << 1
          }
        }
      val batch = spark.read.parquet(batchDir)
      // a DOTTED component names a nested struct field (round 19 —
      // the statscols discipline applied to point lookups): resolve
      // by walking the batch's physical schema; NULL parents hash
      // like NULL values (xxhash64 is null-tolerant), which only
      // sets a spurious bucket — never a false negative. A dotted
      // name whose walk fails falls back to a literal top-level
      // column of that exact name (backtick-quoted), mirroring
      // statsSuffix: recording stays lossless, and the pruning rule's
      // ColPath guard already makes no claim for such names.
      def resolve(c: String): org.apache.spark.sql.Column = {
        import org.apache.spark.sql.types.StructType
        val nested =
          if (!c.contains(".")) None
          else c.split("\\.").toSeq.foldLeft(
            Option(batch.schema: org.apache.spark.sql.types.DataType)) {
            case (Some(st: StructType), seg) =>
              st.find(_.name == seg).map(_.dataType)
            case _ => None
          }
        if (nested.isDefined || !batch.schema.fieldNames.contains(c)) col(c)
        else col(s"`${c.replace("`", "``")}`")
      }
      bloomCols.map { c =>
        val comps = c.split("\\+").map(_.trim).filter(_.nonEmpty)
          .toSeq.sorted
        if (comps.size <= 1)
          batch.select(lit(c).as("col"),
            explode(FileSkipping.bloomBits(resolve(c), sized)).as("bit"))
        else
          batch.select(lit(comps.mkString("+")).as("col"),
            explode(FileSkipping.bloomBitsMulti(comps.map(resolve), sized))
              .as("bit"))
      }.reduce(_ unionByName _)
        .distinct()
        .withColumn("bits", lit(sized.toLong))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$batchDir/_bloom")
    }

  /** FLOOR of the per-batch Bloom domain: 2^16 bit positions. The
    * builder sizes each batch's domain adaptively (~16× its row
    * count, capped at 2^26 — see [[writeBloomSidecar]]): a saturated
    * Bloom prunes nothing but never lies, and since the sidecar
    * stores set bits as rows, a wider domain is free. Probes read
    * the domain from the sidecar itself, so every historical domain
    * keeps working.
    */
  val BloomBits: Int = 1 << 16

  /** The sidecar's fixed schema, passed explicitly on read (r20):
    * schema inference ran a footer job PER SIDECAR PER PROBE — q326
    * profiled as a chain of ~20 serial single-task ~25 ms jobs, all
    * schema reads of files this module itself wrote.
    */
  private val BloomSidecarSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("col",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("bit",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bits",
      org.apache.spark.sql.types.LongType)))

  private def bloomSidecar(spark: SparkSession, path: String,
      dir: String): Option[DataFrame] = {
    val (f, _) = fs(path)
    val p = new Path(s"$path/data/$dir/_bloom")
    if (f.exists(p))
      Some(spark.read.schema(BloomSidecarSchema).parquet(p.toString))
    else None
  }

  /** Data dirs that MIGHT contain at least one of `keys` under
    * `keyCol`: both Bloom lanes of some key are set in the dir's
    * sidecar. The no-false-negative contract needs two guards beyond
    * the lane joins:
    *
    *  - a dir can claim absence ONLY if its sidecar carries rows for
    *    `keyCol` — a sidecar built for OTHER columns (or no sidecar
    *    at all) makes no claim and stays a candidate;
    *  - probe keys are CAST to each batch's native column type before
    *    hashing, because the sidecar bits were built by hashing the
    *    stored column as-is and XxHash64 hashes IntegerType and
    *    LongType differently — a long-typed probe of an int-typed
    *    column would miss both lanes on every batch and prune rows
    *    that exist (spec-proven with an int key column). Batches are
    *    probed per distinct native type (footer-only schema reads,
    *    bounded by batch count); a cast-overflowed or null probe
    *    value can at worst keep an extra batch, never drop one, since
    *    the caller's exact filter runs on top.
    *
    * Driver-side result, bounded by the manifest's batch count.
    */
  private def bloomCandidateDirs(spark: SparkSession, path: String,
      dataDirs: Seq[String], keyCol: String,
      keys: DataFrame): Set[String] = {
    val sidecars = dataDirs.flatMap(d =>
      bloomSidecar(spark, path, d).map(d -> _))
    val unindexed = dataDirs.toSet -- sidecars.map(_._1)
    if (sidecars.isEmpty) return dataDirs.toSet
    // dirs whose sidecar actually covers keyCol (one scan of the
    // KB-sized sidecar union); the rest make no claim
    val claiming = sidecars.map { case (d, df) =>
      df.filter(col("col") === keyCol).select(lit(d).as("batch")).limit(1)
    }.reduce(_ unionByName _).distinct()
      .collect().map(_.getString(0)).toSet
    val unclaiming = sidecars.map(_._1).filterNot(claiming).toSet
    if (claiming.isEmpty) return dataDirs.toSet
    val sidecarOf = sidecars.toMap
    // probe per native key-column type, so build and probe hash the
    // same physical type; a batch whose schema lacks keyCol entirely
    // keeps candidate status (no claim)
    val byType = claiming.toSeq.groupBy { d =>
      spark.read.parquet(s"$path/data/$d").schema
        .find(_.name == keyCol).map(_.dataType)
    }
    val hits = byType.toSeq.flatMap {
      case (None, dirs) => dirs
      case (Some(dt), dirs) =>
        // try_cast, not cast: under Spark 4's ANSI default a cast of
        // an out-of-range probe key (long 2^40 probing an int column)
        // THROWS and fails the whole lookup/retry; try_cast nulls it
        // so it is filtered — such a key cannot exist in the narrower
        // column, and the contract stays "at worst keep an extra
        // batch" (spec-proven with an overflowing probe)
        val ks = keys.select(col(keyCol).try_cast(dt).as("k"))
          .filter(col("k").isNotNull).distinct()
        val blooms = dirs.map { d =>
          sidecarOf(d).filter(col("col") === keyCol)
            .select(lit(d).as("batch"), col("bit"), col("bits"))
        }.reduce(_ unionByName _)
        // per (key, batch): lane-1 hit AND lane-2 hit. Each lane is an
        // equi-join on the lane's bit position (hashable — no
        // cartesian); sidecars are KB-sized, so both joins broadcast.
        def laneHits(lane: Int) = ks.join(blooms,
          pmod(xxhash64(col("k"), lit(lane)), col("bits")) === col("bit"))
          .select(col("k"), col("batch")).distinct()
        laneHits(1).join(laneHits(2), Seq("k", "batch"), "left_semi")
          .select(col("batch")).distinct().collect().map(_.getString(0))
    }
    hits.toSet ++ unindexed ++ unclaiming
  }

  /** [[bloomCandidateDirs]] under a COMPOSITE key: dirs whose sidecar
    * carries the canonical full-tuple lane (`<comps sorted>+…`, see
    * [[writeBloomSidecar]]) are probed on the WHOLE tuple — the
    * strict-subset pruning a first-component-hot table needs; dirs
    * without the lane fall back to the first-component probe (the
    * sound superset this method strictly improves on). Same
    * no-false-negative contract: per-batch native-type casting per
    * component, a null/overflowed probe component matches nothing in
    * a non-null key column, and any dir making no claim stays a
    * candidate.
    */
  private[graft] def bloomCandidateDirsMulti(spark: SparkSession,
      path: String, dataDirs: Seq[String], keyCols: Seq[String],
      keys: DataFrame): Set[String] = {
    if (keyCols.size == 1)
      return bloomCandidateDirs(spark, path, dataDirs, keyCols.head,
        keys.select(col(keyCols.head)))
    val comps = keyCols.sorted
    val lane = comps.mkString("+")
    val sidecars = dataDirs.flatMap(d =>
      bloomSidecar(spark, path, d).map(d -> _))
    if (sidecars.isEmpty) return dataDirs.toSet
    val claiming = sidecars.map { case (d, df) =>
      df.filter(col("col") === lane).select(lit(d).as("batch")).limit(1)
    }.reduce(_ unionByName _).distinct()
      .collect().map(_.getString(0)).toSet
    // everything not claiming the composite lane prunes on the first
    // component (bloomCandidateDirs keeps unindexed/unclaiming dirs)
    val rest = dataDirs.filterNot(claiming)
    val restCand =
      if (rest.isEmpty) Set.empty[String]
      else bloomCandidateDirs(spark, path, rest, keyCols.head,
        keys.select(col(keyCols.head)))
    if (claiming.isEmpty) return restCand
    val sidecarOf = sidecars.toMap
    // group by the NATIVE type tuple so build and probe hash the same
    // physical types; a batch lacking a component keeps candidacy
    val byType = claiming.toSeq.groupBy { d =>
      val sch = spark.read.parquet(s"$path/data/$d").schema
      comps.map(c => sch.find(_.name == c).map(_.dataType))
    }
    val hits = byType.toSeq.flatMap {
      case (types, dirs) if types.exists(_.isEmpty) => dirs
      case (types, dirs) =>
        val cast = keys.select(comps.zip(types).map { case (c, dt) =>
          col(c).try_cast(dt.get).as(c) }: _*)
        // a component that nulled under the cast (overflow, or a null
        // probe) cannot equal a stored non-null key — drop the row,
        // never a candidate dir
        val ks = comps.foldLeft(cast)((df, c) =>
          df.filter(col(c).isNotNull)).distinct()
        val blooms = dirs.map { d =>
          sidecarOf(d).filter(col("col") === lane)
            .select(lit(d).as("batch"), col("bit"), col("bits"))
        }.reduce(_ unionByName _)
        def laneHits(seed: Int) = ks.join(blooms,
          pmod(xxhash64((comps.map(col) :+ lit(seed)): _*),
            col("bits")) === col("bit"))
          .select((comps.map(col) :+ col("batch")): _*).distinct()
        laneHits(1).join(laneHits(2), comps :+ "batch", "left_semi")
          .select(col("batch")).distinct().collect().map(_.getString(0))
    }
    hits.toSet ++ restCand
  }

  /** Batch point lookup: read only the batch dirs whose Bloom
    * sidecar might contain one of `keys`, apply the position-scoped
    * tombstones of the surviving batches, then the exact key filter
    * (which also removes Bloom false positives) — [[readAt]]
    * semantics at index cost. On layouts where zone maps are blind
    * (hash/arrival distribution), this is the difference between
    * opening every batch and opening the one or two that matter.
    */
  def lookupKeys(spark: SparkSession, path: String, version: Long,
      keyCol: String, keys: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "lookupKeys needs at least one key")
    import spark.implicits._
    // sidecars and batches store PHYSICAL names; the caller's column
    // (and the result) speak the epoch's logical ones
    val phys = graft.catalog.ColumnMapping
      .colsToPhysicalAtVersion(path, version, Seq(keyCol)).head
    val entries = manifestEntries(path, version)
    val dataDirs = entries.filterNot(isTombstone).map(dirOf)
    val cand = bloomCandidateDirs(spark, path, dataDirs, phys,
      keys.toDF(phys))
    graft.catalog.ColumnMapping.toLogicalAt(
      readAtFiltered(spark, path, version, mergeSchema = false,
        e => cand.contains(dirOf(e)))
        .filter(col(phys).isin(keys: _*)), path, version)
  }

  /** [[lookupKeys]] under a COMPOSITE key: `keys` carries one row per
    * probe tuple (all key columns). Bloom pruning probes the FULL
    * TUPLE on batches whose sidecar carries the composite lane
    * (declare `bloomcols` = `k1+k2`; round-16 verdict #4 — on a
    * first-component-hot table this opens the one batch that matters
    * instead of every batch sharing the hot component), falling back
    * to the first-component sound superset elsewhere; the exact
    * semi-join on the full column set removes false positives and
    * partial matches. The probe frame is KB-sized and broadcasts.
    */
  def lookupKeysMulti(spark: SparkSession, path: String, version: Long,
      keyCols: Seq[String], keys: DataFrame): DataFrame = {
    require(keyCols.nonEmpty, "lookupKeysMulti needs key columns")
    keyCols.foreach(c => require(keys.columns.contains(c),
      s"probe frame lacks key column $c"))
    // probe frame arrives under logical names; sidecars and batches
    // store physical ones
    val phys = graft.catalog.ColumnMapping
      .colsToPhysicalAtVersion(path, version, keyCols)
    val probe = keys.select(keyCols.zip(phys).map {
      case (l, p) => col(l).as(p) }: _*).distinct()
    val entries = manifestEntries(path, version)
    val dataDirs = entries.filterNot(isTombstone).map(dirOf)
    // full-tuple lane when the sidecars carry it; first-component
    // superset otherwise (never worse than the single-column probe)
    val cand = bloomCandidateDirsMulti(spark, path, dataDirs, phys, probe)
    graft.catalog.ColumnMapping.toLogicalAt(
      readAtFiltered(spark, path, version, mergeSchema = false,
        e => cand.contains(dirOf(e)))
        .join(broadcast(probe), phys, "left_semi"), path, version)
  }

  /** Selects the commit primitive — the atomicity ladder, shipped on
    * both rungs:
    *
    *  - `"rename"` (default): manifest written to a temp name, then
    *    RENAMED into place after an exists check. Correct where
    *    rename is atomic and refuses existing destinations (HDFS);
    *    on the local filesystem the exists check narrows but does
    *    not close the window (test-grade). On a rename-free object
    *    store this mode is UNSAFE: two racing writers can both
    *    "win" (the spec demonstrates exactly that on a simulated
    *    S3 filesystem);
    *  - `"put-if-absent"`: the manifest is written DIRECTLY to its
    *    final name with `create(overwrite = false)` — the exclusive-
    *    create contract S3 serves via conditional PUT
    *    (`If-None-Match: *`; Hadoop's s3a maps exclusive create onto
    *    it). The create IS the atomic point: there is no
    *    check-then-act window, so two concurrent committers to one
    *    version cannot both succeed (spec-proven). The mode's FULL
    *    safety claim is scoped to stores where the whole object
    *    materializes atomically on PUT completion (true object
    *    stores). On create-visible filesystems (HDFS, local) the
    *    exclusive create still closes the duplicate-commit window,
    *    but a reader can race the window between create and close —
    *    which is why every manifest ends with the [[Terminator]]
    *    line: a torn/empty manifest is DETECTED at read time and
    *    fails loudly with a repair path (delete the torn manifest),
    *    never silently wedging the version as "already committed"
    *    (spec-proven with a hand-torn manifest).
    */
  val CommitModeConf = "spark.graft.versioned.commit"

  private def alreadyCommitted(path: String, version: Long): java.io.IOException =
    new java.io.IOException(
      s"VersionedTable: version $version of $path is already committed " +
        "(concurrent writer won the race); this attempt is NOT published " +
        "and its batch dirs are orphans for vacuum")

  /** The single commit point: publish `lines` as version `version`
    * through the configured primitive (see [[CommitModeConf]]).
    */
  private[graft] def commitManifest(path: String, version: Long,
      lines: Seq[String]): Unit = {
    val (f, p) = fs(path)
    val fin = new Path(p, s"_v$version.manifest")
    val mode = SparkSession.active.conf.get(CommitModeConf, "rename")
    // the manifest header: put-if-absent commits lead with the mode
    // marker (torn-commit detection keys off the manifest's OWN
    // declaration, never the reader session's conf); every commit
    // then records its wall-clock (`#ts=` — TIMESTAMP AS OF survives
    // mtime-clobbering copies) and, when the table's catalog metadata
    // activates a gated feature, the `#protocol=` line a feature-
    // unaware reader refuses on (see [[SupportedFeatures]]). The
    // terminator closes every manifest
    val protocol =
      if (lines.exists(_.startsWith("#protocol="))) Seq.empty
      else {
        val feats =
          try graft.catalog.GraftTableMeta.readLatest(path)
            .map(graft.catalog.ColumnMapping.protocolFeatures)
            .getOrElse(Seq.empty)
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        if (feats.nonEmpty) Seq("#protocol=" + feats.mkString(","))
        else Seq.empty
      }
    // MONOTONIC commit clock (Delta's in-commit-timestamp rule):
    // ts = max(now, prev commit ts + 1). With multi-writer clock
    // skew a raw wall-clock could run BACKWARD across versions, and
    // `versionAtTime(t)` would return a version whose own commit
    // time exceeds t (a skewed successor makes it eligible). The
    // clamp costs one KB-sized manifest header read per commit and
    // makes TIMESTAMP AS OF resolution order-consistent by
    // construction.
    val now = System.currentTimeMillis()
    val ts =
      if (version <= 1) now
      else math.max(now,
        commitTimeMillis(path, version - 1).map(_ + 1L).getOrElse(now))
    val payload = ((if (mode == "put-if-absent") Seq(ModeMarker)
      else Seq.empty) ++ protocol ++
      Seq(s"#ts=$ts") ++ lines :+ Terminator)
      .mkString("\n").getBytes("UTF-8")
    if (mode == "put-if-absent") {
      val out =
        try f.create(fin, false) // exclusive create — the atomic point
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            throw alreadyCommitted(path, version)
          case e: java.io.IOException if f.exists(fin) =>
            throw alreadyCommitted(path, version)
        }
      try out.write(payload)
      finally out.close()
    } else {
      if (f.exists(fin)) throw alreadyCommitted(path, version)
      val tmp = new Path(p, s"_v$version.manifest.tmp")
      val out = f.create(tmp, true)
      try out.write(payload)
      finally out.close()
      if (!f.rename(tmp, fin))
        throw new java.io.IOException(
          s"VersionedTable: commit rename $tmp -> $fin failed; version $version " +
            "is NOT published (previous version remains intact)")
    }
  }

  /** COMMIT-TIME CONSTRAINTS (Delta CHECK constraints / DLT
    * expectations, on the versioned table): validate the WRITTEN
    * batch before any manifest references it, so a reader can never
    * observe a constraint-violating version.
    *
    *  - all rules pass → the batch commits as written (one write,
    *    one validation scan of the written dir — the source plan
    *    never executes twice);
    *  - violations with `quarantine = Some(dlq)` → ROW-LOCAL rules
    *    (NotNull / Check / InReference) split the batch: valid rows
    *    commit here, violating rows are appended to the `dlq`
    *    versioned table (the engine's K7 dead-letter parity, itself
    *    versioned and auditable). A [[graft.operators.Expectations.Unique]]
    *    violation still REFUSES even in quarantine mode — dropping
    *    "the duplicate" is not attributable to a row;
    *  - violations without quarantine → IllegalStateException naming
    *    each failed rule and its count; the batch dir stays an
    *    orphan for vacuum, the previous version fully intact (the
    *    failed-commit discipline).
    *
    * Atomicity boundary, stated honestly: the quarantine split spans
    * TWO tables and cannot be one rename. The DLQ commits FIRST
    * under `<txnId>-dlq`, so with a caller-supplied `txnId` a replay
    * after a crash between the two commits no-ops on both sides
    * (exactly-once end to end, spec-proven); without one the DLQ leg
    * is at-least-once, and the ordering guarantees a quarantined row
    * is never lost.
    */
  def appendChecked(df: DataFrame, path: String,
      rules: Seq[Expectations.Rule],
      quarantine: Option[String] = None,
      txnId: Option[String] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Long = {
    require(rules.nonEmpty, "appendChecked without rules is append")
    txnId.flatMap(txnCommittedAt(path, _)).foreach(return _)
    val spark = df.sparkSession
    val tok = newToken()
    val staged = s"b0_${tok}_chk" // version-less name: never committed as-is
    toStored(df, path).write.mode("overwrite").parquet(s"$path/data/$staged")
    // rules speak the table's LOGICAL names; the staged bytes are
    // physical — validate (and split) under the logical view, commit
    // under the stored names
    val written = graft.catalog.GraftCatalogs.logicalView(
      spark.read.parquet(s"$path/data/$staged"), path)
    val report = Expectations.validate(written, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val failed = report.filter(_._2 > 0)
    def commitDir(dir: String): Long = {
      assertKeysNonNull(spark, path, s"$path/data/$dir", Nil,
        "appendChecked")
      writeBloomSidecar(spark, s"$path/data/$dir",
        storedCols(path, bloomCols))
      val entry = dir + statsSuffix(spark, s"$path/data/$dir",
        storedCols(path, statsCols))
      val next = latestVersion(path).getOrElse(0L) + 1
      val prev = if (next == 1) Seq.empty else manifestEntries(path, next - 1)
      commitManifest(path, next,
        txnId.map(t => s"#txn=$t").toSeq ++ prev :+ entry)
      next
    }
    if (failed.isEmpty) return commitDir(staged)
    quarantine match {
      case None =>
        throw new IllegalStateException(
          "appendChecked refused: " + failed.toSeq.sorted
            .map { case (r, n) => s"$r ($n rows)" }.mkString(", ") +
            s"; the staged dir $staged is an orphan for vacuum")
      case Some(dlq) =>
        val unique = failed.keys.filter(_.startsWith("unique:"))
        if (unique.nonEmpty)
          throw new IllegalStateException(
            "appendChecked refused: " + unique.mkString(", ") +
              " violated — a duplicate is not attributable to a row, " +
              "so quarantine cannot split it")
        // row-local violation flag, null-safe: a rule FAILS the row
        // when its predicate does not definitely hold. Scalar rules
        // fold into one expression; each InReference adds a broadcast
        // ref-key join marking rows whose key misses the reference.
        val refRules = rules.collect {
          case r: Expectations.InReference => r }
        val scalarViol = rules.collect {
          case Expectations.NotNull(c) => col(c).isNull
          case Expectations.Check(_, p) => !coalesce(p, lit(false))
        }
        var marked = written.withColumn("__viol",
          scalarViol.reduceOption(_ || _).getOrElse(lit(false)))
        refRules.foreach { r =>
          val refKeys = r.ref.select(col(r.refColumn).as(r.column)).distinct()
          val hit = marked.join(org.apache.spark.sql.functions
            .broadcast(refKeys.withColumn("__ref_hit", lit(true))),
            Seq(r.column), "left")
          marked = hit.withColumn("__viol",
            col("__viol") ||
              (col(r.column).isNotNull && col("__ref_hit").isNull))
            .drop("__ref_hit")
        }
        val validDir = s"b0_${newToken()}_ok"
        toStored(marked.filter(!col("__viol")).drop("__viol"), path)
          .write.mode("overwrite").parquet(s"$path/data/$validDir")
        // the split spans TWO tables, so it cannot be one rename: the
        // DLQ commits first under a derived txn id — a caller that
        // passes `txnId` and replays after a crash between the two
        // commits no-ops on BOTH sides (its own guard covers this
        // table); without a txnId the DLQ leg is at-least-once, and
        // this ordering at least guarantees no quarantined row is
        // ever lost
        append(marked.filter(col("__viol")).drop("__viol"), dlq,
          txnId = txnId.map(t => s"$t-dlq"))
        commitDir(validDir) // staged dir becomes a vacuum orphan
    }
  }

  /** MERGE-ON-READ delete: commit the keys as a tombstone batch — no
    * data file is rewritten; `readAt` anti-joins PRIOR batches'
    * rows against the tombstone. Deletion is itself versioned (time
    * travel BEFORE the delete still sees the rows — spec-proven), it
    * only affects rows that existed at delete time (a later
    * re-append of the same key is visible — spec-proven), and
    * compaction folds tombstones in without changing any reader's
    * view.
    */
  def deleteKeys(keys: DataFrame, keyCol: String, path: String,
      txnId: Option[String] = None): Long =
    deleteKeysMulti(keys, Seq(keyCol), path, txnId)

  /** [[deleteKeys]] under a COMPOSITE key — the reference's own data
    * model (sync_runs, experiments, file_inventory all key on two
    * columns; `agf_ingestion_lambda.py:229,303,337`): the tombstone
    * batch carries ALL key columns and readers anti-join on the full
    * column set, so a (k1, k2) delete retires exactly the rows
    * matching both — never every row sharing one component.
    */
  def deleteKeysMulti(keys: DataFrame, keyCols: Seq[String], path: String,
      txnId: Option[String] = None): Long = {
    require(keyCols.nonEmpty, "deleteKeys needs at least one key column")
    val latest = latestVersion(path)
    require(latest.nonEmpty, s"cannot delete from empty table $path")
    txnId.flatMap(txnCommittedAt(path, _)).foreach(return _)
    // caller-facing key names translate to the stored physical ones
    // (tombstones anti-join against physical batch columns)
    val phys = storedCols(path, keyCols)
    val next = latest.get + 1
    val prev = manifestEntries(path, next - 1)
    val batch = s"b${next}_${newToken()}"
    keys.select(keyCols.zip(phys).map { case (l, p) =>
        keys(l).as(p) }: _*).distinct()
      .write.mode("overwrite").parquet(s"$path/data/$batch")
    commitManifest(path, next,
      txnId.map(t => s"#txn=$t").toSeq ++ prev :+ s"~$batch")
    next
  }

  /** MERGE (upsert) as ONE atomic commit: a tombstone for `df`'s keys
    * followed by `df` itself in the same manifest — the tombstone's
    * position-scoping deletes only PRIOR rows of matched keys, so the
    * new rows survive their own commit. This is the engine's J4
    * last-writer-wins parity on the versioned table: matched keys are
    * replaced, unmatched keys are inserted, and a reader can never
    * observe the deletion without the insertion (both ride the same
    * manifest rename — spec-proven).
    *
    * `insertOnly = true` gives J3 insert-if-absent instead: rows whose
    * key already exists in the current view are dropped (existing
    * rows win) and no tombstone is committed. This reads the current
    * view once for the anti-join — the same price Delta MERGE pays to
    * match the target.
    *
    * `txnId`: same replay-idempotence guard as [[append]].
    */
  def upsert(df: DataFrame, keyCol: String, path: String,
      txnId: Option[String] = None, insertOnly: Boolean = false,
      bloomCols: Seq[String] = Nil): Long =
    upsertRetrying(df, Seq(keyCol), path, txnId, insertOnly, bloomCols,
      maxRetries = 0, _ => ())

  /** [[upsert]] under a COMPOSITE key: matched means equal on EVERY
    * key column, the tombstone carries all of them, and the
    * insert-if-absent anti-join runs on the full set. Same atomic
    * one-manifest commit and OCC semantics as the single-key form.
    */
  def upsertMulti(df: DataFrame, keyCols: Seq[String], path: String,
      txnId: Option[String] = None, insertOnly: Boolean = false,
      bloomCols: Seq[String] = Nil, maxRetries: Int = 0): Long =
    upsertRetrying(df, keyCols, path, txnId, insertOnly, bloomCols,
      maxRetries, _ => ())

  /** Optimistic-concurrency MERGE — [[upsert]] that survives
    * interleaved commits, with the conflict analysis each mode
    * actually needs (Delta's write-write rules, specialized to
    * key-literal merges):
    *
    *  - **last-writer-wins** (`insertOnly = false`): the commit is
    *    retried BLINDLY, and that is provably serializable — our
    *    tombstone position-scopes over the interleaved batches too,
    *    so the outcome equals the serial order "them, then us" for
    *    our keys, and interleaved commits' other keys are untouched;
    *  - **insert-if-absent** (`insertOnly = true`): the anti-join was
    *    computed against the START snapshot, so an interleaved
    *    commit that inserted one of OUR keys would leave a duplicate
    *    (no serial order produces one). On conflict the retry probes
    *    the interleaved commits (Bloom-pruned where sidecars exist)
    *    and, only when they might hold our keys, REWRITES the
    *    pending batch anti-joined against the POSITION-SCOPED view
    *    of the interleaved entries — tombstones applied, so a key
    *    the interleave inserted and then deleted does NOT suppress
    *    our insert (it does not exist at our commit time). Their
    *    surviving row wins, ours drops: the serial order "them, then
    *    us" per key. The rewrite goes to a fresh dir; the orphan is
    *    vacuum-reclaimed, committed data is never mutated.
    *    Serializability scope, stated honestly: the guarantee is
    *    PER KEY. One edge mixes orders across keys — an interleaved
    *    DELETE of a key that existed in our start snapshot and that
    *    our batch also carries: the snapshot-time anti-join already
    *    dropped our row (the outcome of the serial order "us, then
    *    them" for that key), and the dropped row is not recoverable
    *    without re-executing the caller's plan, which this method
    *    never does. Every per-key outcome still equals a legal
    *    serial order of the two commits; no duplicates, no lost
    *    interleaved rows.
    *
    * Batch dirs are written once against the snapshot; retries re-pay
    * only the KB-sized manifest commit (plus the insert-only conflict
    * probe). Bounded by `maxRetries`, loud failure after.
    */
  def upsertWithRetry(df: DataFrame, keyCol: String, path: String,
      txnId: Option[String] = None, insertOnly: Boolean = false,
      bloomCols: Seq[String] = Nil, maxRetries: Int = 3): Long =
    upsertRetrying(df, Seq(keyCol), path, txnId, insertOnly, bloomCols,
      maxRetries, _ => ())

  private[graft] def upsertRetrying(df: DataFrame, keyCols: Seq[String],
      path: String, txnId: Option[String], insertOnly: Boolean,
      bloomCols: Seq[String], maxRetries: Int,
      beforeCommit: Long => Unit): Long = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    // caller speaks the table's logical names; storage (batches,
    // tombstones, sidecars, the anti-join scans below) is physical
    upsertRetryingStored(toStored(df, path), storedCols(path, keyCols),
      path, txnId, insertOnly, storedCols(path, bloomCols), maxRetries,
      beforeCommit)
  }

  private def upsertRetryingStored(df: DataFrame, keyCols: Seq[String],
      path: String, txnId: Option[String], insertOnly: Boolean,
      bloomCols: Seq[String], maxRetries: Int,
      beforeCommit: Long => Unit): Long = {
    txnId.flatMap(txnCommittedAt(path, _)).foreach(return _)
    val spark = df.sparkSession
    val snapshot = latestVersion(path).getOrElse(0L)
    val tok = newToken()
    var dataBatch = s"b${snapshot + 1}_${tok}_m"
    val tombBatch = s"b${snapshot + 1}_${tok}_k"
    val withTomb = !insertOnly && snapshot > 0
    if (insertOnly && snapshot > 0) {
      // insert-if-absent existence check, Bloom-pruned: batches whose
      // sidecar proves they hold none of the incoming keys never
      // enter the anti-join scan (no false negatives -> identical
      // result, spec-proven); sidecar-less batches always scan.
      // Composite keys probe the FULL tuple where sidecars carry the
      // composite lane, the first component elsewhere (both sound
      // supersets); the anti-join below is on the full set
      val cand = bloomCandidateDirsMulti(spark, path,
        manifestEntries(path, snapshot).filterNot(isTombstone).map(dirOf),
        keyCols, df.select(keyCols.map(col): _*))
      val current = readAtFiltered(spark, path, snapshot,
        mergeSchema = false, e => cand.contains(dirOf(e)))
      df.join(current.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
        .write.mode("overwrite").parquet(s"$path/data/$dataBatch")
    } else {
      df.write.mode("overwrite").parquet(s"$path/data/$dataBatch")
    }
    assertKeysNonNull(spark, path, s"$path/data/$dataBatch", Nil, "upsert")
    writeBloomSidecar(spark, s"$path/data/$dataBatch", bloomCols)
    if (withTomb)
      // tombstone BEFORE the data batch in the manifest:
      // position-scoping makes it apply to prior batches only, never
      // to the rows it rides with; composite keys ride ALL columns
      df.select(keyCols.map(df(_)): _*).distinct()
        .write.mode("overwrite").parquet(s"$path/data/$tombBatch")
    val snapDirs =
      if (snapshot == 0) Set.empty[String]
      else manifestEntries(path, snapshot).toSet
    var attempt = 0
    while (true) {
      val next = latestVersion(path).getOrElse(0L) + 1
      val prev =
        if (next == 1) Seq.empty
        else manifestEntries(path, next - 1)
      if (insertOnly && next != snapshot + 1) {
        // commits interleaved since the snapshot: their data batches
        // may hold keys our snapshot-time anti-join could not see.
        // The entry SUBSEQUENCE (tombstones included, order kept) is
        // what matters: a key the interleave inserted and then
        // deleted is NOT an existing key at our commit time, so the
        // rewrite anti-joins against the POSITION-SCOPED view of the
        // interleaved entries, not their raw data dirs — our insert
        // of such a key survives (spec-proven)
        val interleavedEntries = prev.filterNot(snapDirs)
        val interleavedData = interleavedEntries.filterNot(isTombstone)
          .map(dirOf)
        if (interleavedData.nonEmpty) {
          val mine = spark.read.parquet(s"$path/data/$dataBatch")
          val cand = bloomCandidateDirsMulti(spark, path, interleavedData,
            keyCols, mine.select(keyCols.map(col): _*))
          val theirAlive = viewOf(spark, path, interleavedEntries,
            mergeSchema = true, e => cand.contains(dirOf(e)))
          theirAlive.foreach { alive =>
            val theirKeys = alive.select(keyCols.map(col): _*).distinct()
            val rewritten = s"b${next}_${newToken()}_m"
            mine.join(theirKeys, keyCols, "left_anti")
              .write.mode("overwrite").parquet(s"$path/data/$rewritten")
            writeBloomSidecar(spark, s"$path/data/$rewritten", bloomCols)
            dataBatch = rewritten // the old dir is a vacuum orphan
          }
        }
      }
      beforeCommit(next)
      try {
        commitManifest(path, next,
          txnId.map(t => s"#txn=$t").toSeq ++ prev ++
            (if (withTomb) Seq(s"~$tombBatch", dataBatch)
             else Seq(dataBatch)))
        return next
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("already committed") &&
              attempt < maxRetries =>
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** GENERALIZED MERGE COMMIT — the primitive under conditional SQL
    * MERGE (WHEN MATCHED [AND p] THEN UPDATE/DELETE, WHEN NOT MATCHED
    * [AND p] THEN INSERT): one atomic manifest publishing a tombstone
    * for `data`'s keys UNION `deleteKeys` followed by `data` itself —
    * position-scoping keeps the new rows alive through their own
    * commit, exactly like [[upsert]], while the extra delete keys
    * retire matched-and-DELETEd rows in the SAME rename. Either side
    * may be absent: data-only degenerates to upsert, deleteKeys-only
    * to a pure delete commit; both absent is a no-op returning the
    * current version (a MERGE whose clauses matched nothing commits
    * nothing).
    *
    * Concurrency contract, stated honestly: this is a SINGLE commit
    * attempt — a version conflict throws rather than blind-retrying,
    * because the caller computed `data`/`deleteKeys` from a snapshot
    * whose conditional clauses must be RE-EVALUATED against the new
    * latest for serializability (the read-modify-write loop in
    * [[graft.sql.GraftMergeIntoCommand]] does exactly that; blind
    * manifest retry is only sound for the unconditional
    * last-writer-wins form, which [[upsertWithRetry]] serves).
    *
    * `expectedSnapshot` pins the commit to the CALLER's snapshot
    * read (`Some(0)` = the caller saw an empty table): the commit
    * lands at exactly `expectedSnapshot + 1`, so ANY commit that
    * interleaved after the caller's read — including the window
    * spanning the caller's own read-modify-write jobs — hits the
    * exclusive manifest create and throws, never silently absorbing
    * clauses evaluated against a stale view. Without it the snapshot
    * is re-read here, which is only sound when the caller holds no
    * earlier read (the direct Scala-API uses).
    */
  def upsertWithDeletes(data: Option[DataFrame],
      deleteKeys: Option[DataFrame], keyCol: String, path: String,
      txnId: Option[String] = None,
      expectedSnapshot: Option[Long] = None): Long =
    upsertWithDeletesHooked(data, deleteKeys, Seq(keyCol), path, txnId,
      _ => (), expectedSnapshot)

  /** [[upsertWithDeletes]] under a COMPOSITE key — what a SQL MERGE
    * over a multi-column-PK table (the reference's file_inventory
    * shape) commits through: the single tombstone batch carries ALL
    * key columns of updated, deleted, and inserted rows.
    */
  def upsertWithDeletesMulti(data: Option[DataFrame],
      deleteKeys: Option[DataFrame], keyCols: Seq[String], path: String,
      txnId: Option[String] = None,
      expectedSnapshot: Option[Long] = None): Long =
    upsertWithDeletesHooked(data, deleteKeys, keyCols, path, txnId,
      _ => (), expectedSnapshot)

  /** Test seam: `beforeCommit(version)` runs between the snapshot
    * read-modify-write and the commit, so a spec can inject a
    * deterministic competing commit and prove the conflict contract.
    */
  private[graft] def upsertWithDeletesHooked(data: Option[DataFrame],
      deleteKeys: Option[DataFrame], keyCols: Seq[String], path: String,
      txnId: Option[String], beforeCommit: Long => Unit,
      expectedSnapshot: Option[Long] = None): Long = {
    require(keyCols.nonEmpty, "upsertWithDeletes needs key columns")
    // caller speaks logical names; the committed batches are physical
    upsertWithDeletesStored(data.map(toStored(_, path)),
      deleteKeys.map(toStored(_, path)), storedCols(path, keyCols), path,
      txnId, beforeCommit, expectedSnapshot)
  }

  private def upsertWithDeletesStored(data: Option[DataFrame],
      deleteKeys: Option[DataFrame], keyCols: Seq[String], path: String,
      txnId: Option[String], beforeCommit: Long => Unit,
      expectedSnapshot: Option[Long]): Long = {
    txnId.flatMap(txnCommittedAt(path, _)).foreach(return _)
    val snapshot = expectedSnapshot.getOrElse(
      latestVersion(path).getOrElse(0L))
    val withTomb = snapshot > 0 && (data.nonEmpty || deleteKeys.nonEmpty)
    if (data.isEmpty && !withTomb) return snapshot // nothing to publish
    val next = snapshot + 1
    val tok = newToken()
    val dataBatch = s"b${next}_${tok}_m"
    val tombBatch = s"b${next}_${tok}_k"
    data.foreach { d =>
      d.write.mode("overwrite").parquet(s"$path/data/$dataBatch")
      assertKeysNonNull(d.sparkSession, path, s"$path/data/$dataBatch", Nil,
        "upsert")
    }
    if (withTomb) {
      (data.map(_.select(keyCols.map(col): _*)).toSeq ++
        deleteKeys.map(_.select(keyCols.map(col): _*)).toSeq)
        .reduce(_ unionByName _).distinct()
        .write.mode("overwrite").parquet(s"$path/data/$tombBatch")
    }
    val prev = if (snapshot == 0) Seq.empty else manifestEntries(path, snapshot)
    val entries = (if (withTomb) Seq(s"~$tombBatch") else Seq.empty) ++
      data.map(_ => dataBatch).toSeq
    beforeCommit(next)
    commitManifest(path, next,
      txnId.map(t => s"#txn=$t").toSeq ++ prev ++ entries)
    next
  }

  /** The commit primitive under Spark's NATIVE row-level operations
    * ([[graft.catalog.GraftDeltaBatchWrite]]): executors have already
    * written `dataDir` (inserted + updated rows) and `tombDir` (the
    * rowIds of deleted + updated rows, all key columns) directly;
    * this publishes them as ONE manifest — tombstone before data, so
    * position scoping retires old rows while the new rows survive
    * their own commit. Pinned to the operation's snapshot read
    * (commit at exactly snapshot + 1): any interleaved commit hits
    * the exclusive manifest create and throws — the native route is
    * a SINGLE attempt whose clauses were evaluated against the
    * pinned snapshot, so absorbing an interleave would violate
    * serializability (the same contract as [[upsertWithDeletes]]
    * with `expectedSnapshot`).
    */
  private[graft] def commitDelta(path: String, snapshot: Long,
      dataDir: Option[String], tombDir: Option[String],
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      dataFiles: Seq[String] = Nil, tombFiles: Seq[String] = Nil): Long = {
    require(dataDir.nonEmpty || tombDir.nonEmpty,
      "commitDelta with nothing to publish")
    val prev = if (snapshot == 0) Seq.empty else manifestEntries(path, snapshot)
    // the index layer follows EVERY write path: a table declaring
    // statscols/bloomcols gets its delta batches indexed exactly like
    // catalog INSERT commits — otherwise native MERGE/UPDATE batches
    // would silently degrade pruning until the next OPTIMIZE
    val dataEntry = dataDir.map { d =>
      val spark = SparkSession.active
      assertKeysNonNull(spark, path, s"$path/data/$d", dataFiles,
        "row-level write")
      writeBloomSidecar(spark, s"$path/data/$d", bloomCols)
      // the FILE-LEVEL manifest ([[filesSegment]]): delta writers
      // stream directly (no Hadoop commit protocol), so the entry
      // names exactly the files committed tasks reported — a zombie
      // attempt flushing after the driver's prune can never become
      // table content. Stats/bloom read the dir (a stray could only
      // WIDEN an envelope or add bloom bits — both sound).
      d + statsSuffix(spark, s"$path/data/$d", statsCols) +
        filesSegment(dataFiles)
    }
    val tombEntry = tombDir.map(t => "~" + t + filesSegment(tombFiles))
    commitManifest(path, snapshot + 1,
      prev ++ tombEntry.toSeq ++ dataEntry.toSeq)
    snapshot + 1
  }

  /** Read the table as of `version`. Data batches are anti-joined
    * against ONLY the tombstone batches committed after them
    * (position-scoped merge-on-read): consecutive data batches with
    * the same applicable tombstone set share one scan and one
    * anti-join, so the plan stays one scan + one join in the common
    * append-heavy case. `mergeSchema` unions the batch schemas
    * (schema EVOLUTION across versions: batches written before a
    * column existed read back NULL-filled under the merged schema —
    * the add-a-column migration with zero rewrites).
    */
  /** [[readAt]] and friends are MAPPING-AWARE (round 16): when the
    * path carries catalog metadata whose schema epoch for `version`
    * activates column mapping (a RENAME/DROP COLUMN happened), the
    * physical-named scan is aliased to the epoch's LOGICAL names and
    * retired (`__dropped`) physical columns are projected away — so a
    * path-level read of a renamed table returns exactly what the
    * catalog's `VERSION AS OF` does, and a dropped column's stale
    * parquet values can never leak through the path API. The aliasing
    * is a bare Project (filters still reach PushedFilters). Identity
    * — zero extra plan nodes — for tables without metadata or
    * mapping; the epoch probe is one KB-sized directory listing.
    * Internal machinery that REWRITES batches (compaction, upserts,
    * change-feed plumbing) reads the `…Physical` variants: batches
    * always store physical names.
    */
  def readAt(spark: SparkSession, path: String, version: Long,
      mergeSchema: Boolean = false): DataFrame =
    graft.catalog.ColumnMapping.toLogicalAt(
      readAtPhysical(spark, path, version, mergeSchema), path, version)

  /** The storage view of `version`: physical parquet column names,
    * retired columns included — what batch-rewriting machinery and
    * physical-level tools read. Same merge-on-read semantics as
    * [[readAt]].
    */
  private[graft] def readAtPhysical(spark: SparkSession, path: String,
      version: Long, mergeSchema: Boolean = false): DataFrame =
    readAtFiltered(spark, path, version, mergeSchema, _ => true)

  /** [[readAt]] restricted to data batches whose recorded min/max
    * stats for `pruneCol` (see [[append]]'s `statsCols`) intersect
    * [lo, hi] — MANIFEST-LEVEL data skipping: non-matching batches
    * are dropped before any file (or footer) is opened, from stats
    * held in the KB-sized manifest alone. Batches carrying no stats
    * for the column are never pruned (no stats = no claim), so the
    * result is always a SUPERSET of the rows matching the range —
    * the caller applies its own filter on top, exactly like parquet
    * row-group skipping. At 100 TB with date-keyed batch commits, a
    * one-month query opens one month's batches.
    */
  def readAtPruned(spark: SparkSession, path: String, version: Long,
      pruneCol: String, lo: Long, hi: Long,
      mergeSchema: Boolean = false): DataFrame = {
    // manifest stats are recorded under PHYSICAL names; the caller
    // speaks logical ones
    val phys = graft.catalog.ColumnMapping
      .colsToPhysicalAtVersion(path, version, Seq(pruneCol)).head
    graft.catalog.ColumnMapping.toLogicalAt(
      readAtFiltered(spark, path, version, mergeSchema, { e =>
        statsOf(e).get(phys).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }), path, version)
  }

  /** [[readAt]] whose scans carry the manifest's per-batch min/max
    * stats as a read option, so ANY `.filter` the caller composes on
    * top prunes batches automatically at optimize time (the
    * [[graft.plans.VersionedStatsPruning]] rule, injected by
    * `GraftExtensions`) — [[readAtPruned]] without restating the
    * predicate as explicit bounds. Same merge-on-read semantics and
    * result as [[readAt]]; pruning never changes the answer, only
    * which batch dirs the scan opens.
    */
  def readAtAuto(spark: SparkSession, path: String, version: Long,
      mergeSchema: Boolean = false): DataFrame =
    graft.catalog.ColumnMapping.toLogicalAt(
      readAtAutoPhysical(spark, path, version, mergeSchema),
      path, version)

  private[graft] def readAtAutoPhysical(spark: SparkSession, path: String,
      version: Long, mergeSchema: Boolean = false): DataFrame =
    readAtFiltered(spark, path, version, mergeSchema, _ => true,
      auto = true)

  private def readAtFiltered(spark: SparkSession, path: String,
      version: Long, mergeSchema: Boolean,
      keep: String => Boolean, auto: Boolean = false): DataFrame = {
    val entries = manifestEntries(path, version)
    require(entries.exists(e => !isTombstone(e)),
      s"version $version of $path lists no data batches")
    viewOf(spark, path, entries, mergeSchema, keep, auto).getOrElse(
      // every batch pruned: an empty frame under the version's schema
      viewOf(spark, path, entries, mergeSchema, _ => true).get.limit(0))
  }

  /** The position-scoped merge-on-read view composed from an ordered
    * entry list; None when no data entry survives `keep`.
    */
  private def viewOf(spark: SparkSession, path: String,
      entries: Seq[String], mergeSchema: Boolean,
      keep: String => Boolean, auto: Boolean = false,
      explicitSchema: Option[org.apache.spark.sql.types.StructType] = None): Option[DataFrame] = {
    // dir -> raw `;col:min:max...` stats suffix, for the auto path
    val statsSuffixOf: Map[String, String] = entries.filterNot(isTombstone)
      .map { e =>
        val raw = e.stripPrefix("~").stripPrefix("=")
        val dir = raw.split(";").head
        dir -> raw.substring(dir.length)
      }.toMap
    // walk from the end accumulating the tombstones seen so far:
    // each data batch's applicable set = tombstones AFTER it.
    // FULL entries travel (not just dirs) so file-level manifests
    // reach both the data scans and the tombstone reads
    var tombsAfter = List.empty[String]
    val assigned = entries.reverse.flatMap { e =>
      if (isTombstone(e)) { tombsAfter ::= e.stripPrefix("~"); None }
      else if (keep(e)) Some(e -> tombsAfter)
      else None
    }.reverse
    if (assigned.isEmpty) return None
    val parts = assigned.groupBy(_._2).toSeq.map { case (tombEntries, pairs) =>
      val reader = explicitSchema match {
        // widened read: every scan shares one explicit schema (the
        // parquet reader promotes narrower stored types natively)
        case Some(sch) => spark.read.schema(sch)
        case None => spark.read.option("mergeSchema", mergeSchema.toString)
      }
      val tagged =
        if (!auto) reader
        else reader.option(graft.plans.VersionedStatsPruning.StatsOption,
          graft.plans.VersionedStatsPruning.encode(
            pairs.map { pr =>
              val dir = dirOf(pr._1)
              dir -> statsSuffixOf.getOrElse(dir, "")
            }))
      val live = tagged.parquet(pairs.flatMap(pr => scanPaths(path, pr._1)): _*)
      applyTombstones(spark, path, live, tombEntries)
    }
    Some(parts.reduce((a, b) =>
      a.unionByName(b, allowMissingColumns = mergeSchema)))
  }

  /** Anti-join `live` against each distinct key column among the
    * applicable tombstone batches (typically one; compaction folds
    * them away). Tombstone schema reads are footer-only and bounded
    * by the manifest's batch count. `tombEntries` are full manifest
    * entries (prefix stripped), so file-level manifests scope the
    * tombstone reads exactly like data reads.
    */
  private def applyTombstones(spark: SparkSession, path: String,
      live: DataFrame, tombEntries: Seq[String]): DataFrame =
    if (tombEntries.isEmpty) live
    else {
      // grouped by the tombstone's FULL column list: a composite-key
      // tombstone (k1, k2) anti-joins on both columns — deleting only
      // rows matching the whole key — while single-column tombstones
      // keep their original plan shape
      val byKey = tombEntries
        .map(e => spark.read.parquet(scanPaths(path, e): _*))
        .groupBy(_.columns.toList)
      byKey.toSeq.foldLeft(live) { case (acc, (keyCols, frames)) =>
        keyCols.foreach(c => require(acc.columns.contains(c),
          s"tombstone key column $c absent from the data schema"))
        val keys = frames.map(_.select(keyCols.map(col): _*))
          .reduce(_ union _).distinct()
        acc.join(keys, keyCols, "left_anti")
      }
    }

  /** The widening rules a zero-rewrite migration may rely on — the
    * Delta type-widening matrix, restricted to LOSSLESS promotions
    * Spark's vectorized parquet reader serves natively (SPARK-40876):
    * byte/short/int -> long along the integral chain, float -> double,
    * byte/short/int -> double, and decimal(p,s) -> decimal(p',s')
    * growing both scale and integer digits. Everything else refuses
    * loudly: long -> double and int -> float are LOSSY (large longs
    * do not round-trip), narrowing reads silently truncate, and a
    * string/numeric mix means the column changed meaning, not width.
    * A rename is indistinguishable from drop+add by construction
    * (parquet has no column identity here) — both sides read back
    * NULL-filled, exactly like [[readAt]]'s mergeSchema add-column
    * contract.
    */
  private[graft] def widenType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    def rank(t: DataType): Option[Int] = t match {
      case ByteType => Some(0); case ShortType => Some(1)
      case IntegerType => Some(2); case LongType => Some(3)
      case _ => None
    }
    if (a == b) return a
    (a, b) match {
      case _ if rank(a).nonEmpty && rank(b).nonEmpty =>
        if (rank(a).get >= rank(b).get) a else b
      case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
      case (ByteType | ShortType | IntegerType, DoubleType) => DoubleType
      case (DoubleType, ByteType | ShortType | IntegerType) => DoubleType
      case (d1: DecimalType, d2: DecimalType) =>
        val scale = math.max(d1.scale, d2.scale)
        val intDigits = math.max(d1.precision - d1.scale,
          d2.precision - d2.scale)
        if (intDigits + scale > DecimalType.MAX_PRECISION)
          throw new IllegalStateException(
            s"readAtWidened: decimal($d1, $d2) cannot widen without " +
              s"exceeding precision ${DecimalType.MAX_PRECISION}")
        DecimalType(intDigits + scale, scale)
      case (s1: StructType, s2: StructType) =>
        // nested add/drop across batches: union BY NAME (a field one
        // side lacks null-fills on read — the same zero-rewrite
        // contract as top-level columns), shared fields widen
        // recursively. s1's order leads, s2-only fields append.
        val extra = s2.fields.filterNot(f2 =>
          s1.fieldNames.exists(_.equalsIgnoreCase(f2.name)))
        StructType((s1.fields.map { f1 =>
          s2.fields.find(_.name.equalsIgnoreCase(f1.name)) match {
            case Some(f2) => StructField(f1.name,
              widenType(f1.dataType, f2.dataType), nullable = true,
              Metadata.empty)
            case None => f1.copy(nullable = true, metadata = Metadata.empty)
          }
        } ++ extra.map(_.copy(nullable = true, metadata = Metadata.empty)))
          .toSeq)
      case (a1: ArrayType, a2: ArrayType) =>
        ArrayType(widenType(a1.elementType, a2.elementType),
          a1.containsNull || a2.containsNull)
      case (m1: MapType, m2: MapType) =>
        MapType(widenType(m1.keyType, m2.keyType),
          widenType(m1.valueType, m2.valueType),
          m1.valueContainsNull || m2.valueContainsNull)
      case _ =>
        throw new IllegalStateException(
          s"readAtWidened refuses $a vs $b: not a lossless widening. " +
            "Supported: byte/short/int->long, float->double, " +
            "byte/short/int->double, decimal growth. Lossy promotions " +
            "(long->double), narrowings, and type changes need an " +
            "explicit rewrite — this engine never degrades silently")
    }
  }

  /** [[readAt]] under TYPE WIDENING — the other zero-rewrite schema
    * migration users expect beyond add-a-column (q140/q263): batches
    * written when a column was `int` read back as `long` (or
    * float->double, decimal growth) next to batches written after
    * the migration, with no data rewritten. The merged schema is the
    * field-by-field widening of every batch's footer schema
    * ([[widenType]]'s lossless matrix; incompatible pairs refuse
    * loudly — spec'd refusal legs); each scan then reads with the
    * widened schema explicitly, which Spark's vectorized parquet
    * reader serves natively, and columns absent from a batch
    * null-fill exactly like mergeSchema. Tombstones apply
    * position-scoped as always. Cost: footer schema reads bounded by
    * batch count, zero data movement — the migration IS the read.
    */
  def readAtWidened(spark: SparkSession, path: String,
      version: Long, auto: Boolean = false): DataFrame =
    graft.catalog.ColumnMapping.toLogicalAt(
      readAtWidenedPhysical(spark, path, version, auto), path, version)

  /** [[readAtWidened]] at the storage grain (physical names, retired
    * columns included) — what compaction and the catalog's content-
    * schema reconciliation read.
    */
  private[graft] def readAtWidenedPhysical(spark: SparkSession, path: String,
      version: Long, auto: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val entries = manifestEntries(path, version)
    require(entries.exists(e => !isTombstone(e)),
      s"version $version of $path lists no data batches")
    val schemas = entries.filterNot(isTombstone).map(e =>
      spark.read.parquet(scanPaths(path, e): _*).schema)
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    schemas.foreach(_.foreach { f =>
      fields.get(f.name) match {
        case None =>
          // absent from an earlier batch: null-filled there
          fields(f.name) = f.copy(nullable = true)
        case Some(prev) =>
          fields(f.name) = StructField(f.name,
            widenType(prev.dataType, f.dataType), nullable = true)
      }
    })
    val widened = StructType(fields.values.toSeq)
    // `auto` attaches the manifest stats option exactly like
    // readAtAuto: widening never changes a stats domain tag
    // (int batches keep integral 'l' stats; a long literal compares
    // in the same domain), so typed pruning composes with widening
    viewOf(spark, path, entries, mergeSchema = false, _ => true,
      auto = auto, explicitSchema = Some(widened)).get
  }

  /** [[readAt]] under an EXPLICIT schema — the catalog read: every
    * scan shares one declared schema, so batches written before an
    * ALTER TABLE ADD COLUMNS null-fill the new column, batches of
    * differing widths read deterministically (no file-pick-order
    * inference), and lossless type promotions serve natively
    * (SPARK-40876). Manifest-stats pruning stays attached (`auto`),
    * tombstones apply position-scoped as always.
    */
  def readAtWithSchema(spark: SparkSession, path: String, version: Long,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val entries = manifestEntries(path, version)
    require(entries.exists(e => !isTombstone(e)),
      s"version $version of $path lists no data batches")
    viewOf(spark, path, entries, mergeSchema = false, _ => true,
      auto = true, explicitSchema = Some(schema)).get
  }

  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    readAt(spark, path, v)
  }

  /** MAINTENANCE-COMMIT OCC — the Delta conflict rule for rewrites:
    * `entries` is the `=`-flagged rewrite of the content at
    * `snapshot`; if other commits landed since, the retry commits
    * `entries ++ <interleaved fresh entries, in order>` instead of
    * failing terminally with the staged rewrite orphaned. That merge
    * is content-exact for interleaved APPENDS, DELETES, and UPSERTS
    * alike — stronger than Delta's append-only rule, and it falls
    * out of position scoping: the snapshot's entries are replaced
    * in-place by our `=` batches (same content), and every
    * interleaved entry keeps its relative order AFTER them, so an
    * interleaved tombstone still deletes from exactly the rows it
    * deleted before (spec-proven per kind). The one refusal:
    * interleaved MAINTENANCE (another compaction/clustering removed
    * the snapshot's entries) — merging two rewrites would double
    * content, so it fails loudly and the caller reruns on the new
    * latest. Retries re-pay only the KB-sized manifest commit, never
    * the rewrite.
    */
  private[graft] def commitMaintenance(path: String, snapshot: Long,
      entries: Seq[String], maxRetries: Int,
      beforeCommit: Long => Unit = _ => ()): Long = {
    var attempt = 0
    while (true) {
      val next = latestVersion(path).getOrElse(0L) + 1
      val lines =
        if (next == snapshot + 1) entries
        else {
          val prev = manifestEntries(path, next - 1)
          val snapEntries = manifestEntries(path, snapshot)
          if (!snapEntries.forall(prev.contains))
            throw new java.io.IOException(
              "VersionedTable maintenance conflict: a concurrent commit " +
                s"removed batches this rewrite folded (another OPTIMIZE/" +
                s"clustering interleaved between v$snapshot and v${next - 1})" +
                "; refusing — rerun the maintenance against the new latest. " +
                "The staged rewrite dirs are orphans for vacuum")
          val snapSet = snapEntries.toSet
          entries ++ prev.filterNot(snapSet)
        }
      beforeCommit(next)
      try {
        commitManifest(path, next, lines)
        return next
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("already committed") &&
              attempt < maxRetries =>
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** Columns carrying min/max stats anywhere in `version`'s manifest —
    * what SQL OPTIMIZE re-records on the rewritten batch so a
    * maintenance pass never silently drops the index layer. One
    * KB-sized manifest read.
    */
  private[graft] def statsColumnsOf(path: String, version: Long): Seq[String] =
    manifestEntries(path, version)
      .flatMap(_.split(";").drop(1).map(_.split(":").head))
      // '@'-prefixed segments are non-stats suffixes (the `@files:`
      // file-level manifest) — mirroring statsOf, which keys on the
      // col:lo:hi shape, so OPTIMIZE never rebuilds a phantom
      // '@files' stats column
      .filterNot(_.startsWith("@"))
      .distinct

  /** Columns with a Bloom sidecar on any data batch of `version` —
    * the other half of the index layer OPTIMIZE preserves. Cost: one
    * KB-sized sidecar read per indexed batch, bounded by batch count.
    */
  private[graft] def bloomColumnsOf(spark: SparkSession, path: String,
      version: Long): Seq[String] = {
    val dirs = manifestEntries(path, version).filterNot(isTombstone).map(dirOf)
    val sidecars = dirs.flatMap(d => bloomSidecar(spark, path, d))
    if (sidecars.isEmpty) Seq.empty
    else sidecars.map(_.select(col("col")).distinct())
      .reduce(_ unionByName _).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Unabsorbed merge-on-read debt: the tombstone-entry count of the
    * latest manifest — what every read of the current version pays an
    * anti-join for, and exactly what q300 measures growing at a 3×
    * read slope under CDC apply. Metadata-only (one KB-sized manifest
    * read), zero at a freshly compacted table.
    */
  def tombstoneDebt(path: String): Int =
    latestVersion(path)
      .map(v => manifestEntries(path, v).count(isTombstone))
      .getOrElse(0)

  /** SELF-SCHEDULED maintenance — the q300/q301 teaching pair turned
    * into a knob: compact iff [[tombstoneDebt]] has reached
    * `tombstoneThreshold`. The gate is metadata-only, so consulting
    * it after every commit costs one manifest read; the compaction
    * itself commits `=`-flagged (invisible to change feeds) through
    * maintenance OCC. A CDC replica applying upserts through this
    * hook holds its read slope at ~1× without any manual OPTIMIZE
    * (spec-proven); the streaming sink exposes it as the
    * `autoCompactTombstones` option.
    */
  def maybeCompact(spark: SparkSession, path: String,
      tombstoneThreshold: Int, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Option[Long] =
    if (tombstoneDebt(path) >= tombstoneThreshold)
      Some(compact(spark, path, statsCols, bloomCols))
    else None

  /** Compaction (OPTIMIZE): rewrite the CURRENT content — tombstones
    * folded in — as one batch and commit it as a new version whose
    * manifest references only that batch, flagged `=` (dataChange =
    * false): readers of the new version stop paying the merge-on-read
    * anti-join and the many-batch scan, and [[readChanges]] skips the
    * batch entirely, so an incremental consumer checkpointed before
    * the compaction is never re-delivered the whole table. Prior
    * versions stay time-travelable until vacuum reclaims them.
    * Content-identical by construction (the new batch IS readAt of
    * the old latest), spec-asserted. Commits through
    * [[commitMaintenance]]: interleaved appends/deletes/upserts
    * retry with their entries appended (content preserved); an
    * interleaved compaction refuses loudly.
    */
  def compact(spark: SparkSession, path: String,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      maxRetries: Int = 3): Long = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"nothing to compact at $path"))
    val batch = s"b${v + 1}_${newToken()}"
    // the rewrite reads under the WIDENED union schema (footer-union,
    // lossless type promotion): over mixed-width batches — an ALTER
    // ADD COLUMNS backfill, or path-API schema evolution — a plain
    // mergeSchema=false read would pick ONE file's schema in listing
    // order and the compaction would silently drop columns; identical
    // result on homogeneous tables
    readAtWidenedPhysical(spark, path, v)
      .write.mode("overwrite").parquet(s"$path/data/$batch")
    // maintenance must not strip the index layer: stats and Bloom
    // sidecars are REBUILT for the rewritten batch on request (the
    // rewrite changes batch composition, so carrying old entries
    // forward would be wrong — rebuild is the only honest path)
    writeBloomSidecar(spark, s"$path/data/$batch", bloomCols)
    commitMaintenance(path, v,
      Seq("=" + batch + statsSuffix(spark, s"$path/data/$batch", statsCols)),
      maxRetries)
  }

  /** CLUSTERING compaction (OPTIMIZE ZORDER-lite): rewrite the
    * current content RANGE-BUCKETED on `rangeCol` — numeric, date,
    * timestamp (via the numeric shadow) or STRING (via
    * [[stringBoundaries]]' globalRank rank space, bounds under binary
    * UTF8 order, pruned by the `@s` typed prefix stats) — one write
    * pass partitioned into `nBuckets` exact-quantile
    * ranges, committed as `nBuckets` manifest entries, each flagged
    * `=` (dataChange = false, invisible to the change feed) and each
    * carrying its own tight min/max stats. Where [[compact]] retires
    * the merge-on-read cost, this ALSO restores data skipping after
    * churn: appends arrive in arrival order with whatever stats they
    * came with, and the clustering pass re-sorts the table so a
    * [[readAtPruned]] range query opens ~1/nBuckets of the data
    * again — the maintenance loop a 100 TB date-queried table runs.
    * Content-identical by construction (the buckets partition the
    * rows of readAt(latest)); rows with a NULL rangeCol land in
    * bucket 0 (no stats claim is violated: stats ignore nulls and
    * pruning keeps every bucket whose range intersects — callers
    * filtering on the column drop nulls anyway, and full reads see
    * every bucket).
    */
  /** A clustering column lifted into a quantile-able numeric shadow:
    * identity for numerics, epoch days for dates, epoch micros for
    * timestamps. Strings take the [[stringBoundaries]] rank-space
    * path instead (callers branch before reaching here — this guard
    * is the internal invariant, not a user refusal any more).
    */
  private def numericShadow(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(DateType) =>
        org.apache.spark.sql.functions
          .datediff(col(c), lit("1970-01-01")).cast("long")
      case Some(TimestampType) =>
        org.apache.spark.sql.functions.unix_micros(col(c))
      case Some(TimestampNTZType) =>
        // order-preserving shadow: NTZ wall clocks map to micros under
        // the session zone (UTC in this engine) — ANY monotone map
        // quantiles correctly; note NTZ columns record no manifest
        // stats (no claim), so clustering on them buys row-group
        // locality, not batch pruning — cast to DATE/TIMESTAMP for
        // prunable layouts
        org.apache.spark.sql.functions.unix_micros(
          col(c).cast(TimestampType))
      case Some(StringType) => throw new IllegalStateException(
        s"internal: string column $c must take the stringBoundaries " +
          "rank-space path, not the numeric shadow")
      case _ => col(c)
    }
  }

  private def isStringCol(df: DataFrame, c: String): Boolean =
    df.schema.find(_.name == c)
      .exists(_.dataType == org.apache.spark.sql.types.StringType)

  /** `k - 1` inclusive upper-boundary VALUES for clustering a STRING
    * column — the numeric rank space strings lack, built with the
    * [[Layout.globalRank]] discipline (q90/q150): the column's
    * DISTINCT values are globally ranked under Spark's binary UTF8
    * order (a distributed range-sort, never a one-partition window)
    * and the values at ranks i*n/k become bucket bounds. Only k-1
    * strings ever reach the driver.
    *
    * The trade, stated honestly: boundaries are VALUE-balanced, not
    * row-balanced — a single value carrying half the rows keeps its
    * bucket that big (it cannot be split without breaking the
    * bucket-range invariant stats pruning relies on). Deterministic
    * by construction: ranks are a pure function of the value order.
    * Bucket stats re-record through [[statsSuffix]]'s `@s` typed
    * prefix encoding, so a string range/prefix filter prunes the
    * clustered layout from plain literals.
    */
  private def stringBoundaries(df: DataFrame, c: String,
      k: Int): Seq[String] = {
    if (k <= 1) return Seq.empty
    val distinct = df.select(col(c)).filter(col(c).isNotNull).distinct()
    val n = distinct.count()
    if (n == 0) return Seq.empty
    val ranked = Layout.globalRank(distinct, Seq(col(c)), "__gr")
    val cutRanks = (1 until k).map(i => math.max(0L, i.toLong * n / k - 1))
    val byRank = ranked.filter(col("__gr").isin(cutRanks.distinct: _*))
      .select(col("__gr"), col(c))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cutRanks.map(byRank)
  }

  /** The bucket expression for one string clustering column: k ranges
    * under binary UTF8 order, NULLs to bucket 0 (same null rule as
    * the numeric path).
    */
  private def stringBucketExpr(c: String, bounds: Seq[String],
      k: Int): org.apache.spark.sql.Column =
    bounds.zipWithIndex.foldRight(
      org.apache.spark.sql.functions.lit((k - 1).toLong)) {
      case ((b, i), acc) =>
        org.apache.spark.sql.functions
          .when(col(c) <= lit(b) || col(c).isNull, i.toLong).otherwise(acc)
    }

  def compactByRange(spark: SparkSession, path: String, rangeCol: String,
      nBuckets: Int, bloomCols: Seq[String] = Nil,
      maxRetries: Int = 3): Long = {
    require(nBuckets >= 1, "need at least one bucket")
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"nothing to compact at $path"))
    val next = v + 1
    val parent = s"b${next}_${newToken()}"
    // widened union schema: see compact() — clustering must never
    // drop a column a narrower batch predates
    val base = readAtWidenedPhysical(spark, path, v)
    val bucketed =
      if (isStringCol(base, rangeCol)) {
        // strings cluster through the globalRank-derived boundary
        // values (no numeric shadow exists); stats re-record via the
        // @s typed prefix encoding, so string range/prefix filters
        // prune the clustered layout from plain literals
        base.withColumn("__rb",
          stringBucketExpr(rangeCol,
            stringBoundaries(base, rangeCol, nBuckets), nBuckets))
      } else {
        // typed columns (date/timestamp) bucket through their numeric
        // shadow; stats per bucket are re-recorded TYPED by
        // statsSuffix, so the clustered layout prunes from date
        // literals directly. Exact quantile boundaries (relativeError
        // 0), so bucketing is deterministic; ties collapse into the
        // lower bucket
        val content = base.withColumn("__rc", numericShadow(base, rangeCol))
        val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
        val bounds =
          if (nBuckets == 1) Array.empty[Double]
          else content.stat.approxQuantile("__rc", probs, 0.0)
        val bucketExpr = bounds.zipWithIndex.foldRight(
          org.apache.spark.sql.functions.lit(nBuckets - 1)) {
          case ((b, i), acc) =>
            org.apache.spark.sql.functions
              .when(col("__rc") <= b || col("__rc").isNull, i).otherwise(acc)
        }
        content.withColumn("__rb", bucketExpr).drop("__rc")
      }
    bucketed
      .repartition(col("__rb"))
      .write.mode("overwrite").partitionBy("__rb")
      .parquet(s"$path/data/$parent")
    // one entry per non-empty bucket, each with its own tight stats
    // (footer-light column-pruned aggregate per bucket dir)
    val (f, _) = fs(path)
    val bucketEntries = (0 until nBuckets).flatMap { i =>
      val dir = s"$parent/__rb=$i"
      if (!f.exists(new Path(s"$path/data/$dir"))) None
      else {
        writeBloomSidecar(spark, s"$path/data/$dir", bloomCols)
        Some("=" + dir + statsSuffix(spark, s"$path/data/$dir", Seq(rangeCol)))
      }
    }
    // a fully-empty table (everything deleted) produces no bucket
    // dirs; commit one empty batch so the manifest stays readable
    val entries =
      if (bucketEntries.nonEmpty) bucketEntries
      else {
        base.limit(0).write.mode("overwrite")
          .parquet(s"$path/data/${parent}_empty")
        Seq(s"=${parent}_empty")
      }
    commitMaintenance(path, v, entries, maxRetries)
  }

  /** TWO-DIMENSIONAL clustering compaction (OPTIMIZE ZORDER): rewrite
    * the current content ordered by the Morton interleave of the two
    * columns' QUANTILE-GRID cells — Delta's OPTIMIZE ZORDER shape
    * (range-partition ids per column, then bit interleave), built
    * from [[graft.operators.ZOrder.mortonCode]] on codegen'd
    * built-ins. Each column is first mapped to its 2^bits
    * exact-quantile bucket (rank space, so skew and negative values
    * cost nothing), the interleaved cell code is range-bucketed into
    * `nBuckets` commit dirs, and every bucket's manifest entry
    * carries tight min/max stats for BOTH columns.
    *
    * Why this beats [[compactByRange]] when queries filter on either
    * of two columns: a 1-D clustering gives one column ~1/nBuckets
    * skipping and leaves the other column's per-bucket range spanning
    * the whole domain (zero skipping). The z-layout bounds both
    * dimensions inside every bucket, so a single-column range filter
    * on EITHER column — via [[readAtPruned]] or just
    * `readAtAuto(...).filter` — opens a strict subset
    * (~sqrt-partitioned), the classic multi-dimensional zone-map
    * trade. Content-identical by construction; NULLs land in cell 0
    * of their dimension (stats ignore nulls; pruning keeps every
    * intersecting bucket).
    *
    * At 100 TB: both approxQuantile passes here use relativeError 0
    * for bit-exact determinism under the oracle; on a real cluster
    * pass 0.001 — boundaries only steer layout, never correctness.
    */
  def compactByZOrder(spark: SparkSession, path: String,
      xCol: String, yCol: String, nBuckets: Int, bits: Int = 4,
      bloomCols: Seq[String] = Nil): Long =
    compactByZOrderN(spark, path, Seq(xCol, yCol), nBuckets, bits, bloomCols)


  /** N-DIMENSIONAL clustering compaction — [[compactByZOrder]]
    * generalized to any number of columns via the round-robin Morton
    * interleave ([[graft.operators.ZOrder.mortonCodeN]]; bit-identical
    * to the 2-D code for n = 2, so the 2-D oracle is unchanged) and
    * to TYPED columns via the numeric shadow (a date x key x region
    * layout prunes on ANY of the three from plain typed literals —
    * the q282 measured-asymmetry discipline, n-wide). Each column
    * maps to its 2^bits exact-quantile rank cell; `bits * n` is
    * capped at 62 so the interleaved code fits a long. Every bucket
    * entry carries tight TYPED stats for ALL n columns. The n-D
    * trade is the classic one: per-dimension skipping weakens as n
    * grows (~(1/nBuckets)^(1/n) of the data per single-column
    * slice), which is why the cap is a design choice, not a limit to
    * engineer away.
    */
  def compactByZOrderN(spark: SparkSession, path: String,
      cols: Seq[String], nBuckets: Int, bits: Int = 4,
      bloomCols: Seq[String] = Nil, maxRetries: Int = 3): Long = {
    require(nBuckets >= 1, "need at least one bucket")
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * dims must fit a long: got $bits * ${cols.size}")
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"nothing to compact at $path"))
    val next = v + 1
    val parent = s"b${next}_${newToken()}"
    // widened union schema: see compact()
    val content = readAtWidenedPhysical(spark, path, v)
    val cells = 1 << bits
    // rank-space grid: exact-quantile cell boundaries per column,
    // computed over the column's numeric shadow (typed columns
    // quantile as epoch days/micros; identity for numerics)
    def cellExpr(c: String): org.apache.spark.sql.Column =
      if (isStringCol(content, c))
        // string dimensions grid through globalRank boundary values —
        // the same rank-space cells, no numeric shadow needed
        stringBucketExpr(c, stringBoundaries(content, c, cells), cells)
      else {
        val shadowed = content.withColumn("__sc", numericShadow(content, c))
        val probs = (1 until cells).map(_.toDouble / cells).toArray
        val bounds =
          if (cells == 1) Array.empty[Double]
          else shadowed.stat.approxQuantile("__sc", probs, 0.0)
        val sc = numericShadow(content, c)
        bounds.zipWithIndex.foldRight(
          org.apache.spark.sql.functions.lit((cells - 1).toLong)) {
          case ((b, i), acc) =>
            org.apache.spark.sql.functions
              .when(sc <= b || sc.isNull, i.toLong).otherwise(acc)
        }
      }
    val coded = content.withColumn("__z",
      ZOrder.mortonCodeN(cols.map(cellExpr), bits))
    // z cells -> nBuckets contiguous commit ranges, again by exact
    // quantile so buckets are row-balanced regardless of occupancy
    val zprobs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val zbounds =
      if (nBuckets == 1) Array.empty[Double]
      else coded.stat.approxQuantile("__z", zprobs, 0.0)
    val zbucket = zbounds.zipWithIndex.foldRight(
      org.apache.spark.sql.functions.lit(nBuckets - 1)) {
      case ((b, i), acc) =>
        org.apache.spark.sql.functions.when(col("__z") <= b, i).otherwise(acc)
    }
    coded.withColumn("__zb", zbucket).drop("__z")
      .repartition(col("__zb"))
      .write.mode("overwrite").partitionBy("__zb")
      .parquet(s"$path/data/$parent")
    val (f, _) = fs(path)
    val bucketEntries = (0 until nBuckets).flatMap { i =>
      val dir = s"$parent/__zb=$i"
      if (!f.exists(new Path(s"$path/data/$dir"))) None
      else {
        writeBloomSidecar(spark, s"$path/data/$dir", bloomCols)
        Some("=" + dir +
          statsSuffix(spark, s"$path/data/$dir", cols))
      }
    }
    val entries =
      if (bucketEntries.nonEmpty) bucketEntries
      else {
        content.limit(0).write.mode("overwrite")
          .parquet(s"$path/data/${parent}_empty")
        Seq(s"=${parent}_empty")
      }
    commitMaintenance(path, v, entries, maxRetries)
  }

  /** Incremental read — the consumer primitive versioning exists for
    * ("give me what's new since my checkpoint"), computed from
    * KB-sized control files only.
    *
    *   - `fromVersion = 0` is the INITIAL SNAPSHOT: the full view at
    *     `toVersion` (tombstones applied) — what a new consumer
    *     should seed from (the Delta streaming-source convention);
    *   - otherwise: exactly the data batches committed after
    *     `fromVersion`, EXCLUDING compaction batches (`=`,
    *     dataChange = false) — a consumer checkpointed before an
    *     OPTIMIZE sees zero re-delivered rows (spec- and
    *     driver-proven);
    *   - deletes are not delivered (this feed carries appended rows
    *     only; consumers needing delete propagation use
    *     [[readChangeFeed]], which tags every change).
    *
    * The fresh set is collected by a PER-COMMIT walk over the range's
    * manifests, exactly like [[readChangeFeed]] — NOT an endpoint set
    * difference, which would silently lose any batch appended inside
    * the range and folded away by a LATER in-range compaction
    * (checkpoint v1, append v2, compact v3: the v2 batch is absent
    * from v3's manifest but its rows were never delivered; the walk
    * picks it up at v2 and the `=` flag keeps the compaction itself
    * out — spec-proven, append-then-compact inside one consumer
    * interval). The batch dirs themselves outlive their manifest
    * presence until vacuum, so the read stays valid; consequently the
    * feed range is bounded by manifest AND batch retention, the same
    * contract as [[readChangeFeed]] — a vacuumed intermediate version
    * fails loudly at the manifest read.
    */
  def readChanges(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    if (fromVersion == 0) return readAtPhysical(spark, path, toVersion)
    val fresh = freshChangeEntries(path, fromVersion, toVersion)
    if (fresh.isEmpty)
      readAtPhysical(spark, path, toVersion).limit(0)
    else spark.read.parquet(fresh.flatMap(scanPaths(path, _)): _*)
  }

  /** The per-commit walk behind [[readChanges]], exposed so the
    * streaming source can footer-check each delivered batch's schema
    * BEFORE reading it (the schema-evolution contract): fresh
    * non-compaction data ENTRIES in (from, to] (full entries, so
    * file-level manifests scope the delivery), or — for `from = 0`,
    * the initial snapshot — the data entries of `to`'s manifest.
    */
  private[graft] def freshChangeEntries(path: String, fromVersion: Long,
      toVersion: Long): Seq[String] =
    if (fromVersion == 0)
      manifestEntries(path, toVersion).filterNot(isTombstone)
    else
      (fromVersion + 1 to toVersion).flatMap { v =>
        val prevDirs = manifestEntries(path, v - 1).map(dirOf).toSet
        manifestEntries(path, v)
          .filterNot(isTombstone)
          .filterNot(isCompaction)
          .filterNot(e => prevDirs.contains(dirOf(e)))
      }.distinct.sortBy(dirOf)

  /** [[readChanges]] under an EXPLICIT schema — the widened-stream
    * read: every delivered batch scans with `schema`, so batches
    * written before a lossless type migration (int epochs under a
    * long declaration) promote natively on scan (SPARK-40876) and
    * columns a batch predates null-fill. The caller is responsible
    * for having verified each batch WIDENS INTO `schema`
    * ([[widenType]]); a wider batch would mis-read — the streaming
    * source checks footers first and refuses loudly.
    */
  private[graft] def readChangesAs(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    if (fromVersion == 0) {
      val entries = manifestEntries(path, toVersion)
      return viewOf(spark, path, entries, mergeSchema = false, _ => true,
        explicitSchema = Some(schema)).getOrElse(
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema))
    }
    val fresh = freshChangeEntries(path, fromVersion, toVersion)
    if (fresh.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema)
      .parquet(fresh.flatMap(scanPaths(path, _)): _*)
  }

  /** CHANGE DATA FEED — [[readChanges]] completed with delete
    * propagation (the Delta CDF shape): every row committed after
    * `fromVersion` up to `toVersion`, tagged `_change_type`:
    *
    *   - new data batches → their rows as `insert` (compaction
    *     batches skipped, dataChange = false);
    *   - new TOMBSTONE batches → the rows they deleted as `delete` —
    *     materialized by semi-joining the tombstone's keys against
    *     the position-scoped view just before it, so the feed
    *     carries the full deleted ROWS (including rows from batches
    *     older than `fromVersion` — the case [[readChanges]] cannot
    *     express), not just keys;
    *   - an [[upsert]] in the range yields the replaced rows as
    *     `delete` plus the new rows as `insert` — the
    *     preimage/postimage pair;
    *   - a row inserted AND deleted inside the range appears twice
    *     (once per tag), which is what an incremental materializer
    *     needs to stay exact;
    *   - `fromVersion = 0` = the initial snapshot, all `insert`.
    *
    * The feed iterates PER COMMIT over the retained manifests
    * (endpoint set-difference would silently lose every change an
    * intermediate compaction folded away — caught by the spec's
    * apply-the-feed exactness check), so its range is bounded by
    * manifest retention exactly like Delta's CDF: a vacuumed
    * intermediate version fails loudly at the manifest read.
    *
    * Cost: inserts are raw batch reads; each delete commit in the
    * range pays one filtered scan of its prefix view bounded by the
    * tombstone's key count — at 100 TB, keep feed ranges short by
    * compacting (the `=` flag keeps compactions out of the feed).
    */
  def readChangeFeed(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    changeFeedWalk(spark, path, fromVersion, toVersion, None)

  /** [[readChangeFeed]] under an EXPLICIT (widened, physical-named)
    * scan schema — what a `widen = true` CDC stream delivers (round
    * 19; previously a construction-time refusal): every per-commit
    * read — insert batches AND the position-scoped preimage views
    * the tombstone semi-joins run against — goes through `schema`,
    * so narrow epochs promote natively and absent fields null-fill,
    * exactly like [[readChangesAs]]. Tombstone KEY batches keep
    * their own stored (possibly narrow) types and are cast to the
    * widened types before the semi-join — lossless by the same
    * matrix that admitted the widening. The caller has verified
    * every batch widens into `schema` (the streaming source's
    * footer checks).
    */
  private[graft] def readChangeFeedAs(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    changeFeedWalk(spark, path, fromVersion, toVersion, Some(schema))

  /** The single per-commit CDC walk behind both feed surfaces —
    * parameterized on the optional explicit scan schema exactly like
    * [[viewOf]], so the plain and widened feeds can never diverge.
    */
  private def changeFeedWalk(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long,
      explicit: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    def asView(entries: Seq[String]): Option[DataFrame] =
      viewOf(spark, path, entries, mergeSchema = false, _ => true,
        explicitSchema = explicit)
    def read(paths: Seq[String]): DataFrame = explicit match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    def emptySnapshot = explicit match {
      case Some(s) => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), s)
        .withColumn("_change_type", lit("insert"))
      case None => readAtPhysical(spark, path, toVersion)
        .withColumn("_change_type", lit("insert")).limit(0)
    }
    if (fromVersion == 0)
      return asView(manifestEntries(path, toVersion))
        .map(_.withColumn("_change_type", lit("insert")))
        .getOrElse(emptySnapshot)
    val changes = (fromVersion + 1 to toVersion).flatMap { v =>
      val prevDirs = manifestEntries(path, v - 1).map(dirOf).toSet
      val cur = manifestEntries(path, v)
      cur.zipWithIndex.flatMap { case (e, idx) =>
        val dir = dirOf(e)
        if (prevDirs.contains(dir) || isCompaction(e)) None
        else if (isTombstone(e)) {
          // semi-join on the tombstone's FULL column list (one column
          // for plain keys, all components for composite keys); under
          // an explicit widened schema the stored (possibly narrow)
          // key types cast to the view's — lossless by the matrix
          // that admitted the widening
          val rawKeys = spark.read.parquet(
            scanPaths(path, e.stripPrefix("~")): _*)
          val keyCols = rawKeys.columns.toSeq
          // the position-scoped view just before this tombstone, at
          // THIS commit — the rows it actually deleted
          asView(cur.take(idx)).map { pre =>
            // only the EXPLICIT (widened) schema may cast the stored
            // key types — there the cast is lossless by the matrix
            // that admitted the widening. The plain feed keeps join
            // coercion (both sides widen UP): casting down to a
            // narrow preimage type could wrap and fabricate matches.
            val keys = explicit match {
              case Some(_) =>
                val viewTypes = pre.schema
                rawKeys.select(keyCols.map { c =>
                  viewTypes.find(_.name.equalsIgnoreCase(c))
                    .map(f => col(c).cast(f.dataType).as(c))
                    .getOrElse(col(c))
                }: _*)
              case None => rawKeys
            }
            pre.join(keys.distinct(), keyCols, "left_semi")
              .withColumn("_change_type", lit("delete"))
          }
        } else
          Some(read(scanPaths(path, e))
            .withColumn("_change_type", lit("insert")))
      }
    }
    if (changes.isEmpty) emptySnapshot
    else changes.reduce(_ unionByName _)
  }

  private val CheckpointRe = "_version\\.(\\d+)".r
  private val CheckpointTmpRe = "_version\\.(\\d+)\\.tmp".r

  /** The consumer position recorded in `checkpointDir`: the MAX over
    * all `_version.<N>` marker files (plus a legacy `_version`
    * content file, read for upgrade compatibility). Max-on-read makes
    * any crash state safe: extra stale markers only ever UNDER-state
    * the position by staying around, never erase it.
    */
  private def checkpointVersion(checkpointDir: String): Long = {
    val (cfs, cp) = fs(checkpointDir)
    if (!cfs.exists(cp)) return 0L
    val marked = cfs.listStatus(cp).map(_.getPath.getName).collect {
      case CheckpointRe(n) => n.toLong
    }
    val legacyFile = new Path(cp, "_version")
    val legacy =
      if (!cfs.exists(legacyFile)) None
      else {
        val in = cfs.open(legacyFile)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toLong)
        finally in.close()
      }
    (marked ++ legacy).foldLeft(0L)(math.max)
  }

  /** Checkpointed AvailableNow-style consumer: read the last-seen
    * version from `checkpointDir`, deliver `readChanges(last,
    * latest)` to `f`, then advance the checkpoint by creating a NEW
    * versioned marker `_version.<latest>` (temp + rename to a fresh
    * name) and only then best-effort deleting superseded markers.
    * The position is the MAX over markers, so there is NO lost-state
    * window: a crash at any point leaves the previous marker (or
    * both) in place — the worst case is a replay of the same range
    * (at-least-once), never a full-snapshot re-delivery from a
    * vanished checkpoint (the delete-then-rename hazard this design
    * replaces, spec-proven by injecting a delete-refusing
    * filesystem). Returns the delivered (fromVersion, toVersion), or
    * None when there is nothing new. Pair the sink with the
    * [[append]] txn guard (e.g. txnId = s"consume-$toVersion") for
    * end-to-end exactly-once.
    */
  def consumeChanges(spark: SparkSession, path: String,
      checkpointDir: String)(f: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val latest = latestVersion(path).getOrElse(return None)
    val (cfs, cp) = fs(checkpointDir)
    val last = checkpointVersion(checkpointDir)
    if (latest <= last) return None
    f(readChanges(spark, path, last, latest), last, latest)
    advanceCheckpoint(checkpointDir, latest)
    Some((last, latest))
  }

  /** Advance a consumer checkpoint to `latest`: create a NEW marker
    * (temp + rename to a fresh name), then best-effort sweep
    * superseded markers. Max-on-read makes every crash state safe —
    * the worst case is a replay (at-least-once), never a vanished
    * checkpoint.
    */
  private def advanceCheckpoint(checkpointDir: String, latest: Long): Unit = {
    val (cfs, cp) = fs(checkpointDir)
    val marker = new Path(cp, s"_version.$latest")
    val tmp = new Path(cp, s"_version.$latest.tmp")
    val out = cfs.create(tmp, true)
    try out.write(latest.toString.getBytes("UTF-8"))
    finally out.close()
    if (!cfs.rename(tmp, marker) && !cfs.exists(marker))
      throw new java.io.IOException(
        s"checkpoint rename $tmp -> $marker failed; " +
          "the delivery will replay (at-least-once)")
    // superseded markers (and any legacy content file) are cleanup,
    // not correctness: a refused delete leaves a LOWER marker behind,
    // which max-on-read ignores. Crash leftovers `_version.<N>.tmp`
    // (an advance that died between create and rename) are swept too
    // — they never match CheckpointRe, so without this clause they
    // would accumulate forever; any tmp at or below the just-advanced
    // position is dead by construction (its rename either happened or
    // was superseded by this one)
    cfs.listStatus(cp).map(_.getPath).foreach { mp =>
      val stale = mp.getName match {
        case CheckpointRe(n) => n.toLong < latest
        case CheckpointTmpRe(n) => n.toLong <= latest
        case "_version" => true
        case _ => false
      }
      if (stale) { cfs.delete(mp, false); () }
    }
  }

  /** Sum of parquet footer record counts over the visible data files
    * of one batch dir — file metadata, zero data pages. Hidden-ness
    * is judged ONLY on path segments BELOW the batch dir root (the
    * manifest entry's dir), because clustered entries are themselves
    * nested dirs named `__rb=N`/`__zb=N`: judging the FULL path would
    * misread every file under them as hidden and silently count a
    * populated bucket as zero. With `stopAtFirstRow` the walk stops
    * as soon as any row is found (the emptiness probe).
    */
  private def footerRowCount(conf: org.apache.hadoop.conf.Configuration,
      dirPath: String, stopAtFirstRow: Boolean = false): Long = {
    val dir = new Path(dirPath)
    val f = dir.getFileSystem(conf)
    val rootPrefix = f.makeQualified(dir).toString.stripSuffix("/") + "/"
    var total = 0L
    val it = f.listFiles(dir, true)
    while (it.hasNext && !(stopAtFirstRow && total > 0L)) {
      val st = it.next()
      val full = st.getPath.toString
      // segments below the batch dir root only; a file listed under a
      // different qualification than makeQualified produced would be a
      // filesystem contract violation, so the strip is total here
      val rel =
        if (full.startsWith(rootPrefix)) full.substring(rootPrefix.length)
        else full
      val hidden = rel.split("/").exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (st.isFile && full.endsWith(".parquet") && !hidden) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try total += reader.getRecordCount finally reader.close()
      }
    }
    total
  }

  /** Metadata-only COUNT(*): when `version`'s manifest carries no
    * tombstone (none ever committed, or a later compaction absorbed
    * them all), the table's cardinality is the sum of its data
    * batches' parquet FOOTER record counts — file metadata, zero
    * data pages (the q16 HEAD-probe discipline at table grain, the
    * instant `SELECT count(*)` Delta answers from add-file
    * numRecords). Hidden sidecars (`_bloom/`) are excluded exactly
    * as data scans exclude them — judged below each batch dir root,
    * so clustered `__rb=`/`__zb=` bucket dirs count correctly
    * (spec-proven after compactByRange/compactByZOrder). With
    * unabsorbed tombstones the true count needs the merge-on-read
    * anti-join, so this returns None and the caller falls back to
    * `readAt(...).count()` — correctness is never approximated.
    */
  def countAt(spark: SparkSession, path: String,
      version: Long): Option[Long] = {
    val entries = manifestEntries(path, version)
    if (entries.exists(isTombstone)) return None
    val conf = spark.sparkContext.hadoopConfiguration
    Some(entries.map(e => footerRowCountEntry(conf, path, e)).sum)
  }

  /** [[footerRowCount]] scoped by the entry's file-level manifest
    * when it carries one — an uncommitted stray in a delta batch dir
    * must not inflate the metadata-only count.
    */
  private def footerRowCountEntry(conf: org.apache.hadoop.conf.Configuration,
      path: String, e: String, stopAtFirstRow: Boolean = false): Long =
    filesOf(e) match {
      case None =>
        footerRowCount(conf, s"$path/data/${dirOf(e)}", stopAtFirstRow)
      case Some(names) =>
        var total = 0L
        val it = names.iterator
        while (it.hasNext && !(stopAtFirstRow && total > 0L)) {
          val fp = new Path(s"$path/data/${dirOf(e)}/${it.next()}")
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(fp, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try total += reader.getRecordCount finally reader.close()
        }
        total
    }

  /** Metadata-only MIN/MAX: batch stats are EXACT aggregates of their
    * batch, so with no unabsorbed tombstone the table-wide range of
    * `column` is the envelope of the manifest's entries — zero data
    * pages, like [[countAt]]. Honesty rules: any tombstone → None (a
    * deleted row may carry the extremum); a stats-less entry is
    * consulted by FOOTER count — truly empty batches contribute
    * nothing (an empty write records no stats, q275's sf0.001 case),
    * but a NON-empty stats-less batch forces None (its rows make
    * claims the manifest cannot bound). Never an approximation.
    */
  def statsRange(spark: SparkSession, path: String, version: Long,
      column: String): Option[(Long, Long)] = {
    val entries = manifestEntries(path, version)
    if (entries.exists(isTombstone)) return None
    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = entries.map { e =>
      statsOf(e).get(column) match {
        case some @ Some(_) => some
        case None =>
          // no stats: only an actually-EMPTY batch is ignorable — the
          // emptiness probe shares footerRowCount's below-the-root
          // hidden-ness rule, so a populated clustered bucket
          // (`__rb=`/`__zb=` dir) is never misread as empty
          val n = footerRowCountEntry(conf, path, e,
            stopAtFirstRow = true)
          if (n == 0L) None else return None // non-empty without stats
      }
    }
    val present = ranges.flatten
    if (present.isEmpty) None
    else Some((present.map(_._1).min, present.map(_._2).max))
  }

  /** DESCRIBE HISTORY: one row per retained commit — (version, kind,
    * n_add, n_delete, txn) — derived entirely from the KB-sized
    * manifests (metadata-only at any table size). `kind` classifies
    * the commit by its NEW entries relative to the previous retained
    * manifest: `append` (data only), `delete` (tombstones only),
    * `upsert` (tombstones + data in one commit), `compact` (any
    * `=`-flagged rewrite — OPTIMIZE, range clustering, z-order);
    * the oldest retained version after a vacuum reads
    * `history-truncated` when its predecessor's manifest is gone
    * (its entry list is cumulative state, not one commit's delta —
    * the Delta DESCRIBE HISTORY retention caveat). `txn` surfaces
    * the writer-transaction id when the commit declared one.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val versions = committedVersions(path)
    val rows = versions.map { v =>
      val cur = manifestEntries(path, v)
      val txn = committedTxn(path, v).orNull
      // the recorded commit wall-time (`#ts=` header, round 16):
      // survives mtime-clobbering copies; None for legacy manifests
      val ts = commitTimeMillis(path, v)
      if (v > 1 && !versions.contains(v - 1))
        (v, "history-truncated", cur.count(!isTombstone(_)).toLong,
          cur.count(isTombstone).toLong, txn, ts)
      else {
        val prevSet =
          if (v == 1) Set.empty[String]
          else manifestEntries(path, v - 1).toSet
        val fresh = cur.filterNot(prevSet)
        val kind =
          if (restoredFrom(path, v).nonEmpty) "restore"
          // a schema-changing ALTER's epoch fence: entries copied
          // verbatim, content identical — without the tag it would
          // read as a zero-row "append"
          else if (ddlFence(path, v).nonEmpty) "ddl"
          else if (fresh.exists(isCompaction)) "compact"
          else if (fresh.exists(isTombstone) && fresh.exists(!isTombstone(_)))
            "upsert"
          else if (fresh.exists(isTombstone)) "delete"
          else "append"
        (v, kind, fresh.count(!isTombstone(_)).toLong,
          fresh.count(isTombstone).toLong, txn, ts)
      }
    }
    rows.toDF("version", "kind", "n_add", "n_delete", "txn", "ts")
  }

  /** CONTINUOUS change consumption — the versioned table's
    * `readStream` equivalent, composed from the engine's own parts:
    * [[graft.streaming.Scheduled.cadence]] (the Structured Streaming
    * clock) drives the checkpointed consumer ([[consumeChanges]])
    * once per `interval`. Each tick delivers at most one contiguous
    * (from, to] version range to `f` and atomically advances the
    * checkpoint; ticks with nothing new are free (one manifest
    * listing). Crash/restart: re-invoke on startup — the checkpoint
    * resumes the range, a delivery interrupted before its checkpoint
    * rename replays (at-least-once), and a txn-guarded sink
    * (txnId = s"consume-$to") makes the pipeline exactly-once end to
    * end, exactly as q276 proves for the single-shot form. Stop via
    * the returned StreamingQuery.
    */
  def streamChanges(spark: SparkSession, path: String,
      checkpointDir: String, interval: String,
      cadenceCheckpoint: Option[String] = None)
      (f: (DataFrame, Long, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.Scheduled.cadence(spark, interval, cadenceCheckpoint) {
      _ => consumeChanges(spark, path, checkpointDir)(f); ()
    }

  /** RESTORE — rewind the table to `toVersion` as a NEW commit
    * (Delta's RESTORE TABLE): the restored version's manifest entries
    * are re-published as the next version, METADATA-ONLY — zero data
    * movement, KB-sized at any table scale, because batch dirs
    * referenced by a retained manifest are still on disk (vacuum
    * reclaims only dirs NO kept manifest references). History is
    * preserved: the rollback is itself a commit, so time travel to
    * the pre-restore state still works until retention; the commit
    * carries a `#restore=<v>` marker that DESCRIBE HISTORY
    * classifies. Restoring past the retention floor fails loudly at
    * the manifest read (never a silent partial rewind).
    *
    * Concurrency: blind OCC retry is serializable for restore — the
    * outcome "make latest look like v" is the serial order them,
    * then us, regardless of what interleaved.
    *
    * Honesty caveat (Delta shares it): a restore can make rows
    * DISAPPEAR relative to the current version without a tombstone
    * commit, so incremental change consumers checkpointed across a
    * restore should RE-SEED from the snapshot — the change feed
    * carries reappearing rows as inserts but cannot express the
    * rewind's removals.
    */
  def restore(path: String, toVersion: Long, maxRetries: Int = 3): Long = {
    val latest = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"nothing to restore at $path"))
    require(toVersion >= 1, s"version $toVersion is not restorable")
    if (toVersion == latest) return latest // already there: no-op
    // throws loudly if vacuumed past the retention floor
    val entries = manifestEntries(path, toVersion)
    var attempt = 0
    while (true) {
      val next = latestVersion(path).getOrElse(0L) + 1
      try {
        commitManifest(path, next, s"#restore=$toVersion" +: entries)
        return next
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("already committed") &&
              attempt < maxRetries =>
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** METADATA-ONLY commit: republish the latest version's entries
    * verbatim as a new version carrying `comment` — the epoch
    * boundary a shape-changing DDL (RENAME/DROP COLUMN, type widen)
    * pins its schema history to: content-identical by construction,
    * it exists only so `VERSION AS OF` can tell "before the ALTER"
    * from "after". Returns the committed version. Same bounded OCC
    * retry as [[restore]] — an interleaved data commit just moves the
    * boundary forward one version.
    */
  def commitMetadataVersion(path: String, comment: String,
      maxRetries: Int = 3, extraHeader: Seq[String] = Nil): Long = {
    var attempt = 0
    while (true) {
      val latest = latestVersion(path).getOrElse(
        throw new IllegalArgumentException(
          s"no committed version at $path to fence"))
      try {
        commitManifest(path, latest + 1,
          (comment +: extraHeader) ++ manifestEntries(path, latest))
        return latest + 1
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("already committed") &&
              attempt < maxRetries =>
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** The version a restore commit rewound to, if `version` is one. */
  def restoredFrom(path: String, version: Long): Option[Long] =
    manifestLines(path, version)
      .find(_.startsWith("#restore=")).map(_.stripPrefix("#restore=").toLong)

  /** The DDL marker a schema-changing ALTER's epoch fence carries, if
    * `version` is one (see [[commitMetadataVersion]]).
    */
  def ddlFence(path: String, version: Long): Option[String] =
    manifestLines(path, version)
      .find(_.startsWith("#ddl=")).map(_.stripPrefix("#ddl="))

  /** HIVE-LAYOUT EXPORT — interop with external readers that expect
    * `col=value` directory contracts (the reference's own S3 layout
    * IS one: `raw/date=.../instrument=...`,
    * `agf_ingestion_lambda.py:76,183,261`). The versioned table's
    * batch layout is its own (clustering serves pruning better than
    * static partitions — the PARTITIONED BY refusal stands), so
    * interop is an EXPORT: materialize the resolved view of
    * `version` — tombstones applied, merge-on-read debt paid once —
    * into a Hive-partitioned parquet tree any engine can list.
    * Content-invariant by construction (the export IS readAt;
    * q315's oracle hashes it against the relational recompute).
    *
    * At 100 TB: one shuffle-free write pass repartitioned by the
    * partition columns so each output dir is written by few tasks
    * (without it, every task writes every partition — the
    * small-files explosion); partition columns must be
    * LOW-CARDINALITY (dirs = distinct combinations — the usual Hive
    * contract, stated rather than discovered at the store). The
    * export is a SNAPSHOT, not a live view: re-export or consume
    * [[readChanges]] for freshness.
    */
  def exportHiveLayout(spark: SparkSession, path: String, version: Long,
      partitionCols: Seq[String], outDir: String): Unit = {
    require(partitionCols.nonEmpty, "export needs partition columns")
    val view = readAt(spark, path, version)
    partitionCols.foreach(c => require(view.columns.contains(c),
      s"partition column $c is not in the table"))
    view.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(outDir)
  }

  /** INCREMENTAL HIVE-LAYOUT SYNC — [[exportHiveLayout]] driven by
    * the change feed (round-15 verdict #4): a CHECKPOINTED consumer
    * (the same marker discipline as [[consumeChanges]], the
    * reference's weekly-reconcile cadence,
    * `agf-reconciliation-stack.yaml:142-151`) that rewrites ONLY the
    * `col=value` partition dirs the commits since the last sync
    * touched — delete-aware via the CDF delete leg:
    *
    *  - first call (no checkpoint) = the full export;
    *  - later calls read [[readChangeFeed]](last, latest); the
    *    DISTINCT partition values over BOTH legs are the touched set
    *    (an upsert touches its partition through its preimage rows,
    *    a delete through the deleted rows, an append through the new
    *    rows);
    *  - touched partitions with surviving rows rewrite through
    *    Spark's DYNAMIC partition overwrite (only dirs present in
    *    the written data are replaced); a touched partition whose
    *    rows ALL vanished has nothing to write, so its dir is
    *    removed explicitly — the one case dynamic overwrite cannot
    *    express;
    *  - UNTOUCHED partition dirs are never opened, listed, or
    *    rewritten — byte-identical across the sync (spec-proven).
    *
    * At 100 TB this is the difference between re-materializing the
    * table weekly and paying one filtered scan of the touched
    * partitions. Contracts, stated plainly: partition values must be
    * non-null (Hive's default-partition escape is a different
    * contract — refused loudly) and low-cardinality (the touched set
    * is collected, bounded by distinct combinations); the feed range
    * is bounded by manifest retention — a vacuumed intermediate
    * version fails loudly, and the recovery is a full re-export from
    * a fresh checkpoint. Returns the synced (fromVersion, toVersion),
    * None when already current.
    */
  def syncHiveLayout(spark: SparkSession, path: String,
      partitionCols: Seq[String], outDir: String,
      checkpointDir: String): Option[(Long, Long)] = {
    require(partitionCols.nonEmpty, "sync needs partition columns")
    val latest = latestVersion(path).getOrElse(return None)
    val last = checkpointVersion(checkpointDir)
    if (latest <= last) return None
    if (last == 0L) {
      exportHiveLayout(spark, path, latest, partitionCols, outDir)
      advanceCheckpoint(checkpointDir, latest)
      return Some((0L, latest))
    }
    // the change feed is physical-named plumbing; the export speaks
    // the table's CURRENT logical names (same epoch as readAt(latest))
    val feed = graft.catalog.ColumnMapping.toLogicalAt(
      readChangeFeed(spark, path, last, latest), path, latest)
    partitionCols.foreach(c => require(feed.columns.contains(c),
      s"partition column $c is not in the table"))
    val touched = feed.select(partitionCols.map(col): _*)
      .distinct().collect()
    if (touched.nonEmpty) {
      touched.foreach { r =>
        require((0 until r.length).forall(!r.isNullAt(_)),
          "syncHiveLayout: NULL partition values are not part of the " +
            "col=value path contract; filter or fill them first")
      }
      val view = readAt(spark, path, latest)
      val touchedDf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(touched: _*)),
        org.apache.spark.sql.types.StructType(
          partitionCols.map(c => view.schema(c))))
      val surviving = view.join(broadcast(touchedDf), partitionCols,
        "left_semi")
      // dynamic overwrite: only partitions present in the written
      // data are replaced; untouched dirs are never listed or opened
      surviving.repartition(partitionCols.map(col): _*)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*)
        .parquet(outDir)
      // touched partitions with NO surviving rows: remove their dirs
      // (delete-awareness — the stale dir would otherwise keep
      // serving deleted rows to foreign readers)
      val survivingParts = surviving
        .select(partitionCols.map(col): _*).distinct().collect()
        .map(_.toSeq).toSet
      val (of, _) = fs(outDir)
      touched.filterNot(r => survivingParts.contains(r.toSeq)).foreach { r =>
        val dir = partitionCols.zipWithIndex.map { case (c, i) =>
          s"$c=" + org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.escapePathName(String.valueOf(r.get(i)))
        }.mkString("/")
        val p = new Path(s"$outDir/$dir")
        if (of.exists(p)) { of.delete(p, true); () }
      }
    }
    advanceCheckpoint(checkpointDir, latest)
    Some((last, latest))
  }

  /** Drop history: keep the newest `keep` versions' manifests, delete
    * older manifests and every batch dir no kept manifest references
    * (including crash-orphaned dirs that were never committed).
    * Versions inside the keep window whose manifests an EARLIER,
    * narrower vacuum already removed are skipped, so widening the
    * retention later never aborts.
    *
    * CONCURRENT-READER CONTRACT (the Delta
    * `deletedFileRetentionDuration` analog, stated for this format):
    * a query PLANS against a version's manifest and scans its batch
    * dirs later — so a vacuum that reclaims that version mid-query
    * can yank files out from under a running scan. The contract is
    * therefore: **retention must exceed the longest running query**
    * — keep at least as many versions as can be superseded while
    * your slowest reader runs (at one commit per minute and a 1-hour
    * query ceiling, `keep >= 60`). A reader that loses the race
    * fails loudly (`FileNotFoundException` from the scan — Spark
    * never silently drops missing files here), and the failure is
    * ATTRIBUTABLE post hoc: every vacuum records its floor in
    * `_vacuum.info`, and [[diagnoseVacuumRace]] classifies such a
    * failure against it, naming the retention fix. New reads of a
    * reclaimed version refuse at the manifest ("never committed, or
    * vacuumed") before any plan is built.
    */
  /** The reclamation set [[vacuum]] acts on (and [[vacuumDryRun]]
    * reports): the retention floor, the manifests below it, and the
    * unreferenced top-level batch dirs.
    */
  private def vacuumPlan(path: String,
      keep: Int): Option[(Long, Seq[Path], Seq[Path])] = {
    require(keep >= 1, "must keep at least the latest version")
    val (f, p) = fs(path)
    val latest = latestVersion(path).getOrElse(return None)
    val floor = math.max(1L, latest - keep + 1)
    // only versions whose manifest still exists: an earlier vacuum
    // with a smaller keep may have removed part of the window
    val keptVersions = committedVersions(path).filter(_ >= floor)
    // data AND tombstone batches: a kept version's delete set is as
    // load-bearing as its rows. Entries may reference NESTED dirs
    // (compactByRange buckets live under one parent) — the unit of
    // reclamation is the TOP-LEVEL child of data/, so referencing any
    // nested dir keeps its parent
    val referenced = keptVersions.flatMap { v =>
      manifestEntries(path, v).map(e => dirOf(e).split("/").head)
    }.toSet
    val manifests = f.listStatus(p).map(_.getPath).filter { mp =>
      mp.getName match {
        case ManifestRe(n) => n.toLong < floor
        case _ => false
      }
    }.toSeq
    val dataDir = new Path(p, "data")
    val dirs =
      if (!f.exists(dataDir)) Seq.empty
      else f.listStatus(dataDir).map(_.getPath)
        .filterNot(bp => referenced.contains(bp.getName)).toSeq
    Some((floor, manifests, dirs ++ staleMetaGens(path, floor)))
  }

  /** METADATA-GENERATION RETENTION (round-16 verdict #5): `_meta.<N>`
    * schema epochs accumulate one file per ALTER, unboundedly. A
    * generation is reclaimable once a NEWER generation already
    * governs every retained version — i.e. some later generation's
    * `since` is at or below the vacuum floor ([[GraftTableMeta
    * .metaForVersion]] picks the newest `since <= v`, so the older
    * one can never be selected for a retained read again). The
    * anchor (newest gen with `since <= floor`), every gen with
    * `since > floor`, the LATEST gen (current metadata), and
    * generation 0 (`_table.meta` — the table's existence marker) are
    * always kept. Physical-name reuse safety is unaffected: `dropped`
    * accumulates forward and mappings persist, so the latest
    * generation alone carries every physical name ever retired.
    * KB-sized: one listing + one read per generation.
    */
  private def staleMetaGens(path: String, floor: Long): Seq[Path] = {
    val gens =
      try graft.catalog.GraftTableMeta.metaGens(path)
      catch { case scala.util.control.NonFatal(_) => return Seq.empty }
    if (gens.size <= 1) return Seq.empty
    val states = gens.map(g =>
      g -> graft.catalog.GraftTableMeta.readGen(path, g))
    val anchor = states.reverse.find(_._2.since <= floor).map(_._1)
    states.collect {
      case (g, st) if g != 0L && g != gens.max &&
          !anchor.contains(g) && st.since <= floor =>
        new Path(path, s"_meta.$g")
    }
  }

  /** What a `VACUUM ... RETAIN n VERSIONS` WOULD reclaim, without
    * touching anything (Delta's `DRY RUN`): one row per reclaimable
    * manifest and batch dir with its byte size, plus the floor the
    * real vacuum would set — the look-before-you-destroy step a
    * retention change deserves.
    */
  def vacuumDryRun(spark: SparkSession, path: String,
      keep: Int): DataFrame = {
    import spark.implicits._
    val (f, _) = fs(path)
    val rows = vacuumPlan(path, keep) match {
      case None => Seq.empty[(String, String, Long)]
      case Some((floor, manifests, dirs)) =>
        manifests.map(m => ("manifest", m.getName,
          f.getFileStatus(m).getLen)) ++
          dirs.map { d =>
            if (d.getName.startsWith("_meta."))
              ("meta-gen", d.getName, f.getFileStatus(d).getLen)
            else ("batch-dir", d.getName,
              f.getContentSummary(d).getLength)
          } :+
          (("floor", s"v$floor", 0L))
    }
    rows.toDF("kind", "name", "bytes")
  }

  def vacuum(path: String, keep: Int): Unit = {
    val (f, p) = fs(path)
    val (floor, manifests, dirs) = vacuumPlan(path, keep).getOrElse(return)
    // old manifests first: a reader landing mid-vacuum sees either a
    // kept version (complete) or a missing manifest (loud failure) —
    // never a manifest whose dirs are partially deleted
    manifests.foreach { mp =>
      if (!f.delete(mp, false) && f.exists(mp))
        throw new java.io.IOException(
          s"VersionedTable vacuum: delete of manifest $mp failed")
    }
    dirs.foreach { bp =>
      if (!f.delete(bp, true) && f.exists(bp))
        throw new java.io.IOException(
          s"VersionedTable vacuum: delete of $bp failed")
    }
    // the post-hoc attribution record: which floor this vacuum set,
    // and when — what [[diagnoseVacuumRace]] names when a concurrent
    // reader loses the retention race
    val info = new Path(p, VacuumInfoFile)
    val out = f.create(info, true)
    try out.write(s"floor=$floor\nat=${System.currentTimeMillis()}\n"
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** `DESCRIBE DETAIL` — one metadata-only row about the table's
    * CURRENT state (the Delta verb): latest version, its data and
    * tombstone batch counts (merge-on-read debt at a glance — the
    * OPTIMIZE trigger), retained version count, the declared merge
    * key, the metadata generation (how many ALTERs this table has
    * seen), whether a column mapping is active, and the vacuum floor.
    * KB-sized reads only: one listing + one manifest + one meta file.
    */
  def detail(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val versions = committedVersions(path)
    val latest = versions.lastOption
    val entries = latest.map(manifestEntries(path, _)).getOrElse(Seq.empty)
    val meta = graft.catalog.GraftTableMeta.readLatest(path)
    Seq((
      latest.getOrElse(0L),
      entries.count(!isTombstone(_)).toLong,
      entries.count(isTombstone).toLong,
      versions.size.toLong,
      meta.flatMap(_.props.get("key")).orNull,
      meta.map(_.gen).getOrElse(-1L),
      meta.exists(m => graft.catalog.ColumnMapping.isActive(m.schema)),
      vacuumFloor(path).map(_._1).map(java.lang.Long.valueOf).orNull
    )).toDF("version", "n_data_batches", "n_tombstones",
      "n_retained_versions", "key", "meta_generation", "column_mapped",
      "vacuum_floor")
  }

  private val VacuumInfoFile = "_vacuum.info"

  /** The floor recorded by the last vacuum: (lowest retained version,
    * vacuum wall-clock millis). None if the table was never vacuumed.
    */
  def vacuumFloor(path: String): Option[(Long, Long)] = {
    val (f, p) = fs(path)
    val info = new Path(p, VacuumInfoFile)
    if (!f.exists(info)) return None
    val in = f.open(info)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = text.split("\n").flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> v.trim)
      case _ => None
    }).toMap
    for (fl <- kv.get("floor"); at <- kv.get("at"))
      yield (fl.toLong, at.toLong)
  }

  /** POST-HOC DETECTION for the vacuum/reader race: classify a scan
    * failure as "planned below the retention floor". Walks `t`'s
    * cause chain for a missing file under this table's data dir;
    * when the last vacuum's record explains it, returns the
    * diagnosis naming the retention contract — so an operator
    * distinguishes "raise `keep` (or re-run the query)" from a
    * genuine storage fault. None = not this race.
    */
  def diagnoseVacuumRace(path: String, t: Throwable): Option[String] = {
    val dataPrefix = s"$path/data/"
    var c: Throwable = t
    var missing: Option[String] = None
    while (c != null && missing.isEmpty) {
      val m = Option(c.getMessage).getOrElse("")
      if (c.isInstanceOf[java.io.FileNotFoundException] &&
        m.contains(dataPrefix)) missing = Some(m)
      c = c.getCause
    }
    missing.flatMap { m =>
      vacuumFloor(path).map { case (floor, at) =>
        s"vacuum/reader race at $path: the scan referenced a file " +
          s"($m) that a vacuum (floor=v$floor, at epoch-millis $at) " +
          "reclaimed after the query planned. This is the retention " +
          "contract, not a storage fault: keep enough versions to " +
          "outlive your longest-running query (vacuum keep >= commits " +
          "per query duration), then re-run the query against the " +
          "current version"
      }
    }
  }
}
