package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.operators.VersionedTable

/** SPARK-NATIVE ROW-LEVEL OPERATIONS — `SupportsRowLevelOperations` /
  * `SupportsDelta` on the versioned catalog table, the round-14
  * verdict's #2: DELETE / UPDATE / MERGE over `graft.<t>` now resolve
  * through SPARK'S OWN ANALYZER (`RewriteDeleteFromTable` /
  * `RewriteUpdateTable` / `RewriteMergeIntoTable`), retiring the
  * regex-screened command route for catalog names — and with it the
  * refusal matrix that route carried: `NOT MATCHED BY SOURCE`
  * clauses, explicit INSERT column lists inside MERGE, non-key merge
  * conditions, and even key-column updates all arrive as ordinary
  * analyzed plans. (Registered PATH-based names keep the command
  * route — they have no catalog identity for Spark to resolve;
  * OPTIMIZE/VACUUM keep the text screen — Spark has no grammar for
  * them.)
  *
  * Why DELTA-based (`SupportsDelta`), not group-based copy-on-write:
  * the versioned table is a merge-on-read format — its natural write
  * is "tombstone the touched keys, append the new rows", which is
  * EXACTLY the delta protocol: Spark hands the writer per-row
  * operations (insert / delete / update) where the row ID is the
  * table's declared merge key (composite keys = multiple rowId
  * columns, for free). A group-based rewrite would copy every
  * untouched row of every touched file — the cost this table format
  * exists to avoid. `representUpdateAsDeleteAndInsert = true` splits
  * updates into delete(old key) + insert(new row), which makes
  * KEY-CHANGING updates correct by construction.
  *
  * Execution shape, and why each leg lands where it does:
  *
  *  - the REWRITTEN READ (the join/filter feeding the delta) is
  *    swapped to the V1 `readAtAuto` plan by [[GraftV2Resolution]] —
  *    same trade as every other catalog read: vectorized scan,
  *    codegen, manifest-stats pruning. The rewrite rules and the
  *    swap rule share the analyzer's fixed-point Resolution batch,
  *    so the swap fires on the iteration AFTER the rewrite; the V2
  *    scan builder is therefore unreachable and throws loudly.
  *  - the WRITE is a real distributed V2 delta write: each task
  *    streams its rows straight into parquet files under the staged
  *    batch dirs through Spark's own `ParquetUtils.prepareWrite`
  *    machinery (full type fidelity, zero driver materialization —
  *    at 100 TB the delta never converges on the driver), and the
  *    driver commit publishes ONE manifest: `~tombstone` (rowIds of
  *    deleted+updated rows) then `data` (inserted+updated rows) —
  *    position scoping gives the same atomic merge-on-read semantics
  *    as [[VersionedTable.upsertWithDeletes]].
  *  - CONCURRENCY: the commit is pinned at snapshot + 1 (the version
  *    the table was loaded at), so an interleaved commit hits the
  *    exclusive manifest create and fails loudly — a single honest
  *    attempt, because the operation's clauses were evaluated
  *    against the pinned snapshot (the serializability contract the
  *    round-14 ADVICE fix established). Rerun the statement to
  *    recompute against the new latest.
  *  - TASK-ATTEMPT HYGIENE: writers write directly (no Hadoop commit
  *    protocol), so a failed/speculative attempt can leave a file in
  *    the staged dir. The driver commit reconciles: any file not
  *    named by a COMMITTED task's message is deleted before the
  *    manifest publishes. Crash before commit leaves orphan dirs for
  *    vacuum, the previous version intact.
  */
class GraftRowLevelBuilder(table: GraftTable, keyCols: Seq[String],
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(table, keyCols, info.command())
}

class GraftRowLevelOperation(table: GraftTable, keyCols: Seq[String],
    cmd: RowLevelOperation.Command) extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The row identity IS the declared merge key — composite keys are
    * just more rowId columns.
    */
  override def rowId(): Array[NamedReference] =
    keyCols.map(Expressions.column).toArray

  /** Updates arrive as delete(old rowId) + insert(new row): the
    * merge-on-read commit handles both uniformly, and an UPDATE that
    * changes a key column is correct by construction (old key
    * tombstoned, new row appended).
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new UnsupportedOperationException(
      "graft row-level reads resolve through the V1 plan swap " +
        "(GraftV2Resolution) — this V2 scan builder is unreachable by " +
        "design; reaching it means the swap rule did not fire")

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(table, info)

  override def description(): String =
    s"GraftRowLevel($cmd, key=${keyCols.mkString(",")})"
}

class GraftDeltaWriteBuilder(table: GraftTable, info: LogicalWriteInfo)
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite = {
    // under column mapping the delta's parquet files (data AND
    // tombstone rowIds) land under the stable PHYSICAL names — the
    // rename is positional on the schema only; InternalRow data is
    // positional and untouched
    def phys(s: StructType): StructType =
      ColumnMapping.toPhysical(s, table.schema())
    val idSchema = if (info.rowIdSchema().isPresent)
      Some(phys(info.rowIdSchema().get)) else None
    def cols(key: String): Seq[String] =
      ColumnMapping.colsToPhysical(
        Option(table.properties().get(key))
          .map(graft.sql.GraftSql.splitKey).getOrElse(Nil), table.schema())
    new GraftDeltaWrite(table.path, table.snapshotVersion.getOrElse(0L),
      phys(info.schema()), idSchema, cols("statscols"), cols("bloomcols"))
  }
}

class GraftDeltaWrite(path: String, snapshot: Long, dataSchema: StructType,
    idSchema: Option[StructType], statsCols: Seq[String],
    bloomCols: Seq[String]) extends DeltaWrite {
  override def toBatch(): DeltaBatchWrite =
    new GraftDeltaBatchWrite(path, snapshot, dataSchema, idSchema,
      statsCols, bloomCols)
  override def description(): String = s"GraftDeltaWrite($path @v$snapshot)"
}

/** Per-task receipt: the file NAMES this committed attempt wrote into
  * each staged dir, plus row counts (surfaced in logs).
  */
case class GraftDeltaFiles(dataFiles: Seq[String], tombFiles: Seq[String],
    inserted: Long, deleted: Long) extends WriterCommitMessage

class GraftDeltaBatchWrite(path: String, snapshot: Long,
    dataSchema: StructType, idSchema: Option[StructType],
    statsCols: Seq[String], bloomCols: Seq[String])
    extends DeltaBatchWrite {

  private val token =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
  private val dataDir = s"b${snapshot + 1}_${token}_m"
  private val tombDir = s"b${snapshot + 1}_${token}_k"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
    // one Job conf per schema: prepareWrite records the row schema
    // (plus timestamp/rebase/compression settings) on the conf, and
    // the data and rowId schemas differ
    def prepared(schema: StructType): (OutputWriterFactory, SerializableConfiguration) = {
      val job = Job.getInstance(spark.sessionState.newHadoopConf())
      val factory = ParquetUtils.prepareWrite(spark.sessionState.conf, job,
        schema, new ParquetOptions(Map.empty[String, String],
          spark.sessionState.conf))
      (factory, new SerializableConfiguration(job.getConfiguration))
    }
    val (df, dc) = prepared(dataSchema)
    val tomb = idSchema.map { s =>
      val (tf, tc) = prepared(s)
      GraftDeltaSide(s"$path/data/$tombDir", tf, tc, s)
    }
    new GraftDeltaWriterFactory(
      GraftDeltaSide(s"$path/data/$dataDir", df, dc, dataSchema), tomb)
  }

  /** Keep only files committed tasks named — a failed or speculative
    * attempt wrote directly into the staged dir and its leftovers
    * must not become table content.
    */
  private def prune(dir: String, committed: Set[String]): Unit = {
    val p = new Path(dir)
    val f = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return
    f.listStatus(p).foreach { st =>
      if (st.isFile && !committed.contains(st.getPath.getName)) {
        if (!f.delete(st.getPath, false) && f.exists(st.getPath))
          throw new java.io.IOException(
            s"graft delta write: could not remove uncommitted attempt " +
              s"file ${st.getPath}")
      }
    }
  }

  private def dropDir(dir: String): Unit = {
    val p = new Path(dir)
    val f = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    GraftDeltaBatchWrite.testBeforeCommit.foreach(_())
    val msgs = messages.collect { case m: GraftDeltaFiles => m }
    val dataFiles = msgs.flatMap(_.dataFiles).toSet
    val tombFiles = msgs.flatMap(_.tombFiles).toSet
    prune(s"$path/data/$dataDir", dataFiles)
    prune(s"$path/data/$tombDir", tombFiles)
    // a tombstone against an EMPTY table deletes nothing; data-less
    // AND tombstone-less means the operation touched zero rows — no
    // version is committed (a no-op MERGE publishes nothing)
    val withTomb = tombFiles.nonEmpty && snapshot > 0
    val withData = dataFiles.nonEmpty
    if (!withData) dropDir(s"$path/data/$dataDir")
    if (!withTomb) dropDir(s"$path/data/$tombDir")
    if (!withData && !withTomb) return
    // UPSERT PARITY for the delta batch (round 19 — two hazards the
    // refusal-inventory walk surfaced on this route, both fixed at
    // this choke point with one pass over the staged DELTA, never
    // the table):
    //  1. duplicate merge keys INSIDE the data batch would both be
    //     served (merge-on-read has no within-batch winner) — the
    //     shape a key-moving UPDATE takes when two rows land on one
    //     key. The registered-name SQL route refuses this pre-write;
    //     same refusal here, before anything publishes.
    //  2. the tombstone must scope ALL keys the data batch carries,
    //     not only Spark's deleted rowIds — a moved key landing on an
    //     existing UNTOUCHED row must REPLACE it (last-writer-wins,
    //     the upsert contract; V1 upsertWithDeletes writes exactly
    //     this union). Position scoping keeps the batch's own rows
    //     alive: the tombstone retires only OLDER batches.
    var allTombFiles = tombFiles
    var withTombFinal = withTomb
    if (withData && idSchema.isDefined) {
      import org.apache.spark.sql.functions.{col, count, lit}
      val spark = SparkSession.active
      val keys = idSchema.get.fieldNames.toSeq
      // read EXACTLY the committed file names — never the directory
      // listing: a zombie attempt flushing after prune() must neither
      // trip the dup refusal nor contribute keys (the file-level
      // manifest guarantee documented below)
      val keyProj = spark.read.schema(dataSchema)
        .parquet(dataFiles.toSeq.sorted
          .map(n => s"$path/data/$dataDir/$n"): _*)
        .select(keys.map(col): _*)
      val dup = keyProj.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).count() > 0
      if (dup) {
        dropDir(s"$path/data/$dataDir")
        dropDir(s"$path/data/$tombDir")
        throw new UnsupportedOperationException(
          s"graft row-level write to $path: the operation produces two " +
            s"or more rows on one '${keys.mkString(", ")}' key — both " +
            "would survive the same commit as duplicates; make the new " +
            "key unique per row (or DELETE + INSERT an aggregate)")
      }
      if (snapshot > 0) {
        // the data-batch key projection lands in the tombstone dir
        // under DRIVER-CHOSEN names: written to a private staging dir
        // (only this driver populates it) and renamed in, so the
        // manifest names exactly these files — a concurrently
        // flushed zombie tombstone file is never adopted
        val stage = s"$path/data/.${tombDir}_ukeys"
        val sp = new Path(stage)
        val f = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        keyProj.write.mode("overwrite").parquet(stage)
        f.mkdirs(new Path(s"$path/data/$tombDir"))
        val renamed = f.listStatus(sp).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .zipWithIndex.map { case (src, i) =>
            val name = s"ukeys-$i-${src.getName}"
            val dst = new Path(s"$path/data/$tombDir/$name")
            if (!f.rename(src, dst))
              throw new java.io.IOException(
                s"graft delta write: rename $src -> $dst failed")
            name
          }
        f.delete(sp, true)
        allTombFiles = tombFiles ++ renamed
        withTombFinal = true
      }
    }
    // the committed FILE NAMES ride the manifest entry (file-level
    // manifest): prune() above is cleanup, the entry is the guarantee
    // — a zombie/speculative attempt flushing AFTER the prune (or
    // even after the manifest publishes) is simply never scanned
    VersionedTable.commitDelta(path, snapshot,
      if (withData) Some(dataDir) else None,
      if (withTombFinal) Some(tombDir) else None,
      statsCols, bloomCols,
      dataFiles = dataFiles.toSeq.sorted,
      tombFiles = allTombFiles.toSeq.sorted)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    dropDir(s"$path/data/$dataDir")
    dropDir(s"$path/data/$tombDir")
  }
}

object GraftDeltaBatchWrite {
  /** Test seam: runs at the top of the driver-side commit, AFTER the
    * distributed write, so a spec can interleave a competing commit
    * and prove the pinned-snapshot conflict surfaces to the SQL user.
    */
  private[graft] var testBeforeCommit: Option[() => Unit] = None
}

/** One side of the delta (data or tombstone): staged dir + the
  * prepared parquet writer factory and its conf.
  */
case class GraftDeltaSide(dir: String, factory: OutputWriterFactory,
    conf: SerializableConfiguration, schema: StructType)
    extends Serializable

class GraftDeltaWriterFactory(data: GraftDeltaSide,
    tomb: Option[GraftDeltaSide]) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(partitionId, taskId, data, tomb)
}

/** Executor-side writer: opens at most one parquet file per side,
  * lazily (a task that only deletes never creates a data file), and
  * reports the files it wrote in its commit message.
  */
class GraftDeltaWriter(partitionId: Int, taskId: Long,
    data: GraftDeltaSide, tomb: Option[GraftDeltaSide])
    extends DeltaWriter[InternalRow] {

  private var dataWriter: OutputWriter = _
  private var tombWriter: OutputWriter = _
  private var dataFile: String = _
  private var tombFile: String = _
  private var nIns = 0L
  private var nDel = 0L

  private def ctx(side: GraftDeltaSide) =
    new TaskAttemptContextImpl(side.conf.value,
      new TaskAttemptID("graft_delta", 0, TaskType.MAP, partitionId,
        (taskId & 0x7fffffffL).toInt))

  private def open(side: GraftDeltaSide): (OutputWriter, String) = {
    val c = ctx(side)
    val name = s"part-$partitionId-$taskId${side.factory.getFileExtension(c)}"
    (side.factory.newInstance(s"${side.dir}/$name", side.schema, c), name)
  }

  override def insert(row: InternalRow): Unit = {
    if (dataWriter == null) {
      val (w, n) = open(data); dataWriter = w; dataFile = n
    }
    dataWriter.write(row)
    nIns += 1
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val side = tomb.getOrElse(throw new IllegalStateException(
      "graft delta write: delete arrived without a rowId schema"))
    if (tombWriter == null) {
      val (w, n) = open(side); tombWriter = w; tombFile = n
    }
    tombWriter.write(id)
    nDel += 1
  }

  // defensive: with representUpdateAsDeleteAndInsert = true Spark
  // splits updates before they reach the writer, but the contract is
  // identical either way
  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    close()
    GraftDeltaFiles(Option(dataFile).toSeq, Option(tombFile).toSeq,
      nIns, nDel)
  }

  override def abort(): Unit = {
    close()
    // best-effort removal of this attempt's files; the driver-side
    // prune is the guarantee
    def rm(dir: String, name: String): Unit = {
      val p = new Path(s"$dir/$name")
      val f = p.getFileSystem(data.conf.value)
      if (f.exists(p)) { f.delete(p, false); () }
    }
    Option(dataFile).foreach(rm(data.dir, _))
    tomb.foreach(t => Option(tombFile).foreach(rm(t.dir, _)))
  }

  override def close(): Unit = {
    if (dataWriter != null) { dataWriter.close(); dataWriter = null }
    if (tombWriter != null) { tombWriter.close(); tombWriter = null }
  }
}
