package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftStreamingBridge, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.operators.VersionedTable

/** `format("graft")` — the versioned table as a first-class Spark
  * data source, consumable by code that never imports graft's Scala
  * API:
  *
  *   spark.read.format("graft").load(path)                  // batch
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load(path)                 // travel
  *   df.write.format("graft").mode("append").save(path)     // commit
  *   spark.readStream.format("graft").load(path)            // stream
  *
  * Batch reads hand Spark the SAME `HadoopFsRelation` that
  * `readAtAuto` plans — carrying the manifest's typed stats as scan
  * options — so a `.filter` over the loaded frame auto-prunes batch
  * dirs through [[graft.plans.VersionedStatsPruning]] exactly like
  * the Scala API (pruning parity is spec-proven by comparing the
  * optimized plans' root paths). When the requested version carries
  * unabsorbed tombstones the plan is a union/anti-join, which no V1
  * `BaseRelation` can express natively; reads then fall back to a
  * [[PrunedFilteredScan]] that still column-prunes and still
  * batch-prunes (the pushed filters are replayed onto the inner
  * `readAtAuto` plan, where the optimizer rule sees them) but pays a
  * row-boundary conversion — run OPTIMIZE ([[VersionedTable.compact]])
  * to restore the native path, the same advice Delta gives for
  * merge-on-read debt.
  *
  * The streaming source is a DataSource-V1 `Source` whose OFFSETS ARE
  * VERSIONS: micro-batch (from, to] delivers
  * [[VersionedTable.readChanges]] — initial snapshot at the first
  * batch (or from `startingVersion`), per-commit walk after,
  * compactions (`=`, dataChange = false) never re-delivered. Spark's
  * own offset WAL checkpoints progress, so a crashed-and-restarted
  * query resumes the exact version range (spec-proven); pair the sink
  * with the txn guard for end-to-end exactly-once, as q294 proves
  * against a full-recompute oracle. V1-over-V2 is the same trade
  * Delta's streaming source makes: `getBatch` returns a planned
  * DataFrame, keeping the vectorized parquet reader and codegen,
  * where a V2 `MicroBatchStream` would force a hand-rolled row-based
  * reader ([[org.apache.spark.sql.GraftStreamingBridge]] documents
  * the one internal seam that choice costs).
  *
  * Options: `versionAsOf` (batch), `mergeSchema`, `widen` (batch
  * AND stream: read/deliver under the lossless widened schema —
  * `readAtWidened`; typed pruning still applies since widening never
  * changes a stats domain; on a STREAM every delivered batch is
  * footer-checked to widen INTO the declaration, and without the
  * option a mid-stream schema change refuses loudly naming the
  * restart contract — see GraftSource.validateBatchSchemas),
  * `startingVersion` (stream: deliveries begin AFTER this
  * version; default 0 = initial snapshot), `maxVersionsPerTrigger`
  * (stream rate limit: at most this many versions per micro-batch),
  * `readChangeFeed` (stream: deliver the FULL change feed —
  * `_change_type`-tagged inserts AND deleted rows, upserts as
  * preimage/postimage pairs — so a downstream materializer maintains
  * an exact replica; plain mode carries appended rows only),
  * `txnId` / `statsCols` / `bloomCols` (write: comma-separated
  * column lists), `mergeKey` + `autoCompactTombstones` (sink:
  * Update-mode upsert key; self-scheduled compaction once the
  * manifest carries that many tombstone entries — the metadata-gated
  * maintenance policy, q307).
  */
class GraftDataSource extends RelationProvider with StreamSourceProvider
    with StreamSinkProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def opts(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  private def pathOf(o: Map[String, String]): String =
    o.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") needs a table path: .load(path) / .save(path)"))

  private def cols(o: Map[String, String], key: String): Seq[String] =
    o.get(key).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  // ---- batch read -------------------------------------------------

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val o = opts(parameters)
    val path = pathOf(o)
    val spark = sqlContext.sparkSession
    val version = o.get("versionasof").map(_.toLong).getOrElse(
      VersionedTable.latestVersion(path).getOrElse(
        throw new IllegalArgumentException(
          s"format(\"graft\"): no committed version at $path")))
    val mergeSchema = o.get("mergeschema").exists(_.toBoolean)
    // widen=true reads under the lossless widened schema
    // (readAtWidened: int batches as long, float as double, ...);
    // typed pruning still applies — widening never changes a stats
    // domain tag
    val df =
      if (o.get("widen").exists(_.toBoolean))
        VersionedTable.readAtWidened(spark, path, version, auto = true)
      else VersionedTable.readAtAuto(spark, path, version, mergeSchema)
    df.queryExecution.analyzed match {
      // tombstone-free single-group view: the plan IS one parquet
      // relation — hand it to Spark natively (stats options aboard)
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation]
      case _ =>
        new GraftMergeOnReadRelation(sqlContext, path, version, mergeSchema,
          o.get("widen").exists(_.toBoolean), df.schema)
    }
  }

  // ---- batch write ------------------------------------------------

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val o = opts(parameters)
    val path = pathOf(o)
    val txnId = o.get("txnid")
    val statsCols = cols(o, "statscols")
    val bloomCols = cols(o, "bloomcols")
    val exists = VersionedTable.latestVersion(path).nonEmpty
    mode match {
      case SaveMode.Append =>
        VersionedTable.appendRetrying(data, path, txnId, statsCols,
          maxRetries = 10, _ => (), bloomCols = bloomCols)
      case SaveMode.Overwrite =>
        VersionedTable.overwrite(data, path, txnId, statsCols, bloomCols)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"format(\"graft\"): $path already has committed versions " +
            "(mode=errorifexists)")
      case SaveMode.Ignore if exists => () // committed content wins
      case _ => // ErrorIfExists/Ignore on an empty table: first commit
        VersionedTable.appendRetrying(data, path, txnId, statsCols,
          maxRetries = 10, _ => (), bloomCols = bloomCols)
    }
    createRelation(sqlContext, parameters)
  }

  // ---- streaming read ---------------------------------------------

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val o = opts(parameters)
    val path = pathOf(o)
    val widen = o.get("widen").exists(_.toBoolean)
    val spark = sqlContext.sparkSession
    val latestOr = () => VersionedTable.latestVersion(path).getOrElse(
      throw new IllegalArgumentException(
        s"format(\"graft\"): no committed version at $path"))
    val base = schema.getOrElse {
      // the stream delivers readChanges — PHYSICAL-named plumbing —
      // but its DECLARED schema is the LOGICAL view whenever the
      // path's metadata activates a column mapping (the default;
      // option mapColumns=false opts into raw physical access):
      // getBatch aliases each delivered batch to the logical names,
      // so `readStream.table("graft.t")` over a renamed table just
      // works (round 16 — previously a loud refusal)
      val physical =
        if (widen) VersionedTable.readAtWidenedPhysical(spark, path,
          latestOr()).schema
        else VersionedTable.readAtPhysical(spark, path, latestOr()).schema
      if (GraftDataSource.mapColumns(o))
        graft.catalog.GraftCatalogs.logicalView(
          spark.createDataFrame(new java.util.ArrayList[Row](), physical),
          path).schema
      else physical
    }
    val s =
      if (o.get("readchangefeed").exists(_.toBoolean) &&
          !base.fieldNames.contains("_change_type"))
        base.add("_change_type", org.apache.spark.sql.types.StringType,
          nullable = false)
      else base
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val o = opts(parameters)
    new GraftSource(sqlContext.sparkSession, pathOf(o),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      startingVersion = o.get("startingversion").map(_.toLong).getOrElse(0L),
      maxVersionsPerTrigger = o.get("maxversionspertrigger").map(_.toLong),
      changeFeed = o.get("readchangefeed").exists(_.toBoolean),
      widen = o.get("widen").exists(_.toBoolean),
      mapColumns = GraftDataSource.mapColumns(o))
  }

  // ---- streaming write --------------------------------------------

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    val o = opts(parameters)
    require(partitionColumns.isEmpty,
      "format(\"graft\") sink does not take partitionBy: batch layout " +
        "is the table's own (clustering via compactByRange/ZOrder)")
    // the txn identity that makes replayed micro-batches no-ops: the
    // checkpoint location is stable across restarts of one query and
    // distinct between queries — exactly the dedup domain; an
    // explicit txnAppId option overrides
    val appId = o.get("txnappid").orElse(o.get("checkpointlocation")
      .map(_.replaceAll("[^A-Za-z0-9._-]", "_")))
    new GraftSink(pathOf(o), appId, cols(o, "statscols"),
      cols(o, "bloomcols"), o.get("mergekey"), outputMode,
      autoCompactTombstones = o.get("autocompacttombstones").map(_.toInt))
  }
}

object GraftDataSource {
  /** Whether a STREAM over this path presents the LOGICAL view: an
    * explicit `mapColumns` option wins; the default is true exactly
    * when the path's catalog metadata activates a column mapping (or
    * retired columns) — so `readStream.table` and path streams over
    * renamed tables deliver current logical names, while unmapped
    * tables keep the identity fast path.
    */
  private[sources] def mapColumns(o: Map[String, String]): Boolean =
    o.get("mapcolumns").map(_.toBoolean).getOrElse {
      o.get("path") match {
        case None => false
        case Some(path) =>
          try graft.catalog.GraftTableMeta.readLatest(path)
            .exists(graft.catalog.ColumnMapping.needsLogicalView)
          catch { case scala.util.control.NonFatal(_) => false }
      }
    }
}

/** The versioned table as a streaming SINK: each micro-batch is one
  * atomic commit, made idempotent under replay by txnId =
  * "<appId>-<batchId>" (appId = the query's checkpoint location or
  * an explicit `txnAppId` option) — a crashed-and-replayed batch
  * no-ops, so source-WAL + txn guard give exactly-once end to end
  * with NO foreachBatch plumbing (spec-proven across a restart).
  * Output modes map onto commit kinds:
  *
  *  - Append  -> [[VersionedTable.append]] (OCC-retried);
  *  - Complete -> [[VersionedTable.overwrite]] — each batch replaces
  *    the table, the streaming-aggregation result-table contract;
  *  - Update  -> [[VersionedTable.upsert]] on the `mergeKey` option
  *    (required; refused loudly without it) — changed keys replace,
  *    new keys insert: a continuously-maintained keyed view.
  */
private[sources] class GraftSink(path: String, appId: Option[String],
    statsCols: Seq[String], bloomCols: Seq[String], mergeKey: Option[String],
    mode: org.apache.spark.sql.streaming.OutputMode,
    autoCompactTombstones: Option[Int] = None)
    extends org.apache.spark.sql.execution.streaming.Sink {

  import org.apache.spark.sql.streaming.OutputMode

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = GraftStreamingBridge.asBatch(data)
    val txn = appId.map(a => s"$a-$batchId")
    mode match {
      case m if m == OutputMode.Complete() =>
        VersionedTable.overwrite(batch, path, txn, statsCols, bloomCols)
      case m if m == OutputMode.Update() =>
        // comma list = COMPOSITE merge key (the TBLPROPERTIES grammar):
        // a continuously-maintained keyed view over a multi-column PK
        val key = mergeKey.map(graft.sql.GraftSql.splitKey).getOrElse(
          throw new IllegalArgumentException(
            "format(\"graft\") sink in Update mode needs " +
              ".option(\"mergeKey\", <col>[,<col>...])"))
        VersionedTable.upsertRetrying(batch, key, path, txn,
          insertOnly = false, bloomCols, maxRetries = 10, _ => ())
      case _ =>
        VersionedTable.appendRetrying(batch, path, txn, statsCols,
          maxRetries = 10, _ => (), bloomCols = bloomCols)
    }
    // self-scheduled maintenance (`autoCompactTombstones = n`): after
    // the commit, fold merge-on-read debt once the manifest carries n
    // tombstone entries — the metadata gate is one KB-sized manifest
    // read per batch, the compaction is `=`-flagged (silent to
    // downstream change consumers), and the Update-mode replica's
    // read slope stays ~1× without any manual OPTIMIZE (spec-proven)
    autoCompactTombstones.foreach { threshold =>
      VersionedTable.maybeCompact(data.sparkSession, path, threshold,
        statsCols, bloomCols)
    }
    ()
  }
}

/** Merge-on-read fallback relation: correctness-complete reads of a
  * version whose view is a union/anti-join (unabsorbed tombstones).
  * Column pruning via `requiredColumns`; the pushed V1 filters are
  * replayed as Catalyst predicates onto the inner `readAtAuto` plan,
  * so manifest-stats and Bloom batch pruning still fire inside —
  * only the final row-boundary conversion is paid, and Spark
  * re-applies every filter above (none are claimed handled), keeping
  * the fallback strictly conservative.
  */
private[sources] class GraftMergeOnReadRelation(sql: SQLContext,
    path: String, version: Long, mergeSchema: Boolean, widen: Boolean,
    override val schema: StructType)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = sql

  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] =
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) if vs.nonEmpty => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNotNull(a) => Some(col(a).isNotNull)
      case IsNull(a) => Some(col(a).isNull)
      case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) }
        yield lc && rc
      case _ => None // unconverted filters still run above the scan
    }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = sql.sparkSession
    val base =
      if (widen) VersionedTable.readAtWidened(spark, path, version, auto = true)
      else VersionedTable.readAtAuto(spark, path, version, mergeSchema)
    val filtered = filters.flatMap(toColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    val projected =
      if (requiredColumns.isEmpty)
        filtered.select(lit(1).as("__one")) // COUNT(*)-style scan
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}

/** The versioned table's streaming source: offsets are table
  * versions; micro-batch (from, to] is `readChanges(from, to)` —
  * initial snapshot first, per-commit walk after, compactions never
  * re-delivered. Progress lives in Spark's offset WAL; `getBatch` is
  * replayed verbatim across restarts. Rate limiting goes through
  * [[SupportsAdmissionControl]] (the FileStreamSource pattern): plain
  * `getOffset` cannot rate-limit under Trigger.AvailableNow, whose
  * wrapper snapshots one target offset up front — `latestOffset(start,
  * limit)` is consulted per micro-batch instead, so
  * `maxVersionsPerTrigger` yields one bounded batch per step until
  * the captured latest is reached.
  */
private[sources] class GraftSource(spark: SparkSession, path: String,
    override val schema: StructType, startingVersion: Long,
    maxVersionsPerTrigger: Option[Long], changeFeed: Boolean = false,
    widen: Boolean = false, mapColumns: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnectorOffset, ReadLimit}

  private def lcs(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** COLUMN MAPPING, frozen at query (re)start (`mapColumns`, the
    * by-name default over mapped tables): delivered batches are
    * PHYSICAL-named storage; this source aliases them to the frozen
    * epoch's LOGICAL names and projects retired (`__dropped`) columns
    * away — `readStream.table("graft.t")` over a renamed table
    * delivers current logical names. A SHAPE-changing DDL landing
    * MID-STREAM (drop/add/type change — on a mapped table, an
    * unmapped one, or a first mapping activation) refuses loudly per
    * batch naming the restart contract — Spark freezes a stream's
    * schema at start, so a restart is the only honest way to pick
    * the new shape up. An ALIAS-ONLY DDL (renames only: same
    * physical column set, types, and retired set) CONTINUES instead:
    * the data content is bit-identical, the stream keeps delivering
    * under its start-time names (Spark pins the declared schema),
    * and a restart adopts the new logical names. The metadata is
    * read ONCE here — deriving the mapping and the DDL baseline from
    * two separate reads let an ALTER landing between them freeze an
    * inconsistent state (spurious or missed refusal).
    */
  private val startMeta: Option[graft.catalog.MetaState] =
    try graft.catalog.GraftTableMeta.readLatest(path)
    catch { case scala.util.control.NonFatal(_) => None }

  private val frozenMeta: Option[graft.catalog.MetaState] =
    if (!mapColumns) None
    else startMeta.filter(graft.catalog.ColumnMapping.needsLogicalView)

  /** logical-lc -> physical name under the frozen mapping. */
  private val physOfLogical: Map[String, String] = frozenMeta
    .map(_.schema.map(f => lcs(f.name) ->
      graft.catalog.ColumnMapping.physicalName(f)).toMap)
    .getOrElse(Map.empty)

  private val retiredLc: Set[String] =
    frozenMeta.map(_.dropped.map(lcs).toSet).getOrElse(Set.empty)

  private def shapeOf(m: Option[graft.catalog.MetaState]) =
    m.map(x =>
      (x.schema.map(f => (f.name,
        graft.catalog.ColumnMapping.physicalName(f), f.dataType.sql)),
        x.dropped))

  /** The shape with logical names erased — top-level AND nested
    * (`physicalType` rewrites inner struct names to their physical
    * pins): what an alias-only DDL leaves INVARIANT (physical names
    * + physical types in declared order, and the retired set). A
    * nested RENAME is alias-only exactly like a top-level one — the
    * parquet bytes are untouched — so it continues too.
    */
  private def shapeOfAliasFree(m: Option[graft.catalog.MetaState]) =
    m.map(x =>
      (x.schema.map(f => (graft.catalog.ColumnMapping.physicalName(f),
        graft.catalog.ColumnMapping.physicalType(f.dataType).sql)),
        x.dropped))

  private val frozenShape = shapeOf(startMeta)
  private val frozenShapeAliasFree = shapeOfAliasFree(startMeta)

  private def assertMappingUnchanged(): Unit = if (mapColumns || !widen) {
    val current =
      try graft.catalog.GraftTableMeta.readLatest(path)
      catch { case scala.util.control.NonFatal(_) => None }
    val cur = shapeOf(current)
    if (cur != frozenShape &&
      shapeOfAliasFree(current) != frozenShapeAliasFree)
      throw new IllegalStateException(
        s"graft stream at $path: a schema-changing DDL (DROP/ADD " +
          "COLUMN or a type change) landed mid-stream — this stream's " +
          "frozen schema no longer matches the table's current epoch. " +
          "RESTART the query; rows then arrive under the current " +
          "logical shape (a running stream cannot change its schema " +
          "mid-flight; rename-only DDL would have continued under the " +
          "start-time names)")
  }

  private def vOf(o: ConnectorOffset): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json.trim.toLong
  }

  /** Under Trigger.AvailableNow the run's end version is FROZEN here
    * (the SupportsTriggerAvailableNow contract — implemented directly,
    * like FileStreamSource, because Spark's generic wrapper discards
    * ReadLimits and would defeat maxVersionsPerTrigger): batches
    * advance rate-limited until this target, commits racing in after
    * the freeze wait for the next run.
    */
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = VersionedTable.latestVersion(path)
  }

  override def getOffset: Option[V1Offset] =
    VersionedTable.latestVersion(path).collect {
      case latest if latest > startingVersion => LongOffset(latest)
    }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: ConnectorOffset,
      limit: ReadLimit): ConnectorOffset = {
    val start = Option(startOffset).map(vOf).getOrElse(startingVersion)
    val current = VersionedTable.latestVersion(path).getOrElse(return null)
    val latest = availableNowTarget.map(math.min(_, current)).getOrElse(current)
    val capped = maxVersionsPerTrigger match {
      case Some(m) => math.min(latest, start + m)
      case None => latest
    }
    if (capped <= start) null else LongOffset(capped)
  }

  override def reportLatestOffset(): ConnectorOffset =
    VersionedTable.latestVersion(path).map(LongOffset(_)).orNull

  /** SCHEMA-EVOLUTION contract, checked per micro-batch from parquet
    * FOOTERS (bounded by delivered batch count, zero data pages)
    * before any scan:
    *
    *  - default (`widen = false`): every delivered batch must carry
    *    EXACTLY the stream's frozen fields (names + types;
    *    nullability free) — a widening/add-column commit mid-stream
    *    REFUSES loudly naming the restart contract instead of
    *    mis-reading under the stale schema (previously undefined:
    *    new columns silently dropped, a type change crashed deep in
    *    the scan);
    *  - `widen = true`: the declared schema is the widened-at-start
    *    schema (or an explicit `.schema(...)`), and every batch must
    *    widen INTO it ([[VersionedTable.widenType]]) — narrower
    *    epochs promote natively on scan, absent columns null-fill.
    *    A batch WIDER than declared still refuses (no stream can
    *    change its schema mid-flight — Spark freezes it): restart
    *    the query, the fresh start re-widens over the new commit.
    */
  private def validateBatchSchemas(from: Long, to: Long): Unit = {
    // under a frozen mapping the stream's declared names are LOGICAL;
    // footers carry the stable PHYSICAL names — compare there (names
    // AND nested types: a nested-mapped struct's footer speaks the
    // physical inner names, so the expected type is the frozen
    // field's PHYSICAL type), and a RETIRED column in an older batch
    // is no violation (the logical view projects it away)
    val physTypeOfLogical: Map[String, org.apache.spark.sql.types.DataType] =
      frozenMeta.map(_.schema.map(f => lcs(f.name) ->
        graft.catalog.ColumnMapping.physicalType(f.dataType)).toMap)
        .getOrElse(Map.empty)
    val declared = schema.fields
      .filterNot(_.name == "_change_type")
      .map(f => lcs(physOfLogical.getOrElse(lcs(f.name), f.name))
        -> physTypeOfLogical.getOrElse(lcs(f.name), f.dataType))
    val declaredMap = declared.toMap
    // retired NESTED physical paths, grouped under their top-level
    // physical column: a pre-drop batch still carrying one in its
    // footer is no violation (the logical view projects it away)
    val retiredNestedUnder: Map[String, Seq[Seq[String]]] = frozenMeta
      .map(_.dropped.filter(_.contains("."))
        .map(_.split("\\.").toSeq)
        .groupBy(p => lcs(p.head)).map { case (t, ps) => t -> ps.map(_.tail) })
      .getOrElse(Map.empty)
    def stripRetired(dt: org.apache.spark.sql.types.DataType,
        paths: Seq[Seq[String]]): org.apache.spark.sql.types.DataType =
      dt match {
        case st: org.apache.spark.sql.types.StructType if paths.nonEmpty =>
          val gone = paths.filter(_.length == 1).map(p => lcs(p.head)).toSet
          org.apache.spark.sql.types.StructType(st.fields.toSeq
            .filterNot(f => gone(lcs(f.name)))
            .map { f =>
              val deeper = paths.filter(p =>
                p.length > 1 && lcs(p.head) == lcs(f.name)).map(_.tail)
              f.copy(dataType = stripRetired(f.dataType, deeper))
            })
        case other => other
      }
    VersionedTable.freshChangeEntries(path, from, to).foreach { entry =>
      val dir = entry.split(";").head
      val got = spark.read
        .parquet(VersionedTable.scanPaths(path, entry): _*).schema
      got.fields.filterNot(f => retiredLc(lcs(f.name))).foreach { f0 =>
        val f = retiredNestedUnder.get(lcs(f0.name))
          .map(ps => f0.copy(dataType = stripRetired(f0.dataType, ps)))
          .getOrElse(f0)
        val lc = f.name.toLowerCase(java.util.Locale.ROOT)
        declaredMap.get(lc) match {
          case Some(want) if want == f.dataType => ()
          case Some(want) if widen &&
              (try VersionedTable.widenType(f.dataType, want) == want
               catch { case _: IllegalStateException => false }) => ()
          case Some(want) => throw new IllegalStateException(
            s"graft stream at $path: batch $dir carries ${f.name}: " +
              s"${f.dataType.sql} but the stream declared ${want.sql}" +
              (if (widen) ", which it does not losslessly widen into"
               else "") +
              ". A schema migration landed mid-stream: RESTART the " +
              "query — a fresh start (re)computes the widened schema " +
              "over every committed batch (option 'widen'); this " +
              "stream cannot change its schema mid-flight")
          case None => throw new IllegalStateException(
            s"graft stream at $path: batch $dir adds column ${f.name} " +
              "unknown to the stream's frozen schema. RESTART the " +
              "query to pick it up — delivering without it would " +
              "silently drop committed data")
        }
      }
      if (!widen) {
        val gotNames = got.fieldNames
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        declared.collect { case (n, _) if !gotNames.contains(n) => n }
          .foreach { missing =>
            throw new IllegalStateException(
              s"graft stream at $path: batch $dir lacks declared " +
                s"column $missing — older-epoch batches need " +
                "option 'widen' (null-fill + lossless promotion) or " +
                "a restart from a consistent schema")
          }
      }
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(o => vOf(o)).getOrElse(startingVersion)
    val to = vOf(end)
    assertMappingUnchanged()
    validateBatchSchemas(from, to)
    // the delivered plumbing is PHYSICAL-named; under a frozen
    // mapping it is aliased to the logical view before the declared
    // projection (passengers like _change_type ride through)
    def logical(df: DataFrame): DataFrame = frozenMeta
      .map(graft.catalog.ColumnMapping.toLogical(df, _)).getOrElse(df)
    // CDC mode delivers the full change feed — inserts AND the
    // deleted rows, `_change_type`-tagged (readChangeFeed's
    // per-commit walk; an upsert arrives as its preimage/postimage
    // pair) — so a downstream materializer can maintain an exact
    // replica; plain mode is the appended-rows feed
    // the explicit widened scan speaks PHYSICAL names at EVERY level
    // (round 18 — widen composes with a NESTED column mapping):
    // toPhysical renames the stream's declared logical fields to
    // their pins recursively while KEEPING the declared (possibly
    // widened) types, so narrow batches promote and absent fields
    // null-fill under the mapped names too. The CDC twin (round 19 —
    // previously a construction-time refusal) runs the per-commit
    // feed walk itself under this schema: insert batches AND the
    // preimage views each tombstone semi-joins against.
    def widenedPhysSchema: org.apache.spark.sql.types.StructType = {
      val declared = org.apache.spark.sql.types.StructType(
        schema.fields.filterNot(_.name == "_change_type"))
      frozenMeta match {
        case Some(m) =>
          graft.catalog.ColumnMapping.toPhysical(declared, m.schema)
        case None => declared
      }
    }
    val raw =
      if (changeFeed && widen)
        VersionedTable.readChangeFeedAs(spark, path, from, to,
          widenedPhysSchema)
      else if (changeFeed)
        VersionedTable.readChangeFeed(spark, path, from, to)
      else if (widen)
        VersionedTable.readChangesAs(spark, path, from, to,
          widenedPhysSchema)
      else
        VersionedTable.readChanges(spark, path, from, to)
    GraftStreamingBridge.asStreaming(
      logical(raw).select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  override def stop(): Unit = ()
}
