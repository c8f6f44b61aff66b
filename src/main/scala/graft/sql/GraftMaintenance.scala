package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

import graft.operators.VersionedTable

/** SQL MAINTENANCE VERBS — the operational loop a JDBC-only user was
  * missing: q300 measures merge-on-read CDC debt at a 3× read slope
  * and q301 retires it, but until this file the retire path was a
  * Scala call. Now it is SQL text, Delta-shaped:
  *
  *   OPTIMIZE t                                -- compact (fold debt)
  *   OPTIMIZE t ZORDER BY (c1, c2[, ...]) [BUCKETS n]
  *   OPTIMIZE t RANGE BY c [BUCKETS n]         -- 1-D clustering
  *   VACUUM t RETAIN <n> VERSIONS              -- retention, explicit
  *   DESCRIBE HISTORY t                        -- the commit log
  *   RESTORE [TABLE] t TO VERSION AS OF n      -- metadata-only rewind
  *
  * Spark's grammar has no OPTIMIZE/VACUUM, so [[GraftDmlParser]]
  * screens the statement text FIRST (the Delta parser pattern) with
  * anchored regexes and hands everything else — including any
  * statement whose identifier is not a graft table — to Spark's own
  * parser untouched. Identifiers resolve exactly like DML:
  * registered names or catalog tables (`graft.t`); `DESCRIBE
  * HISTORY x` over a non-graft name delegates (vanilla Spark would
  * read it as DESCRIBE of a table named `history` — we only
  * intercept what we own), while OPTIMIZE/VACUUM over a non-graft
  * name refuse loudly naming the fix (no other engine serves those
  * verbs here).
  *
  * Maintenance never changes content (the q301 hash discipline) —
  * only layout, index state, and retention. Plain OPTIMIZE
  * PRESERVES the index layer: the stats columns and Bloom columns
  * present in the current manifest are re-recorded on the rewritten
  * batch (dropping them silently would trade read cost for index
  * loss); clustered OPTIMIZE records tight stats for its clustering
  * columns, which is the point of the verb. VACUUM requires an
  * explicit RETAIN — destroying history by default is not a default
  * this engine ships.
  */
object GraftMaintenanceSql {

  private val OptPlain =
    """(?is)^\s*OPTIMIZE\s+([^\s;]+)\s*;?\s*$""".r
  private val OptZorder =
    """(?is)^\s*OPTIMIZE\s+([^\s;]+)\s+ZORDER\s+BY\s*\(([^)]+)\)\s*(?:BUCKETS\s+(\d+))?\s*;?\s*$""".r
  private val OptRange =
    """(?is)^\s*OPTIMIZE\s+([^\s;]+)\s+RANGE\s+BY\s+\(?([^\s;()]+)\)?\s*(?:BUCKETS\s+(\d+))?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([^\s;]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*(?:DESCRIBE|DESC)\s+HISTORY\s+([^\s;]+)\s*;?\s*$""".r
  private val DetailRe =
    """(?is)^\s*(?:DESCRIBE|DESC)\s+DETAIL\s+([^\s;]+)\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?([^\s;]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r

  /** Session conf for the default bucket count of clustered OPTIMIZE. */
  val BucketsConf = "spark.graft.optimize.buckets"

  private def resolve(identText: String,
      delegate: ParserInterface): Option[GraftSql.Registration] =
    try GraftSql.lookup(delegate.parseMultipartIdentifier(identText))
    catch { case _: Exception => None }

  private def column(text: String, delegate: ParserInterface): String =
    delegate.parseMultipartIdentifier(text.trim).last

  /** The maintenance-statement screen: Some(command) when the text is
    * one of ours over a GRAFT table, None to delegate to Spark.
    * Non-graft identifiers under maintenance verbs DELEGATE too (the
    * DESCRIBE HISTORY rule, extended to every verb this round): a
    * co-installed engine's parser sitting below ours must receive its
    * own OPTIMIZE/VACUUM statements. Only when NO downstream parser
    * accepts the verb does [[refusalFor]] turn the resulting parse
    * error into the loud name-the-fix message.
    */
  def parse(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case OptZorder(ident, colList, buckets) =>
      resolve(ident, delegate).map { reg =>
        val cols = colList.split(",").map(c => column(c, delegate)).toSeq
        GraftOptimizeCommand(reg.path,
          if (cols.size >= 2) cols else Seq.empty,
          if (cols.size == 1) Some(cols.head) else None,
          Option(buckets).map(_.toInt))
      }
    case OptRange(ident, c, buckets) =>
      resolve(ident, delegate).map(reg =>
        GraftOptimizeCommand(reg.path, Seq.empty,
          Some(column(c, delegate)), Option(buckets).map(_.toInt)))
    case OptPlain(ident) =>
      resolve(ident, delegate).map(reg =>
        GraftOptimizeCommand(reg.path, Seq.empty, None, None))
    case VacuumRe(ident, retain, dry) =>
      resolve(ident, delegate).map { reg =>
        if (retain == null)
          throw new IllegalArgumentException(
            "graft VACUUM needs an explicit retention: VACUUM t RETAIN " +
              "<n> VERSIONS — history is never destroyed by default" +
              (if (dry != null) " (DRY RUN included)" else ""))
        GraftVacuumCommand(reg.path, retain.toInt, dryRun = dry != null)
      }
    case HistoryRe(ident) =>
      // delegate when not ours: DESCRIBE <table named history> is
      // legitimate Spark SQL
      resolve(ident, delegate).map(reg =>
        GraftDescribeHistoryCommand(reg.path))
    case DetailRe(ident) =>
      resolve(ident, delegate).map(reg =>
        GraftDescribeDetailCommand(reg.path))
    case RestoreRe(ident, v) =>
      resolve(ident, delegate).map(reg =>
        GraftRestoreCommand(reg.path, v.toLong))
    case _ => None
  }

  /** The helpful refusal for a maintenance-shaped statement nobody
    * parsed: raised by [[GraftDmlParser]] only AFTER the downstream
    * parser rejected the text, so a co-installed engine keeps its own
    * verbs while a bare-Spark session still gets a message naming the
    * fix instead of a grammar error.
    */
  private[sql] def refusalFor(sqlText: String): Option[String] = {
    def msg(verb: String, ident: String) =
      s"$verb: '$ident' is not a graft table — use a catalog " +
        "identifier (graft.t) or GraftSql.register the name"
    sqlText match {
      case OptZorder(ident, _, _) => Some(msg("OPTIMIZE", ident))
      case OptRange(ident, _, _) => Some(msg("OPTIMIZE", ident))
      case OptPlain(ident) => Some(msg("OPTIMIZE", ident))
      case VacuumRe(ident, _, _) => Some(msg("VACUUM", ident))
      case RestoreRe(ident, _) => Some(msg("RESTORE", ident))
      case _ => None
    }
  }
}

/** `OPTIMIZE t [ZORDER BY (...) | RANGE BY c] [BUCKETS n]` — the
  * SQL face of [[VersionedTable.compact]] /
  * [[VersionedTable.compactByZOrderN]] /
  * [[VersionedTable.compactByRange]], through the same maintenance
  * OCC (interleaved appends/deletes merge; a competing rewrite
  * refuses loudly). Content-identical by construction.
  */
case class GraftOptimizeCommand(path: String, zorderCols: Seq[String],
    rangeCol: Option[String], buckets: Option[Int])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftDml.versionOutput
  override def run(session: SparkSession): Seq[Row] = {
    val n = buckets.getOrElse(
      session.conf.get(GraftMaintenanceSql.BucketsConf, "8").toInt)
    val latest = VersionedTable.latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"nothing to OPTIMIZE at $path"))
    // preserve the index layer across the rewrite: every column with
    // manifest stats or a Bloom sidecar today is re-indexed on the
    // rewritten batch (KB-sized metadata reads, bounded by batch count)
    val stats = VersionedTable.statsColumnsOf(path, latest)
    val blooms = VersionedTable.bloomColumnsOf(session, path, latest)
    // ZORDER/RANGE BY arrive as LOGICAL names; the rewrite reads the
    // stored PHYSICAL columns, so translate under any active mapping
    def phys(cols: Seq[String]): Seq[String] =
      graft.catalog.ColumnMapping.colsToPhysicalAt(path, cols)
    val v =
      if (zorderCols.nonEmpty)
        VersionedTable.compactByZOrderN(session, path, phys(zorderCols), n,
          bloomCols = blooms)
      else rangeCol match {
        case Some(c) =>
          VersionedTable.compactByRange(session, path, phys(Seq(c)).head, n,
            bloomCols = blooms)
        case None =>
          VersionedTable.compact(session, path, statsCols = stats,
            bloomCols = blooms)
      }
    Seq(Row(v))
  }
}

/** `VACUUM t RETAIN <n> VERSIONS [DRY RUN]` —
  * [[VersionedTable.vacuum]] from SQL text: drops manifests older
  * than the newest n versions and every unreferenced batch dir
  * (crash orphans included); returns the latest version (unchanged —
  * vacuum never commits). `DRY RUN` reports what WOULD be reclaimed
  * (one row per manifest/batch dir with bytes, plus the floor) and
  * touches nothing — the look-before-you-destroy step a retention
  * change deserves.
  */
case class GraftVacuumCommand(path: String, keep: Int,
    dryRun: Boolean = false) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    if (!dryRun) GraftDml.versionOutput
    else Seq(
      AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    if (dryRun)
      VersionedTable.vacuumDryRun(session, path, keep).collect().toSeq
    else {
      VersionedTable.vacuum(path, keep)
      Seq(Row(VersionedTable.latestVersion(path).getOrElse(0L)))
    }
}

/** `DESCRIBE DETAIL t` — one metadata-only row about the current
  * state (the Delta verb): latest version, data/tombstone batch
  * counts (the OPTIMIZE trigger at a glance), retained versions,
  * declared key, metadata generation, mapping flag, vacuum floor.
  */
case class GraftDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_data_batches", LongType, nullable = false)(),
    AttributeReference("n_tombstones", LongType, nullable = false)(),
    AttributeReference("n_retained_versions", LongType, nullable = false)(),
    AttributeReference("key", StringType, nullable = true)(),
    AttributeReference("meta_generation", LongType, nullable = false)(),
    AttributeReference("column_mapped", org.apache.spark.sql.types
      .BooleanType, nullable = false)(),
    AttributeReference("vacuum_floor", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] =
    VersionedTable.detail(session, path).collect().toSeq
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` — the SQL face of
  * [[VersionedTable.restore]]: a metadata-only rewind commit (the
  * restored manifest's entries re-published as the next version);
  * history preserved, retention-floor violations refuse loudly,
  * incremental consumers re-seed (the documented Delta caveat).
  * Returns the committed version.
  */
case class GraftRestoreCommand(path: String, toVersion: Long)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftDml.versionOutput
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.restore(path, toVersion)))
}

/** `DESCRIBE HISTORY t` — the commit log as rows (version / kind /
  * n_add / n_delete / txn / ts), straight off
  * [[VersionedTable.history]]: manifest metadata only, bounded by
  * retention at any table size. `ts` is the recorded commit
  * wall-time (epoch millis, round 16) — null for manifests written
  * before the header existed.
  */
case class GraftDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("n_add", LongType, nullable = false)(),
    AttributeReference("n_delete", LongType, nullable = false)(),
    AttributeReference("txn", StringType, nullable = true)(),
    AttributeReference("ts", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] =
    VersionedTable.history(session, path).collect().toSeq
}
