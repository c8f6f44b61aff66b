package graft.sql

import org.apache.spark.sql.{GraftStreamingBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}
import graft.operators.VersionedTable

/** SQL DML for versioned tables — `INSERT INTO` / `MERGE INTO` /
  * `DELETE FROM` as plain SQL text, reaching the same
  * `append` / `upsert` / `deleteKeys` commit machinery (OCC retries,
  * atomic manifest renames, merge-on-read tombstones) the Scala API
  * uses. This closes the write half of the SQL surface: reads have
  * gone through the `graft_versioned` TVF since q284, but a
  * JDBC/thrift user could query and not write.
  *
  * Mechanics: [[GraftSql.register]] binds a SQL-visible name to a
  * table path plus its merge key, and the injected parser
  * ([[GraftDmlParser]], via `GraftExtensions.injectParser`) lets
  * Spark's OWN grammar parse every statement, then rewrites the three
  * DML plan shapes over registered names into runnable commands —
  * no custom grammar, so every SQL nicety (subqueries in USING,
  * expressions in WHERE) arrives already parsed:
  *
  *  - `INSERT INTO t SELECT ...`            -> `appendWithRetry`
  *  - `INSERT OVERWRITE [TABLE] t SELECT …` -> `overwrite` (atomic
  *    whole-table replace, history kept)
  *  - `DELETE FROM t [WHERE p]`             -> `deleteKeys` of the
  *    keys matching `p` in the CURRENT view (merge-on-read: no data
  *    rewrite; the predicate may touch any column — keys are
  *    computed by filtering the view, batch-pruned like any read)
  *  - `MERGE INTO t USING src ON t.<k> = src.<k>
  *       WHEN MATCHED THEN UPDATE SET *
  *       WHEN NOT MATCHED THEN INSERT *`    -> `upsertWithRetry`
  *    (last-writer-wins; dropping the MATCHED clause gives
  *    insert-if-absent, J3) — q296 proves the SQL text path
  *    hash-identical to the Scala `upsert` oracle;
  *  - `UPDATE t SET c = expr[, ...] [WHERE p]` -> matched rows of
  *    the current view re-projected with the assignments and
  *    committed as ONE last-writer-wins upsert (key-column updates
  *    refused — the old key's rows would survive).
  *
  * Anything else over a registered name — partial UPDATE SET lists,
  * extra conditions on the clauses, NOT MATCHED BY SOURCE,
  * non-key-equality merge conditions — refuses loudly naming the
  * supported forms, never silently degrades. Statements over
  * UNregistered names pass through untouched, so the interceptor is
  * invisible to the rest of the session.
  */
object GraftSql {

  final case class Registration(path: String, keyCol: String)

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  /** Bind `name` (SQL-visible, case-insensitive) to a versioned table
    * path and its merge-key column.
    */
  def register(name: String, path: String, keyCol: String): Unit = {
    tables.put(name.toLowerCase(java.util.Locale.ROOT),
      Registration(path, keyCol))
    ()
  }

  def unregister(name: String): Unit = {
    tables.remove(name.toLowerCase(java.util.Locale.ROOT)); ()
  }

  private def lookup(parts: Seq[String]): Option[Registration] =
    Option(tables.get(
      parts.mkString(".").toLowerCase(java.util.Locale.ROOT)))
      .orElse(Option(tables.get(
        parts.last.toLowerCase(java.util.Locale.ROOT))))

  /** The registered table behind a DML target, unwrapping one
    * optional alias; (registration, alias-to-resolve-under).
    */
  private def target(plan: LogicalPlan): Option[(Registration, String)] =
    plan match {
      case u: UnresolvedRelation =>
        lookup(u.multipartIdentifier)
          .map(_ -> u.multipartIdentifier.last)
      case SubqueryAlias(id, u: UnresolvedRelation) =>
        lookup(u.multipartIdentifier).map(_ -> id.name)
      case _ => None
    }

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft SQL DML: $what. Supported forms over a registered " +
        "versioned table: INSERT INTO t <query>; INSERT OVERWRITE t " +
        "<query>; DELETE FROM t [WHERE p]; MERGE INTO t USING s ON " +
        "t.<key> = s.<key> WHEN MATCHED THEN UPDATE SET * WHEN NOT " +
        "MATCHED THEN INSERT * (drop the MATCHED clause for " +
        "insert-if-absent)")

  private def keyName(e: Expression): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.nameParts.last.toLowerCase(java.util.Locale.ROOT))
    case a: AttributeReference => Some(a.name.toLowerCase(java.util.Locale.ROOT))
    case _ => None
  }

  /** Rewrite the three DML shapes over registered names; everything
    * else passes through untouched.
    */
  private[sql] def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoStatement =>
      target(i.table) match {
        case None => plan
        case Some((reg, _)) =>
          if (i.partitionSpec.nonEmpty)
            refuse("PARTITION specs are not supported")
          if (i.userSpecifiedCols.nonEmpty)
            refuse("explicit column lists are not supported; insert full rows")
          GraftInsertCommand(reg.path, i.query, i.overwrite, i.byName)
      }
    case DeleteFromTable(t, condition) =>
      target(t) match {
        case None => plan
        case Some((reg, alias)) =>
          GraftDeleteCommand(reg.path, reg.keyCol, alias,
            new GraftExprBox(condition))
      }
    case u: UpdateTable =>
      target(u.table) match {
        case None => plan
        case Some((reg, alias)) =>
          val assigns = u.assignments.map { a =>
            val name = keyName(a.key).getOrElse(
              refuse(s"unsupported UPDATE assignment target ${a.key}"))
            if (name == reg.keyCol.toLowerCase(java.util.Locale.ROOT))
              refuse(s"UPDATE of the merge-key column '${reg.keyCol}' " +
                "is not supported (rewrite via DELETE + INSERT)")
            name -> new GraftExprBox(a.value)
          }
          GraftUpdateCommand(reg.path, reg.keyCol, alias, assigns,
            u.condition.map(new GraftExprBox(_)))
      }
    case m: MergeIntoTable =>
      target(m.targetTable) match {
        case None => plan
        case Some((reg, _)) =>
          val keyOk = m.mergeCondition match {
            case EqualTo(l, r) =>
              val k = reg.keyCol.toLowerCase(java.util.Locale.ROOT)
              keyName(l).contains(k) && keyName(r).contains(k)
            case _ => false
          }
          if (!keyOk)
            refuse(s"the merge condition must be an equality on the " +
              s"registered key column '${reg.keyCol}' of both sides")
          if (m.notMatchedBySourceActions.nonEmpty)
            refuse("NOT MATCHED BY SOURCE is not supported")
          val insertOnly = (m.matchedActions, m.notMatchedActions) match {
            case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
              false
            case (Seq(), Seq(InsertStarAction(None))) => true
            case _ => refuse("only unconditional UPDATE SET * / INSERT * " +
              "clauses are supported")
          }
          GraftMergeCommand(reg.path, reg.keyCol, m.sourceTable, insertOnly)
      }
    case other => other
  }
}

/** `INSERT INTO` (append commit, OCC-retried) / `INSERT OVERWRITE`
  * (atomic whole-table replace; history stays time-travelable).
  * SQL INSERT is BY POSITION (`VALUES (...)` rows carry synthetic
  * `colN` names): against an existing table the query's columns are
  * renamed positionally to the table schema — arity mismatches
  * refuse loudly; `byName = true` (INSERT ... BY NAME) keeps names.
  */
case class GraftInsertCommand(path: String, query: LogicalPlan,
    overwrite: Boolean, byName: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val raw = GraftStreamingBridge.ofRows(session, query)
    val df = VersionedTable.latestVersion(path) match {
      case Some(latest) if !byName =>
        val names = VersionedTable.readAt(session, path, latest).columns
        require(names.length == raw.columns.length,
          s"INSERT arity mismatch: table has ${names.length} columns " +
            s"(${names.mkString(", ")}), query produces " +
            s"${raw.columns.length}")
        raw.toDF(names.toIndexedSeq: _*)
      case _ => raw
    }
    val v =
      if (overwrite) VersionedTable.overwrite(df, path)
      else VersionedTable.appendWithRetry(df, path)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = GraftDml.versionOutput
}

/** `DELETE FROM t [WHERE p]`: keys matching `p` in the current view
  * become one tombstone commit — merge-on-read, zero data rewritten,
  * time travel intact. The predicate filters the auto-pruned view,
  * so a selective WHERE pays index cost, not a table scan.
  */
case class GraftDeleteCommand(path: String, keyCol: String, alias: String,
    condition: GraftExprBox) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val latest = VersionedTable.latestVersion(path).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE from empty graft table at $path"))
    val view = VersionedTable.readAtAuto(session, path, latest)
    // resolve the parsed predicate under the statement's alias
    val aliased = SubqueryAlias(alias,
      view.queryExecution.logical)
    val keys = GraftStreamingBridge.ofRows(session,
      Filter(condition.expr, aliased)).select(col(keyCol))
    val v = VersionedTable.deleteKeys(keys, keyCol, path)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = GraftDml.versionOutput
}

/** `MERGE INTO` in its two key-literal forms: last-writer-wins
  * upsert (UPDATE SET * + INSERT *) or insert-if-absent (INSERT *
  * only), through the SAME OCC retry path as the Scala API — an
  * interleaved commit between parse and commit retries safely
  * (q267's machinery, spec-proven).
  */
case class GraftMergeCommand(path: String, keyCol: String,
    source: LogicalPlan, insertOnly: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftStreamingBridge.ofRows(session, source)
    VersionedTable.latestVersion(path).foreach { latest =>
      val targetCols = VersionedTable.readAt(session, path, latest)
        .columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val srcCols = src.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      require(srcCols == targetCols,
        s"MERGE INTO with UPDATE SET * / INSERT * needs matching " +
          s"schemas: target $targetCols vs source $srcCols")
    }
    val v = VersionedTable.upsertWithRetry(src, keyCol, path,
      insertOnly = insertOnly)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = GraftDml.versionOutput
}

/** `UPDATE t SET c = expr[, ...] [WHERE p]`: read-modify-write
  * through the SAME upsert machinery — the matched rows of the
  * CURRENT view are re-projected with the assignments applied
  * (resolved at run time under the statement's alias, so `SET v =
  * v * 2` reads the pre-update value) and committed as ONE
  * last-writer-wins upsert: matched keys replaced atomically,
  * unmatched rows untouched, history time-travelable. Updating the
  * merge-key column itself refuses loudly (the old key's rows would
  * survive); a selective WHERE pays the auto-pruned read, not a
  * table scan.
  */
case class GraftUpdateCommand(path: String, keyCol: String, alias: String,
    assignments: Seq[(String, GraftExprBox)],
    condition: Option[GraftExprBox]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
    val latest = VersionedTable.latestVersion(path).getOrElse(
      throw new IllegalArgumentException(
        s"UPDATE on empty graft table at $path"))
    val view = VersionedTable.readAtAuto(session, path, latest)
    val aliased = SubqueryAlias(alias, view.queryExecution.logical)
    val cond = condition.map(_.expr).getOrElse(Literal(true))
    val assignOf = assignments.toMap
    val projectList: Seq[NamedExpression] = view.columns.toSeq.map { c =>
      assignOf.get(c.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(box) => Alias(box.expr, c)()
        case None => UnresolvedAttribute(Seq(c))
      }
    }
    val updated = GraftStreamingBridge.ofRows(session,
      Project(projectList, Filter(cond, aliased)))
    val v = VersionedTable.upsertWithRetry(updated, keyCol, path)
    Seq(Row(v))
  }
  override def output: Seq[Attribute] = GraftDml.versionOutput
}

/** Opaque carrier keeping the parsed WHERE out of the command's
  * expression set: the analyzer would otherwise demand resolution
  * against the (childless) command itself, but the predicate can
  * only resolve at RUN time, against the table's current view under
  * the statement's alias.
  */
final class GraftExprBox(val expr: Expression) extends Serializable {
  override def toString: String = expr.sql
  override def hashCode: Int = expr.semanticHash()
  override def equals(o: Any): Boolean = o match {
    case b: GraftExprBox => expr == b.expr
    case _ => false
  }
}

private[sql] object GraftDml {
  /** Every DML command returns the committed version — the SQL-side
    * receipt of the manifest rename.
    */
  def versionOutput: Seq[Attribute] = Seq(AttributeReference(
    "version", org.apache.spark.sql.types.LongType, nullable = false)())
}

/** The delegating parser: Spark's own grammar does ALL parsing; the
  * only intervention is the post-parse plan rewrite of DML shapes
  * over [[GraftSql.register]]ed names. Injected by GraftExtensions.
  */
class GraftDmlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.rewrite(delegate.parsePlan(sqlText))
  @throws[ParseException]
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  @throws[ParseException]
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  @throws[ParseException]
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  @throws[ParseException]
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  @throws[ParseException]
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  @throws[ParseException]
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  @throws[ParseException]
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  @throws[ParseException]
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
