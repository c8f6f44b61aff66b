package graft.sql

import org.apache.spark.sql.{GraftStreamingBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{AliasIdentifier, FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}
import graft.catalog.GraftCatalogs
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
  * TWO ROUTES since round 14: statements over CATALOG identifiers
  * (`graft.<t>`) are NOT intercepted here — they flow to Spark's own
  * analyzer and the native row-level rewrite
  * ([[graft.catalog.GraftRowLevelOperation]]), which additionally
  * serves non-key merge conditions. This command route remains for
  * PATH-registered names (no catalog identity for Spark to resolve);
  * since round 17 it also serves NOT MATCHED BY SOURCE, explicit
  * INSERT column lists, and key-moving UPDATEs — only
  * non-key-equality merge conditions still refuse loudly naming the
  * catalog route, never silently degrade.
  */
object GraftSql {

  /** A SQL-visible versioned table: its path and merge-key columns —
    * ONE column for the classic single-key tables, SEVERAL for
    * composite primary keys (the reference's own sync_runs /
    * experiments / file_inventory all key on two columns,
    * `agf_ingestion_lambda.py:229,303,337`).
    */
  final case class Registration(path: String, keyCols: Seq[String]) {
    def keyDisplay: String = keyCols.mkString(", ")
  }

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  /** Bind `name` (SQL-visible, case-insensitive) to a versioned table
    * path and its merge key — `keyCol` accepts a comma-separated list
    * for composite keys, the same grammar as
    * `TBLPROPERTIES('key'='k1,k2')` on catalog tables.
    */
  def register(name: String, path: String, keyCol: String): Unit = {
    tables.put(name.toLowerCase(java.util.Locale.ROOT),
      Registration(path, splitKey(keyCol)))
    ()
  }

  /** The shared key-list grammar: comma-separated column names. */
  private[graft] def splitKey(spec: String): Seq[String] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  def unregister(name: String): Unit = {
    tables.remove(name.toLowerCase(java.util.Locale.ROOT)); ()
  }

  /** Bounded engine-side recompute retries for catalog DML whose
    * pinned commit lost the version race (see
    * [[GraftRetryingDmlCommand]]); retries AFTER the first attempt.
    */
  val DmlMaxRetriesConf = "spark.graft.dml.maxRetries"

  /** Whether a DML target is a CATALOG-resolved graft table (and not
    * shadowed by a path registration): these statements execute
    * through Spark's native row-level route, whose commit is a
    * single pinned-snapshot attempt — the engine wraps them in the
    * bounded recompute-retry command.
    */
  private def catalogDmlTarget(plan: LogicalPlan): Boolean = {
    val parts = plan match {
      case u: UnresolvedRelation => Some(u.multipartIdentifier)
      case SubqueryAlias(_, u: UnresolvedRelation) =>
        Some(u.multipartIdentifier)
      case _ => None
    }
    parts.exists(p =>
      lookupRegistered(p).isEmpty && GraftCatalogs.lookup(p).nonEmpty)
  }

  /** EXACT multipart match only — no last-part fallback: DML on an
    * unrelated catalog table `db.t` whose bare name collides with a
    * registered graft name must pass through to Spark untouched, not
    * be silently intercepted and committed to the graft path. A
    * caller that wants `db.t` intercepted registers that exact
    * multipart name. Single-part statements over catalog-backed graft
    * tables resolve through [[GraftCatalogs.lookup]] instead.
    */
  private[sql] def lookup(parts: Seq[String]): Option[Registration] =
    Option(tables.get(
      parts.mkString(".").toLowerCase(java.util.Locale.ROOT)))
      .orElse(GraftCatalogs.lookup(parts))

  /** Registered names ONLY — what INSERT interception consults:
    * catalog-resolved tables take Spark's NATIVE insert path (V2
    * write resolution conforms the query to the table's columns,
    * then the V1Write fallback commits), which is strictly more
    * standard than the positional command below.
    */
  private def lookupRegistered(parts: Seq[String]): Option[Registration] =
    Option(tables.get(
      parts.mkString(".").toLowerCase(java.util.Locale.ROOT)))

  /** The REGISTERED table behind a DML target, unwrapping one
    * optional alias; (registration, alias parts to resolve under —
    * the user's alias, or the full multipart identifier so qualified
    * references like `t.v` resolve). CATALOG names intentionally do
    * NOT match here (round 14): DELETE/UPDATE/MERGE over `graft.<t>`
    * flow through Spark's OWN analyzer to the native row-level route
    * ([[graft.catalog.GraftRowLevelOperation]]) — which also lifts
    * the command route's refusals (NOT MATCHED BY SOURCE, non-key
    * merge conditions, key-column updates). Only path-registered
    * names, which have no catalog identity for Spark to resolve,
    * keep the command route.
    */
  private def target(plan: LogicalPlan): Option[(Registration, Seq[String])] =
    plan match {
      case u: UnresolvedRelation =>
        lookupRegistered(u.multipartIdentifier)
          .map(_ -> u.multipartIdentifier)
      case SubqueryAlias(id, u: UnresolvedRelation) =>
        lookupRegistered(u.multipartIdentifier).map(_ -> Seq(id.name))
      case _ => None
    }

  /** DELETE/UPDATE/MERGE tombstone by key: a catalog table that never
    * declared one refuses loudly naming the fix.
    */
  private def requireKey(reg: Registration): Unit =
    if (reg.keyCols.isEmpty)
      refuse("this table has no merge key: declare it at CREATE TABLE " +
        "with TBLPROPERTIES('key'='<col>[,<col>...]') (or " +
        "GraftSql.register with a keyCol list)")

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft SQL DML: $what. Supported forms over a registered " +
        "versioned table: INSERT INTO t <query>; INSERT OVERWRITE t " +
        "<query>; DELETE FROM t [WHERE p]; MERGE INTO t USING s ON " +
        "t.<key> = s.<key> [AND t.<key2> = s.<key2> ...] WHEN MATCHED " +
        "THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * (drop the " +
        "MATCHED clause for insert-if-absent)")

  private def keyName(e: Expression): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.nameParts.last.toLowerCase(java.util.Locale.ROOT))
    case a: AttributeReference => Some(a.name.toLowerCase(java.util.Locale.ROOT))
    case _ => None
  }

  /** The column set a merge condition equi-binds, when it is exactly
    * a conjunction of same-name equalities (`t.k1 = s.k1 AND t.k2 =
    * s.k2`); None for any other shape. The caller requires this to
    * cover the registered key set EXACTLY — supersets would silently
    * narrow matching, subsets would tombstone too widely.
    */
  private def keyEqualitySet(e: Expression): Option[Set[String]] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      for (a <- keyEqualitySet(l); b <- keyEqualitySet(r)) yield a ++ b
    case EqualTo(l, r) =>
      (keyName(l), keyName(r)) match {
        case (Some(a), Some(b)) if a == b => Some(Set(a))
        case _ => None
      }
    case _ => None
  }

  /** Rewrite the three DML shapes over registered names; everything
    * else passes through untouched.
    */
  private[sql] def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoStatement =>
      // registered names only: INSERT over a CATALOG identifier stays
      // on Spark's native V2 resolution (column conformance by the
      // analyzer, V1Write fallback commit)
      (i.table match {
        case u: UnresolvedRelation => lookupRegistered(u.multipartIdentifier)
        case SubqueryAlias(_, u: UnresolvedRelation) =>
          lookupRegistered(u.multipartIdentifier)
        case _ => None
      }) match {
        case None => plan
        case Some(reg) =>
          if (i.partitionSpec.nonEmpty)
            refuse("PARTITION specs are not supported")
          if (i.userSpecifiedCols.nonEmpty && i.byName)
            refuse("an explicit column list and BY NAME do not compose " +
              "(the list fixes positions, BY NAME ignores them); use one")
          if (i.userSpecifiedCols.nonEmpty && reg.keyCols.nonEmpty) {
            // a list omitting a merge-key column would null-fill the
            // key; registered paths carry no metadata-level key gate
            // (the catalog route does), so refuse at the statement
            val lcs = i.userSpecifiedCols
              .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
            reg.keyCols.find(k =>
              !lcs(k.toLowerCase(java.util.Locale.ROOT))).foreach(k =>
              refuse(s"the INSERT column list must include merge-key " +
                s"column '$k' (a null-filled key never silently lands)"))
          }
          GraftInsertCommand(reg.path, i.query, i.overwrite, i.byName,
            i.userSpecifiedCols)
      }
    case DeleteFromTable(t, condition) =>
      target(t) match {
        case None =>
          if (catalogDmlTarget(t)) GraftRetryingDmlCommand(plan) else plan
        case Some((reg, alias)) =>
          requireKey(reg)
          GraftDeleteCommand(reg.path, reg.keyCols, alias,
            new GraftExprBox(condition))
      }
    case u: UpdateTable =>
      target(u.table) match {
        case None =>
          if (catalogDmlTarget(u.table)) GraftRetryingDmlCommand(plan)
          else plan
        case Some((reg, alias)) =>
          requireKey(reg)
          val assigns = u.assignments.map { a =>
            val name = keyName(a.key).getOrElse(
              refuse(s"unsupported UPDATE assignment target ${a.key}"))
            name -> new GraftExprBox(a.value)
          }
          GraftUpdateCommand(reg.path, reg.keyCols, alias, assigns,
            u.condition.map(new GraftExprBox(_)))
      }
    case m: MergeIntoTable =>
      target(m.targetTable) match {
        case None =>
          if (catalogDmlTarget(m.targetTable)) GraftRetryingDmlCommand(plan)
          else plan
        case Some((reg, aliasParts)) =>
          requireKey(reg)
          val keyLcs = reg.keyCols.map(_.toLowerCase(java.util.Locale.ROOT))
          // the condition must equi-bind EXACTLY the key set — one
          // equality per key column, conjoined in any order
          val keyOk = keyEqualitySet(m.mergeCondition)
            .contains(keyLcs.toSet)
          if (!keyOk)
            refuse(s"the merge condition must be a conjunction of " +
              s"equalities covering exactly the registered key " +
              s"column(s) '${reg.keyDisplay}' on both sides")
          // NOT MATCHED BY SOURCE (round 17): target rows matching NO
          // source row — DELETE or UPDATE with target-only
          // assignments. Expresses the reference's reconciliation J1
          // (insert-if-absent + delete-absent) as ONE atomic MERGE.
          val notMatchedBySource = m.notMatchedBySourceActions.map {
            case DeleteAction(cond) =>
              GraftMatchedDelete(cond.map(new GraftExprBox(_)))
            case UpdateAction(cond, assigns, _) =>
              val pairs = assigns.map { a =>
                val n = keyName(a.key).getOrElse(
                  refuse(s"unsupported UPDATE assignment target ${a.key}"))
                if (keyLcs.contains(n))
                  refuse(s"NOT MATCHED BY SOURCE UPDATE of merge-key " +
                    s"column '$n' is not supported")
                n -> new GraftExprBox(a.value)
              }
              GraftMatchedUpdate(cond.map(new GraftExprBox(_)), Some(pairs))
            case other =>
              refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action " +
                s"$other (DELETE and UPDATE SET only — no source " +
                "columns are in scope)")
          }
          (m.matchedActions, m.notMatchedActions) match {
            // the two unconditional star forms keep the proven direct
            // upsert path (blind-retry OCC is serializable there, and
            // insert-only carries its own conflict analysis) — only
            // when no BY SOURCE clause needs the generalized command
            case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)))
                if notMatchedBySource.isEmpty =>
              GraftMergeCommand(reg.path, reg.keyCols, m.sourceTable,
                insertOnly = false)
            case (Seq(), Seq(InsertStarAction(None)))
                if notMatchedBySource.isEmpty =>
              GraftMergeCommand(reg.path, reg.keyCols, m.sourceTable,
                insertOnly = true)
            case _ =>
              // conditional / partial / DELETE / column-list forms:
              // the generalized read-modify-write command
              val matched = m.matchedActions.map {
                case UpdateStarAction(cond) =>
                  GraftMatchedUpdate(cond.map(new GraftExprBox(_)), None)
                case UpdateAction(cond, assigns, _) =>
                  val pairs = assigns.map { a =>
                    val n = keyName(a.key).getOrElse(
                      refuse(s"unsupported UPDATE assignment target ${a.key}"))
                    if (keyLcs.contains(n))
                      refuse(s"MERGE UPDATE of merge-key column " +
                        s"'$n' is not supported")
                    n -> new GraftExprBox(a.value)
                  }
                  GraftMatchedUpdate(cond.map(new GraftExprBox(_)),
                    Some(pairs))
                case DeleteAction(cond) =>
                  GraftMatchedDelete(cond.map(new GraftExprBox(_)))
                case other =>
                  refuse(s"unsupported WHEN MATCHED action $other")
              }
              val notMatched = m.notMatchedActions.map {
                case InsertStarAction(cond) =>
                  GraftNotMatchedInsert(cond.map(new GraftExprBox(_)), None)
                case InsertAction(cond, assigns) =>
                  val pairs = assigns.map { a =>
                    val n = keyName(a.key).getOrElse(
                      refuse(s"unsupported INSERT column target ${a.key}"))
                    n -> new GraftExprBox(a.value)
                  }
                  GraftNotMatchedInsert(cond.map(new GraftExprBox(_)),
                    Some(pairs))
                case other =>
                  refuse(s"unsupported WHEN NOT MATCHED action $other")
              }
              GraftMergeIntoCommand(reg.path, reg.keyCols, aliasParts,
                m.sourceTable, new GraftExprBox(m.mergeCondition),
                matched, notMatched, notMatchedBySource)
          }
      }
    case other => other
  }
}

/** Matched/not-matched clause forms of the generalized MERGE — parsed
  * conditions and assignment values travel boxed (resolution happens
  * at RUN time, under the statement's own aliases over the current
  * view joined to the source).
  */
sealed trait GraftMatchedForm extends Serializable {
  def cond: Option[GraftExprBox]
}
/** UPDATE SET — `assigns = None` is SET * (every column from the
  * source by name).
  */
case class GraftMatchedUpdate(cond: Option[GraftExprBox],
    assigns: Option[Seq[(String, GraftExprBox)]]) extends GraftMatchedForm
case class GraftMatchedDelete(cond: Option[GraftExprBox])
    extends GraftMatchedForm
/** INSERT — `assigns = None` is INSERT * (full source rows);
  * explicit column lists null-fill unassigned target columns.
  */
case class GraftNotMatchedInsert(cond: Option[GraftExprBox],
    assigns: Option[Seq[(String, GraftExprBox)]]) extends Serializable

/** `INSERT INTO` (append commit, OCC-retried) / `INSERT OVERWRITE`
  * (atomic whole-table replace; history stays time-travelable).
  * SQL INSERT is BY POSITION (`VALUES (...)` rows carry synthetic
  * `colN` names): against an existing table the query's columns are
  * renamed positionally to the table schema — arity mismatches
  * refuse loudly; `byName = true` (INSERT ... BY NAME) keeps names.
  *
  * After alignment every column is CAST to the table's CURRENT type
  * when the cast is provably lossless (`Cast.canUpCast` — the
  * analyzer's own up-cast matrix), refusing loudly otherwise:
  * without the cast, `INSERT INTO t VALUES (1, ...)` into a LONG
  * column would commit an INT-typed parquet batch, and later plain
  * reads (mergeSchema = false) would infer a schema that depends on
  * file pick order — nondeterministic, or a forced widen read. The
  * table's declared types win; a lossy source (string into long,
  * long into int) is a type error, not a silent coercion.
  */
case class GraftInsertCommand(path: String, query: LogicalPlan,
    overwrite: Boolean, byName: Boolean,
    userCols: Seq[String] = Seq.empty) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    val raw0 = GraftStreamingBridge.ofRows(session, query)
    // INSERT INTO t (c1, c2, ...): the list fixes the POSITIONAL
    // meaning of the query's columns (round 17 — previously refused).
    // Unknown names refuse loudly; duplicates refuse; arity must
    // match the list. Columns the list omits null-fill TYPED below
    // (the reference's optional-field defaults, P15) — except that a
    // missing merge-key column still refuses at commit (a NULL key
    // never silently lands).
    val raw =
      if (userCols.isEmpty) raw0
      else {
        val lcOf = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
        require(userCols.map(lcOf).distinct.length == userCols.length,
          s"graft INSERT: duplicate column(s) in the explicit list " +
            s"(${userCols.mkString(", ")})")
        require(raw0.columns.length == userCols.length,
          s"graft INSERT: the column list names ${userCols.length} " +
            s"column(s) but the query produces ${raw0.columns.length}")
        raw0.toDF(userCols.toIndexedSeq: _*)
      }
    val df = VersionedTable.latestVersion(path) match {
      case Some(latest) =>
        // alignment speaks the LOGICAL schema (identity without
        // column mapping); the commit path's toStored is the single
        // logical->physical translation point — aligning to physical
        // names here double-translated under rename+re-add mappings.
        // The target is the CONTENT schema completed with DECLARED
        // columns no batch carries yet: a column added by ALTER TABLE
        // ADD COLUMNS must be nameable in a column-list/BY NAME
        // INSERT before its first batch lands (the data-derived
        // schema alone refused it as unknown on path-registered
        // tables), while content-only extras path writes added
        // without DDL stay nameable too.
        val contentSchema = VersionedTable.readAt(session, path, latest).schema
        val tableSchema =
          graft.catalog.GraftTableMeta.readLatest(path) match {
            case Some(m) =>
              val lcOf = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
              val haveLc = contentSchema.fieldNames.map(lcOf).toSet
              val missing = m.schema.fields.toSeq
                .filterNot(f => haveLc(lcOf(f.name)))
                .map(f => org.apache.spark.sql.types.StructField(f.name,
                  graft.catalog.ColumnMapping.logicalType(f.dataType),
                  nullable = true))
              org.apache.spark.sql.types.StructType(
                contentSchema.fields.toSeq ++ missing)
            case None => contentSchema
          }
        val aligned =
          if (byName || userCols.nonEmpty) {
            // BY NAME (and the explicit column list, which fixes the
            // query's names above) validates the column SET against
            // the table: unknown columns refuse (they would land
            // silently), missing columns null-fill TYPED in table
            // order — the committed batch always carries the full
            // current schema, so plain reads never become
            // file-pick-order-dependent (the same hazard the
            // positional arity check closes)
            val lcOf = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
            val tableCols = tableSchema.fieldNames.map(lcOf).toSet
            val unknown = raw.columns.filterNot(c => tableCols(lcOf(c)))
            if (unknown.nonEmpty)
              throw new IllegalArgumentException(
                s"graft INSERT: column(s) ${unknown.mkString(", ")} " +
                  "do not exist in the table (unknown columns would land " +
                  "silently); project them away or ALTER TABLE first")
            val have = raw.columns.map(lcOf).toSet
            raw.select(tableSchema.fields.map { f =>
              if (have(lcOf(f.name))) col(f.name)
              else org.apache.spark.sql.functions.lit(null)
                .cast(f.dataType).as(f.name)
            }.toIndexedSeq: _*)
          } else {
            require(tableSchema.length == raw.columns.length,
              s"INSERT arity mismatch: table has ${tableSchema.length} " +
                s"columns (${tableSchema.fieldNames.mkString(", ")}), " +
                s"query produces ${raw.columns.length}")
            raw.toDF(tableSchema.fieldNames.toIndexedSeq: _*)
          }
        val typeOf = tableSchema
          .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType)
          .toMap
        val conformed = aligned.schema.fields.map { f =>
          typeOf.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
            case None | Some(f.dataType) => col(f.name)
            case Some(want) if Cast.canUpCast(f.dataType, want) =>
              col(f.name).cast(want).as(f.name)
            case Some(want) => throw new IllegalArgumentException(
              s"graft INSERT: column ${f.name} is ${f.dataType.sql} in " +
                s"the query but ${want.sql} in the table, and the cast is " +
                "not lossless (lossy coercion refused); cast explicitly " +
                "in the query")
          }
        }
        aligned.select(conformed.toIndexedSeq: _*)
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
case class GraftDeleteCommand(path: String, keyCols: Seq[String],
    alias: Seq[String], condition: GraftExprBox) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val latest = VersionedTable.latestVersion(path).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE from empty graft table at $path"))
    val view = VersionedTable.readAtAutoPhysical(session, path, latest)
    // resolve the parsed predicate under the statement's alias
    val aliased = GraftDml.aliased(alias, view.queryExecution.logical)
    val keys = GraftStreamingBridge.ofRows(session,
      Filter(condition.expr, aliased)).select(keyCols.map(col): _*)
    val v = VersionedTable.deleteKeysMulti(keys, keyCols, path)
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
case class GraftMergeCommand(path: String, keyCols: Seq[String],
    source: LogicalPlan, insertOnly: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftStreamingBridge.ofRows(session, source)
    GraftDml.refuseDuplicateSourceKeys(src, keyCols)
    VersionedTable.latestVersion(path).foreach { latest =>
      // compare in LOGICAL names — the source speaks them, and
      // upsertMulti's toStored does the one logical->physical hop
      val targetCols = VersionedTable.readAt(session, path, latest)
        .columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val srcCols = src.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      require(srcCols == targetCols,
        s"MERGE INTO with UPDATE SET * / INSERT * needs matching " +
          s"schemas: target $targetCols vs source $srcCols")
    }
    val v = VersionedTable.upsertMulti(src, keyCols, path,
      insertOnly = insertOnly, maxRetries = 3)
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
  * unmatched rows untouched, history time-travelable. Updating a
  * merge-key column routes through delete(old key) + insert(new row)
  * in one pinned-snapshot commit (round 17 — the native row-level
  * route's representUpdateAsDeleteAndInsert shape); a selective
  * WHERE pays the auto-pruned read, not a table scan.
  */
case class GraftUpdateCommand(path: String, keyCols: Seq[String],
    alias: Seq[String], assignments: Seq[(String, GraftExprBox)],
    condition: Option[GraftExprBox]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
    val keyLcs = keyCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val movesKey =
      assignments.exists(a => keyLcs(a._1.toLowerCase(java.util.Locale.ROOT)))
    var attempt = 0
    while (true) {
      val latest = VersionedTable.latestVersion(path).getOrElse(
        throw new IllegalArgumentException(
          s"UPDATE on empty graft table at $path"))
      val view = VersionedTable.readAtAutoPhysical(session, path, latest)
      val aliased = GraftDml.aliased(alias, view.queryExecution.logical)
      val cond = condition.map(_.expr).getOrElse(Literal(true))
      val assignOf = assignments.toMap
      val matched = Filter(cond, aliased)
      val projectList: Seq[NamedExpression] = view.columns.toSeq.map { c =>
        assignOf.get(c.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(box) => Alias(box.expr, c)()
          case None => UnresolvedAttribute(Seq(c))
        }
      }
      if (!movesKey) {
        // key-preserving: one last-writer-wins upsert (matched keys
        // replaced atomically; blind OCC retry is serializable here)
        val updated = GraftStreamingBridge.ofRows(session,
          Project(projectList, matched))
        val v = VersionedTable.upsertMulti(updated, keyCols, path,
          maxRetries = 3)
        return Seq(Row(v))
      }
      // KEY-MOVING UPDATE (round 17 — previously refused): modeled as
      // delete(old key) + insert(new row), the same shape the native
      // row-level route declares (representUpdateAsDeleteAndInsert) —
      // ONE atomic commit of the old keys' tombstone plus the
      // re-keyed rows, CDC-visible as preimage/postimage. Two rows
      // moving onto ONE key refuse (both would survive the commit);
      // a moved key landing on an EXISTING row replaces it
      // (last-writer-wins, the upsert contract). The commit is
      // pinned to this read's snapshot: an interleaved commit forces
      // a full recompute, never a blind re-commit.
      //
      // BOTH frames are CACHED for the attempt (GraftMergeIntoCommand's
      // discipline): the matched set is probed, key-projected, and
      // committed, and the updated projection is probed twice (dup
      // guard, emptiness) before its write — without pinning, a
      // non-deterministic WHERE or SET (rand()) re-evaluates per job
      // and the delete set silently diverges from the re-insert set.
      import org.apache.spark.sql.functions.{count, lit}
      val matchedDf = GraftStreamingBridge.ofRows(session, matched).cache()
      val updated = GraftStreamingBridge.ofRows(session,
        Project(projectList, matchedDf.queryExecution.analyzed)).cache()
      try {
        val dupNew = updated.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .limit(1).count() > 0
        if (dupNew)
          throw new UnsupportedOperationException(
            s"graft UPDATE: the assignments move two or more rows onto " +
              s"one '${keyCols.mkString(", ")}' key — both would survive " +
              "the same commit as duplicates; make the new key unique " +
              "per row (or DELETE + INSERT an aggregate)")
        val oldKeys = matchedDf.select(keyCols.map(col): _*)
        // a zero-match UPDATE publishes NOTHING: an unfiltered
        // Some(oldKeys) satisfied upsertWithDeletes' tombstone probe
        // by mere presence, committing an empty tombstone batch and a
        // spurious no-op version (empty CDC commit, version bump)
        val data = Some(updated).filterNot(_.isEmpty)
        val dels = Some(oldKeys).filterNot(_.isEmpty)
        if (data.isEmpty && dels.isEmpty) return Seq(Row(latest))
        val v = VersionedTable.upsertWithDeletesMulti(data, dels,
          keyCols, path, expectedSnapshot = Some(latest))
        return Seq(Row(v))
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("already committed") && attempt < 3 =>
          attempt += 1 // recompute against the new latest
      } finally {
        updated.unpersist()
        matchedDf.unpersist()
      }
    }
    Seq(Row(-1L)) // unreachable
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

/** GENERALIZED MERGE — the conditional / partial / DELETE / explicit
  * column-list forms, as one read-modify-write over the current view:
  *
  *   MERGE INTO t USING s ON t.<key> = s.<key>
  *     WHEN MATCHED [AND p1] THEN UPDATE SET c = expr[, ...] | SET *
  *     WHEN MATCHED [AND p2] THEN DELETE
  *     WHEN NOT MATCHED [AND p3] THEN INSERT [(cols)] VALUES (...) | *
  *     WHEN NOT MATCHED BY SOURCE [AND p4] THEN DELETE | UPDATE SET ...
  *
  * NOT MATCHED BY SOURCE clauses act on TARGET rows matching no
  * source row (one target-side anti-join on the merge condition —
  * only target columns are in scope for conditions and assignments).
  * With INSERT * + BY SOURCE DELETE this is the reference's whole
  * reconciliation (J1: insert-if-absent + delete-absent,
  * `agf_reconciliation_lambda.py:64-66`) as ONE atomic commit.
  *
  * Standard first-match-wins clause order: each matched target row
  * takes the FIRST matched clause whose condition holds (no clause →
  * the row is untouched and never rewritten); each unmatched source
  * row takes the first insert clause that holds (none → dropped).
  * Everything lands in ONE atomic commit
  * ([[VersionedTable.upsertWithDeletes]]): a tombstone for
  * updated-or-deleted keys plus the updated+inserted rows —
  * unmatched rows are never rewritten (merge-on-read, not
  * copy-on-write), so a selective MERGE moves data proportional to
  * the rows it touches, not the table.
  *
  * Concurrency: conditions must be re-evaluated against any
  * interleaved commit for serializability, so a version conflict
  * RECOMPUTES the whole read-modify-write against the new latest
  * (bounded retries) instead of blind-retrying the manifest — the
  * honest generalization of the star-form's commute argument.
  *
  * Every projected column is cast to the table's current type when
  * provably lossless (the INSERT rule), refusing loudly otherwise;
  * MERGE against an EMPTY table supports INSERT * only (no schema to
  * null-fill explicit column lists against).
  */
case class GraftMergeIntoCommand(path: String, keyCols: Seq[String],
    targetAlias: Seq[String], source: LogicalPlan,
    mergeCondition: GraftExprBox, matched: Seq[GraftMatchedForm],
    notMatched: Seq[GraftNotMatchedInsert],
    notMatchedBySource: Seq[GraftMatchedForm] = Seq.empty)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def output: Seq[Attribute] = GraftDml.versionOutput

  private val ActCol = "__graft_merge_act"

  private def condCol(c: Option[GraftExprBox]): org.apache.spark.sql.Column =
    c.map(b => org.apache.spark.sql.graftbridge.Bridge.column(b.expr))
      .getOrElse(org.apache.spark.sql.functions.lit(true))

  /** First-match-wins clause index (-1 = no clause applies). */
  private def actionIndex(
      conds: Seq[Option[GraftExprBox]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, when}
    conds.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
      case ((c, i), acc) => when(condCol(c), lit(i)).otherwise(acc)
    }
  }

  private def lc(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.{Column, DataFrame}

    def sourceQual: Seq[String] = source match {
      case SubqueryAlias(id, _) => id.qualifier :+ id.name
      case u: UnresolvedRelation => u.multipartIdentifier
      case _ => throw new UnsupportedOperationException(
        "graft MERGE: alias the source (USING (...) s) to use SET * / " +
          "INSERT * — unaliased subquery columns cannot be qualified")
    }

    GraftDml.refuseDuplicateSourceKeys(
      GraftStreamingBridge.ofRows(session, source), keyCols)
    var attempt = 0
    while (attempt <= 3) {
      val snapshot = VersionedTable.latestVersion(path)
      GraftMergeIntoCommand.testAfterSnapshot.foreach(_(snapshot.getOrElse(0L)))
      val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]
      try {
        val (dataOpt, delOpt) = snapshot match {
          case None =>
            // empty table: every source row is unmatched
            val srcDf = GraftStreamingBridge.ofRows(session, source)
            if (notMatched.exists(_.assigns.nonEmpty))
              throw new UnsupportedOperationException(
                "graft MERGE into an EMPTY table supports INSERT * only " +
                  "(no table schema to null-fill an explicit column " +
                  "list against)")
            val idx = actionIndex(notMatched.map(_.cond))
            val markedIns = srcDf.withColumn(ActCol, idx).cache()
            cached += markedIns
            val ins = markedIns.filter(org.apache.spark.sql.functions
              .col(ActCol) >= 0).drop(ActCol)
            (if (notMatched.isEmpty || ins.isEmpty) None else Some(ins), None)
          case Some(v) =>
            val view = VersionedTable.readAtAutoPhysical(session, path, v)
            val targetSchema = view.schema
            val targetCols = targetSchema.fieldNames.toSeq
            val tPlan = GraftDml.aliased(targetAlias,
              view.queryExecution.logical)
            def tCol(c: String): Column =
              Bridge.column(UnresolvedAttribute(targetAlias :+ c))
            def sCol(c: String): Column =
              Bridge.column(UnresolvedAttribute(sourceQual :+ c))

            val updatedParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
            val deletedParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
            if (matched.nonEmpty) {
              val joined = GraftStreamingBridge.ofRows(session,
                Join(tPlan, source, Inner, Some(mergeCondition.expr),
                  JoinHint.NONE))
              val marked = joined
                .withColumn(ActCol, actionIndex(matched.map(_.cond))).cache()
              cached += marked
              matched.zipWithIndex.foreach {
                case (u: GraftMatchedUpdate, i) =>
                  val rows = marked.filter(
                    org.apache.spark.sql.functions.col(ActCol) === lit(i))
                  val assignOf = u.assigns.map(_.map {
                    case (n, b) => lc(n) -> b }.toMap).getOrElse(Map.empty)
                  val projected = rows.select(targetCols.map { c =>
                    if (u.assigns.isEmpty) sCol(c).as(c)
                    else assignOf.get(lc(c)) match {
                      case Some(box) => Bridge.column(box.expr).as(c)
                      case None => tCol(c).as(c)
                    }
                  }: _*)
                  updatedParts += GraftDml.conformTo(projected, targetSchema)
                case (_: GraftMatchedDelete, i) =>
                  deletedParts += marked.filter(
                    org.apache.spark.sql.functions.col(ActCol) === lit(i))
                    .select(keyCols.map(k => tCol(k).as(k)): _*)
              }
            }
            if (notMatchedBySource.nonEmpty) {
              // target rows matching NO source row: one target-side
              // anti-join; only target columns are in scope, so
              // conditions/assignments referencing the source fail
              // resolution loudly
              val absent = GraftStreamingBridge.ofRows(session,
                Join(tPlan, source, LeftAnti, Some(mergeCondition.expr),
                  JoinHint.NONE))
              val markedAbs = absent.withColumn(ActCol,
                actionIndex(notMatchedBySource.map(_.cond))).cache()
              cached += markedAbs
              notMatchedBySource.zipWithIndex.foreach {
                case (u: GraftMatchedUpdate, i) =>
                  val rows = markedAbs.filter(
                    org.apache.spark.sql.functions.col(ActCol) === lit(i))
                  val assignOf = u.assigns.map(_.map {
                    case (n, b) => lc(n) -> b }.toMap).getOrElse(Map.empty)
                  val projected = rows.select(targetCols.map { c =>
                    assignOf.get(lc(c)) match {
                      case Some(box) => Bridge.column(box.expr).as(c)
                      case None => tCol(c).as(c)
                    }
                  }: _*)
                  updatedParts += GraftDml.conformTo(projected, targetSchema)
                case (_: GraftMatchedDelete, i) =>
                  deletedParts += markedAbs.filter(
                    org.apache.spark.sql.functions.col(ActCol) === lit(i))
                    .select(keyCols.map(k => tCol(k).as(k)): _*)
              }
            }
            val insertedParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
            if (notMatched.nonEmpty) {
              val anti = GraftStreamingBridge.ofRows(session,
                Join(source, tPlan, LeftAnti, Some(mergeCondition.expr),
                  JoinHint.NONE))
              val markedIns = anti
                .withColumn(ActCol, actionIndex(notMatched.map(_.cond)))
                .cache()
              cached += markedIns
              notMatched.zipWithIndex.foreach { case (ins, i) =>
                val rows = markedIns.filter(
                  org.apache.spark.sql.functions.col(ActCol) === lit(i))
                val projected = ins.assigns match {
                  case None =>
                    // INSERT *: source columns by name (anti-join
                    // output carries ONLY source attrs — unambiguous)
                    rows.select(targetCols.map(c =>
                      org.apache.spark.sql.functions.col(c).as(c)): _*)
                  case Some(pairs) =>
                    val assignOf = pairs.map {
                      case (n, b) => lc(n) -> b }.toMap
                    keyCols.foreach(k => require(assignOf.contains(lc(k)),
                      s"graft MERGE: the INSERT column list must assign " +
                        s"every merge-key column (missing '$k')"))
                    rows.select(targetSchema.fields.toSeq.map { f =>
                      assignOf.get(lc(f.name)) match {
                        case Some(box) => Bridge.column(box.expr).as(f.name)
                        case None => lit(null).cast(f.dataType).as(f.name)
                      }
                    }: _*)
                }
                insertedParts += GraftDml.conformTo(projected, targetSchema)
              }
            }
            val data = (updatedParts ++ insertedParts)
              .reduceOption(_ unionByName _).filterNot(_.isEmpty)
            val dels = deletedParts.reduceOption(_ unionByName _)
              .filterNot(_.isEmpty)
            (data, dels)
        }
        try {
          // the commit is PINNED to this iteration's snapshot read:
          // a commit interleaving anywhere after it — including the
          // window spanning the read-modify-write jobs above — hits
          // the exclusive manifest create at snapshot+1 and lands in
          // the conflict branch, so the clauses always recompute
          // against the version they commit over (serializability;
          // without the pin, upsertWithDeletes' own re-read silently
          // absorbed commits landing inside that window)
          val v = VersionedTable.upsertWithDeletesMulti(dataOpt, delOpt,
            keyCols, path, expectedSnapshot = Some(snapshot.getOrElse(0L)))
          return Seq(Row(v))
        } catch {
          case e: java.io.IOException
              if e.getMessage.contains("already committed") && attempt < 3 =>
            attempt += 1 // recompute against the new latest
        }
      } finally cached.foreach(_.unpersist())
    }
    throw new java.io.IOException(
      s"graft MERGE into $path: gave up after repeated commit conflicts")
  }
}

object GraftMergeIntoCommand {
  /** Test seam: runs right after each attempt's snapshot read, so a
    * spec can interleave a competing commit inside the exact window
    * the round-14 serializability fix closes (and prove racing
    * conditional MERGEs serialize per key).
    */
  private[graft] var testAfterSnapshot: Option[Long => Unit] = None
}

/** ENGINE-SIDE BOUNDED RETRY for conflicted catalog DML (round-15
  * verdict #3): DELETE/UPDATE/MERGE over a catalog name executes
  * through Spark's native row-level route, whose delta commit is
  * PINNED at the snapshot the statement read — an interleaved commit
  * makes it fail loudly rather than absorb the interleave (the
  * serializability contract). Until now the caller had to script the
  * recompute-retry loop itself; this command is that loop, inside the
  * engine (Delta's behavior): each attempt RE-ANALYZES the original
  * statement, so the table loads fresh, the clauses re-evaluate
  * against the NEW latest, and the commit re-pins there — never a
  * blind re-commit of stale delta files. Only the version-race
  * conflict retries; every other failure propagates unchanged.
  * Bounded by [[GraftSql.DmlMaxRetriesConf]] (default 3 recomputes) —
  * exhaustion refuses loudly naming the conf, because unbounded
  * retries under sustained contention just hide a design problem.
  */
case class GraftRetryingDmlCommand(statement: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(statement)
  override def output: Seq[Attribute] = Seq.empty

  private def versionConflict(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.isInstanceOf[java.io.IOException] && c.getMessage != null &&
        c.getMessage.contains("already committed")) return true
      c = c.getCause
    }
    false
  }

  override def run(session: SparkSession): Seq[Row] = {
    val maxRetries =
      session.conf.get(GraftSql.DmlMaxRetriesConf, "3").toInt
    var attempt = 0
    while (true) {
      try {
        // fresh analysis per attempt: loadTable re-pins the snapshot
        // at the current latest, and the row-level rewrite recomputes
        // the delta against it
        GraftStreamingBridge.ofRows(session, statement).collect()
        return Seq.empty
      } catch {
        case e: Throwable if versionConflict(e) =>
          attempt += 1
          if (attempt > maxRetries)
            throw new java.io.IOException(
              s"graft DML: gave up after $maxRetries recompute retries — " +
                "a competing writer interleaved with every attempt " +
                s"(each recomputed against the then-latest version); " +
                s"raise ${GraftSql.DmlMaxRetriesConf} or serialize the " +
                "writers", e)
      }
    }
    Seq.empty // unreachable
  }
}

private[sql] object GraftDml {
  /** Every DML command returns the committed version — the SQL-side
    * receipt of the manifest rename.
    */
  def versionOutput: Seq[Attribute] = Seq(AttributeReference(
    "version", org.apache.spark.sql.types.LongType, nullable = false)())

  /** The statement's target wrapped so BOTH the bare alias and
    * qualified multipart references (`graft.db.t.c`) resolve.
    */
  def aliased(parts: Seq[String], child: LogicalPlan): LogicalPlan =
    SubqueryAlias(AliasIdentifier(parts.last, parts.init), child)

  /** The SQL-standard MERGE cardinality rule: each target row may be
    * touched by AT MOST ONE source row, so a source carrying
    * duplicate merge keys refuses loudly BEFORE any commit — without
    * this check the duplicates would silently land as duplicate rows
    * of one key (both survive the tombstone they ride with). Delta
    * raises the same error and pays the same price: one aggregation
    * pass over the source per MERGE statement.
    */
  def refuseDuplicateSourceKeys(src: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{count, lit}
    val dup = src.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count() > 0
    if (dup)
      throw new UnsupportedOperationException(
        s"graft MERGE: the source carries duplicate " +
          s"'${keyCols.mkString(", ")}' keys — each target row may " +
          "match at most one source row (the SQL MERGE cardinality " +
          "rule); deduplicate the source first (aggregate, or rank " +
          "and keep one row per key)")
  }

  /** Cast every column to the table's current type when provably
    * lossless (`Cast.canUpCast`), refusing loudly otherwise — the
    * write-side type conformance every SQL verb shares.
    */
  def conformTo(df: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    val want = schema.map(f =>
      f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
    val projected = df.schema.fields.map { f =>
      want.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
        case None | Some(f.dataType) => col(f.name)
        case Some(w) if Cast.canUpCast(f.dataType, w) =>
          col(f.name).cast(w).as(f.name)
        case Some(w) => throw new IllegalArgumentException(
          s"graft DML: column ${f.name} is ${f.dataType.sql} in the " +
            s"statement but ${w.sql} in the table, and the cast is not " +
            "lossless; cast explicitly")
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }
}

/** The delegating parser: Spark's own grammar does ALL parsing; the
  * only intervention is the post-parse plan rewrite of DML shapes
  * over [[GraftSql.register]]ed names. Injected by GraftExtensions.
  */
class GraftDmlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    // maintenance verbs (OPTIMIZE/VACUUM/DESCRIBE HISTORY) are not in
    // Spark's grammar: screen the raw text first (the Delta parser
    // pattern). A maintenance verb over a NON-graft identifier
    // delegates — a co-installed engine below us must receive its own
    // OPTIMIZE/VACUUM — and only if the downstream parser also
    // rejects it does the loud name-the-fix refusal fire.
    GraftMaintenanceSql.parse(sqlText, delegate).getOrElse {
      try GraftSql.rewrite(delegate.parsePlan(sqlText))
      catch {
        case pe: ParseException =>
          GraftMaintenanceSql.refusalFor(sqlText) match {
            case Some(msg) => throw new IllegalArgumentException(msg, pe)
            case None => throw pe
          }
      }
    }
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
