package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native dot product over two numeric array columns: a single fused
  * loop with no intermediate array, with codegen (doGenCode) so it
  * stays inside whole-stage codegen. Replaces
  * aggregate(zip_with(a, b, _*_), 0.0, _+_), which allocates a
  * zipped array per row-pair — measured ~3x faster on the
  * all-pairs cosine workload, and the allocation win grows with
  * vector width.
  *
  * Semantics: elements are widened to double and accumulated in
  * input order (same sequential left fold as the higher-order
  * formulation and DuckDB's list_sum, so results are bit-identical).
  * Arrays of different lengths dot over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def floatElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  /** A null element anywhere yields null — matching the higher-order
    * formulation (zip_with's null product poisons aggregate's sum).
    */
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable(left) || elemsNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float>/array<double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += elem(x, left, i) * elem(y, right, i)
      i += 1
    }
    acc
  }

  private def elem(arr: ArrayData, e: Expression, i: Int): Double =
    if (floatElems(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = if (floatElems(left)) "getFloat" else "getDouble"
      val getB = if (floatElems(right)) "getFloat" else "getDouble"
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += (double)$a.$getA($i) * (double)$b.$getB($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column wrappers + SQL registration for the native expressions. */
object GraftFunctions {

  /** vec_dot as a Column function. */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Register SQL names on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
}

/** SparkSessionExtensions entry point:
  * .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  *
  * Registers the engine's native expressions into the session's
  * FunctionRegistry, making the full surface reachable from plain
  * `spark.sql(...)` text (and thus from JDBC/thrift frontends that
  * never touch the Scala API) — the library boundary a Spark-native
  * engine is expected to expose. Literal-only arguments (bits) are
  * validated at registration call time, not execution time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def literalInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    // automatic manifest-stats data skipping for versioned-table
    // scans (see graft.plans.VersionedStatsPruning): runs with the
    // session optimizer, after Catalyst has pushed user filters down
    // to the scans this rule prunes.
    e.injectOptimizerRule(_ => graft.plans.VersionedStatsPruning)
    // predicates on nested-RENAMED struct fields re-bind to the
    // uncast scan column (the rename cast is positional), so they
    // reach parquet PushedFilters instead of stopping at the cast
    e.injectOptimizerRule(_ => graft.plans.NestedRenamePushdown)
    // SQL DML over registered versioned tables (INSERT/MERGE/DELETE
    // text -> append/upsert/deleteKeys commits): Spark's own grammar
    // parses, graft.sql.GraftSql.rewrite intercepts the three DML
    // shapes over GraftSql.register()ed names, everything else passes
    // through untouched.
    e.injectParser((_, delegate) => new graft.sql.GraftDmlParser(delegate))
    // catalog-resolved graft tables (spark.sql.catalog.<name> =
    // graft.catalog.GraftCatalog) read through the V1 readAtAuto plan:
    // the resolution rule swaps the DataSourceV2Relation for the
    // planned relation (vectorized scan + stats pruning kept), leaving
    // write targets on the native V2 path (V1Write fallback).
    e.injectResolutionRule(_ => graft.catalog.GraftV2Resolution)
    // graft_versioned('<path>'[, <version>]) — the versioned table as
    // a SQL table-valued function: time travel, merge-on-read, and
    // (through the rule above) automatic stats skipping, all
    // reachable from plain SQL text. The builder resolves the
    // KB-sized manifest at analysis time and splices in readAtAuto's
    // analyzed plan; a WHERE on the result is an ordinary Filter
    // over the tagged scans, so SQL queries prune exactly like
    // DataFrame ones (spec-proven).
    e.injectTableFunction((
      new FunctionIdentifier("graft_versioned"),
      new ExpressionInfo("graft.operators.VersionedTable", "graft_versioned"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        val spark = org.apache.spark.sql.SparkSession.active
        val path = exprs.headOption match {
          // catalog identifiers resolve to their storage path
          case Some(Literal(s, StringType)) if s != null =>
            graft.catalog.GraftCatalogs.tvfPath(s.toString)
          case _ => throw new IllegalArgumentException(
            "graft_versioned expects a literal string path (or catalog " +
              "identifier) as its first argument")
        }
        val version = exprs.lift(1) match {
          case Some(Literal(v: Int, IntegerType)) => v.toLong
          case Some(Literal(v: Long, LongType)) => v
          case None => graft.operators.VersionedTable.latestVersion(path)
            .getOrElse(throw new IllegalArgumentException(
              s"graft_versioned: no committed version at $path"))
          case other => throw new IllegalArgumentException(
            s"graft_versioned expects a literal integer version, got $other")
        }
        require(exprs.size <= 2,
          "graft_versioned takes (path[, version])")
        // readAtAuto is mapping-aware EPOCH-correctly since round 16
        // (VERSION AS OF a pre-rename version reads the old names) —
        // a current-mapping logicalView wrap here would re-drop a
        // column that existed at the requested epoch
        graft.operators.VersionedTable.readAtAuto(spark, path, version)
          .queryExecution.analyzed
      }))
    // graft_history('<path>') — DESCRIBE HISTORY as a TVF: the commit
    // log (kind / entry deltas / txn) queryable from SQL text,
    // manifest-metadata only.
    e.injectTableFunction((
      new FunctionIdentifier("graft_history"),
      new ExpressionInfo("graft.operators.VersionedTable", "graft_history"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.types.StringType
        require(exprs.size == 1, "graft_history takes (path)")
        val path = exprs.head match {
          case Literal(s, StringType) if s != null =>
            graft.catalog.GraftCatalogs.tvfPath(s.toString)
          case _ => throw new IllegalArgumentException(
            "graft_history expects a literal string path or catalog " +
              "identifier")
        }
        graft.operators.VersionedTable
          .history(org.apache.spark.sql.SparkSession.active, path)
          .queryExecution.analyzed
      }))
    // graft_changes('<path>', from, to) — the change data feed as a
    // TVF: every insert/delete between two versions, `_change_type`
    // tagged, straight from SQL text (the Delta `table_changes`
    // shape).
    e.injectTableFunction((
      new FunctionIdentifier("graft_changes"),
      new ExpressionInfo("graft.operators.VersionedTable", "graft_changes"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        require(exprs.size == 3, "graft_changes takes (path, from, to)")
        val path = exprs.head match {
          case Literal(s, StringType) if s != null =>
            graft.catalog.GraftCatalogs.tvfPath(s.toString)
          case _ => throw new IllegalArgumentException(
            "graft_changes expects a literal string path or catalog " +
              "identifier")
        }
        def ver(x: Expression, what: String): Long = x match {
          case Literal(v: Int, IntegerType) => v.toLong
          case Literal(v: Long, LongType) => v
          case other => throw new IllegalArgumentException(
            s"graft_changes expects a literal integer $what, got $other")
        }
        graft.catalog.GraftCatalogs.logicalView(
          graft.operators.VersionedTable.readChangeFeed(
            org.apache.spark.sql.SparkSession.active, path,
            ver(exprs(1), "fromVersion"), ver(exprs(2), "toVersion")),
          path).queryExecution.analyzed
      }))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("hilbert_2d"),
      new ExpressionInfo(classOf[HilbertIndex2D].getName, "hilbert_2d"),
      (exprs: Seq[Expression]) => HilbertIndex2D(exprs.head, exprs(1),
        literalInt(exprs(2), "hilbert_2d bits"))))
    e.injectFunction((
      new FunctionIdentifier("md5_int_array"),
      new ExpressionInfo(classOf[Md5IntArray].getName, "md5_int_array"),
      (exprs: Seq[Expression]) => Md5IntArray(exprs.head,
        literalInt(exprs(1), "md5_int_array bits"))))
  }
}
