package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** PREDICATE PUSHDOWN through the nested-rename cast (round 17).
  *
  * A NESTED column mapping presents storage's physical inner names
  * under the epoch's logical ones with one positional
  * `CAST(s AS STRUCT<...logical names...>)` — metadata-only on disk,
  * but opaque to Catalyst: `SchemaPruning` and the parquet nested
  * predicate pushdown both stop at a struct cast, so
  * `WHERE meta.bytes > x` on a nested-renamed table would scan every
  * row group. A rename-only cast is POSITIONAL and type-preserving,
  * which makes the fix exact: inside Filter conditions,
  * `GetStructField(Cast(child), ordinal)` extracts the SAME value as
  * `GetStructField(child, ordinal)` (modulo the inner cast for
  * deeper renames, applied recursively) — so the predicate re-binds
  * to the uncast scan column and reaches PushedFilters like any flat
  * predicate.
  *
  * The rewrite runs in Filter conditions and under ALIASES in
  * Project/Aggregate lists. An un-aliased extraction cannot be
  * rewritten (its output NAME derives from the expression, and the
  * physical name must never surface to users), but by optimizer time
  * the analyzer has aliased every top-level extraction — so in
  * practice `SELECT meta.bytes FROM t WHERE meta.bytes > x` both
  * prunes the scan to the one inner column (SchemaPruning sees a
  * bare GetStructField) and pushes the predicate. Strictly
  * semantics-preserving: the rewrite fires only when the cast is
  * provably rename-only (equal field count and positionally
  * identical types, names ignored, recursively), and the rewritten
  * expression's dataType always equals the original's (deeper
  * renames re-wrap in a narrower cast), so plan schemas never shift.
  */
object NestedRenamePushdown extends Rule[LogicalPlan] {

  /** Positionally identical types, names ignored (nullability too —
    * the cast never changes it for rename-only shapes).
    */
  private def renameOnly(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a: StructType, b: StructType) =>
        a.length == b.length &&
          a.fields.zip(b.fields).forall { case (x, y) =>
            renameOnly(x.dataType, y.dataType) }
      case (a: ArrayType, b: ArrayType) =>
        renameOnly(a.elementType, b.elementType)
      case (a: MapType, b: MapType) =>
        renameOnly(a.keyType, b.keyType) && renameOnly(a.valueType, b.valueType)
      case (a, b) => a == b
    }

  private def rewrite(e: Expression): Expression = e.transformUp {
    case g @ GetStructField(c @ Cast(child, to: StructType, _, _), ordinal, _)
        if child.dataType.isInstanceOf[StructType] &&
          renameOnly(child.dataType, to) =>
      val childSt = child.dataType.asInstanceOf[StructType]
      val physField = childSt.fields(ordinal)
      val bare = GetStructField(child, ordinal, Some(physField.name))
      // a deeper rename re-wraps the extracted value so ANOTHER
      // GetStructField above this one sees a cast it can strip in
      // the same pass — the recursion bottoms out at leaf types,
      // where the cast is the identity and renameOnly made it a
      // no-op shape
      if (physField.dataType == g.dataType) bare
      else Cast(bare, g.dataType)
  }

  /** Rewrite inside a named expression, keeping the Alias (and with
    * it the user-visible output name and exprId) intact.
    */
  private def rewriteNamed(
      ne: org.apache.spark.sql.catalyst.expressions.NamedExpression): org.apache.spark.sql.catalyst.expressions.NamedExpression =
    ne match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        val nc = rewrite(a.child)
        if (nc fastEquals a.child) a
        else a.copy(child = nc)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = a.explicitMetadata,
          nonInheritableMetadataKeys = a.nonInheritableMetadataKeys)
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val cond = rewrite(f.condition)
      if (cond fastEquals f.condition) f else Filter(cond, f.child)
    case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
      val list = p.projectList.map(rewriteNamed)
      if (list.zip(p.projectList).forall { case (a, b) => a fastEquals b }) p
      else p.copy(projectList = list)
    case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
      val aggs = a.aggregateExpressions.map(rewriteNamed)
      val groups = a.groupingExpressions.map(rewrite)
      if (aggs.zip(a.aggregateExpressions).forall {
        case (x, y) => x fastEquals y } &&
        groups.zip(a.groupingExpressions).forall {
          case (x, y) => x fastEquals y }) a
      else a.copy(groupingExpressions = groups, aggregateExpressions = aggs)
  }
}
