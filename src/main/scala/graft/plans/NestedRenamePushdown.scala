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
  * Scoped to Filter conditions deliberately: a Project's output
  * NAMES derive from the extraction expression, so rewriting there
  * could surface physical names to users; a Filter's condition has
  * no user-visible names. Strictly semantics-preserving: the rewrite
  * fires only when the cast is provably rename-only (equal field
  * count and positionally identical types, names ignored,
  * recursively).
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val cond = rewrite(f.condition)
      if (cond fastEquals f.condition) f else Filter(cond, f.child)
  }
}
