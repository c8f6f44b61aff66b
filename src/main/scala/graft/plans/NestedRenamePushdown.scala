package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
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
  * The rewrite runs in EVERY expression position — Filter conditions,
  * Project/Aggregate lists (under their analyzer-provided aliases),
  * join conditions, sort orders, window specs — so
  * `SELECT meta.bytes FROM t WHERE meta.bytes > x ORDER BY meta.bytes`
  * both prunes the scan to the one inner column (SchemaPruning sees a
  * bare GetStructField) and pushes the predicate, and a join keyed on
  * a renamed inner field prunes both sides. Strictly
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

  /** The rewrite runs in EVERY expression position of EVERY node
    * (round 18 — previously Filter/Project/Aggregate only): join
    * conditions, sort orders, and window specs carry the same
    * extractions, and each blocked SchemaPruning the same way. Safe
    * everywhere because the rewrite is type-preserving and an
    * extraction is never itself a top-level NamedExpression in an
    * analyzed plan (Alias wrappers survive `transformExpressionsUp`
    * with exprId and name intact — `withNewChildInternal` carries the
    * curried constructor args).
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(upper, Project(lower, grand))
        if collapsibleRenameCasts(upper, lower) =>
      // TARGETED COLLAPSE (round 18): `NestedColumnAliasing` pulls
      // extractions up to `Project [s#L.f AS _extract_f]` but stops
      // at the rename-cast Project below, and `CollapseProject`
      // declines to inline a struct cast referenced more than once
      // (it cannot know the cast is rename-only). When EVERY use of a
      // cast alias in the upper list is an extraction, substituting
      // is strictly shrinking — the expression rewrite then strips
      // each inlined cast on the next fixed-point pass and the scan
      // prunes to the consumed inner columns. ORDER BY / window specs
      // over renamed inner fields hit exactly this shape.
      val byId = lower.collect {
        case a: Alias => a.exprId -> a.child
      }.toMap
      def subst(e: Expression): Expression = e.transformUp {
        case ar: AttributeReference if byId.contains(ar.exprId) =>
          byId(ar.exprId)
      }
      val newUpper = upper.map {
        case ar: AttributeReference if byId.contains(ar.exprId) =>
          Alias(byId(ar.exprId), ar.name)(exprId = ar.exprId,
            qualifier = ar.qualifier,
            explicitMetadata = Some(ar.metadata))
        case a: Alias =>
          val nc = subst(a.child)
          if (nc fastEquals a.child) a
          else a.copy(child = nc)(exprId = a.exprId,
            qualifier = a.qualifier, explicitMetadata = a.explicitMetadata,
            nonInheritableMetadataKeys = a.nonInheritableMetadataKeys)
        case other => other
      }
      Project(newUpper, grand)
    case node =>
      node.transformExpressionsUp {
        case g @ GetStructField(Cast(child, to: StructType, _, _), ordinal, _)
            if child.dataType.isInstanceOf[StructType] &&
              renameOnly(child.dataType, to) =>
          val childSt = child.dataType.asInstanceOf[StructType]
          val physField = childSt.fields(ordinal)
          val bare = GetStructField(child, ordinal, Some(physField.name))
          if (physField.dataType == g.dataType) bare
          else Cast(bare, g.dataType)
      }
  }

  /** Whether the lower Project is passthrough-plus-rename-casts and
    * every upper use of a cast alias is an extraction (so inlining
    * never duplicates per-row cast work — the casts all strip).
    */
  private def collapsibleRenameCasts(upper: Seq[NamedExpression],
      lower: Seq[NamedExpression]): Boolean = {
    val castIds = lower.collect {
      case a: Alias if isRenameCast(a.child) => a.exprId
    }.toSet
    if (castIds.isEmpty) return false
    val lowerOk = lower.forall {
      case _: AttributeReference => true
      case a: Alias => a.child.isInstanceOf[AttributeReference] ||
        isRenameCast(a.child)
      case _ => false
    }
    if (!lowerOk) return false
    // count every reference vs references sitting directly under a
    // GetStructField — equal means no bare (whole-struct) use
    val uses = upper.map(e => e.collect {
      case ar: AttributeReference if castIds(ar.exprId) => 1
    }.sum).sum
    val extractUses = upper.map(e => e.collect {
      case GetStructField(ar: AttributeReference, _, _)
          if castIds(ar.exprId) => 1
    }.sum).sum
    uses == extractUses
  }

  private def isRenameCast(e: Expression): Boolean = e match {
    case Cast(ar: AttributeReference, to: StructType, _, _) =>
      ar.dataType.isInstanceOf[StructType] && renameOnly(ar.dataType, to)
    case _ => false
  }
}
