package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy matching: all pairs of values within a
  * Levenshtein edit distance, found without an all-pairs compare via
  * the symmetric-delete (SymSpell) neighborhood — EXACT blocking:
  * if dist(a, b) <= k there is an alignment of a and b; deleting from
  * each side the (at most k) positions the alignment edits leaves the
  * same string, so a and b share a member of their <=k-deletion
  * neighborhoods and the equi-join on variants finds every true pair.
  * Levenshtein on the candidates kills the false positives.
  *
  * Scale shape: per-value work is the O(L^2/2) deletion-variant
  * explode (bounded for entity-grade fields — names, titles; not for
  * documents), then ONE shuffle on variant strings and a verify over
  * candidate pairs only. The quadratic all-pairs compare never runs —
  * it survives only in oracles and tests.
  */
object FuzzyJoin {

  /** All <=2-deletion variants of `s` (including `s` itself), distinct. */
  private def deletionVariants(s: Column): Column = {
    val L = length(s)
    val d1 = transform(sequence(lit(1), L),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, lit(1000000))))
    val d2 = flatten(transform(sequence(lit(1), L - 1),
      i => transform(sequence(i + 1, L),
        j => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, j - i - 1),
          s.substr(j + 1, lit(1000000))))))
    array_distinct(concat(array(s), d1, when(L >= 2, d2)
      .otherwise(array().cast("array<string>"))))
  }

  /** All <=1-deletion variants of `s` (including `s` itself),
    * distinct — the SymSpell depth-1 neighborhood, enough to block
    * any pair at deletion distance <= 2 when generated on BOTH
    * sides. Empty strings return [s] (Spark's sequence(1, 0)
    * DESCENDS instead of returning empty).
    */
  def deletionVariants1(s: Column): Column = {
    val L = length(s)
    when(L === 0, array(s)).otherwise(
      array_distinct(concat(array(s), transform(sequence(lit(1), L),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, lit(1000000)))))))
  }

  /** Distinct unordered pairs (a < b) of `valueCol` values with
    * Levenshtein distance <= maxDist (must be <= 2 — the deletion
    * neighborhood is generated to depth 2). Output: (a, b, dist).
    */
  def fuzzyPairs(df: DataFrame, valueCol: String, maxDist: Int): DataFrame = {
    require(maxDist <= 2, "deletion neighborhood generated to depth 2")
    val vals = df.select(col(valueCol).as("v")).distinct().cache()
    val variants = vals.select(col("v"),
      explode(deletionVariants(col("v"))).as("variant"))
    val cand = variants.as("x").join(variants.as("y"),
        col("x.variant") === col("y.variant") && col("x.v") < col("y.v"))
      .select(col("x.v").as("a"), col("y.v").as("b"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
  }
}
