package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval merge (coalesce) per key — the explicit-interval general
  * case of gap sessionization: each row carries its OWN [start, end)
  * extent, so a long interval can swallow many later ones and
  * variable-length overlaps chain arbitrarily; session_window (q148)
  * and the q41 explicit form only express the point-plus-fixed-gap
  * special case.
  *
  * Semantics: half-open [start, end) intervals; touching intervals
  * (next.start == running max end) are contiguous coverage and MERGE.
  * The sweep is the textbook two-window pass — running max of end
  * over preceding rows marks chain starts, a running sum of the marks
  * numbers the chains — with both windows PARTITIONED BY the key:
  * per-key windows scale with the number of keys (each key's rows
  * sort locally within its hash partition), unlike the global-order
  * windows the repo bans. Skewed single keys are the caveat; the
  * per-key row bound is the caller's contract here, as with any
  * sessionization.
  */
object Intervals {

  /** Coalesce overlapping/touching [startCol, endCol) intervals per
    * key. Output: one row per merged interval — (key, m_start, m_end,
    * n_source) where n_source counts the source intervals absorbed.
    * Start/end must be integral (the repo's exact-units discipline —
    * nanos, cents, positions).
    */
  def mergePerKey(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMax = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val chain = sum(
      when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__chain", chain)
      .groupBy(col(keyCol), col("__chain"))
      .agg(min(col(startCol)).as("m_start"), max(col(endCol)).as("m_end"),
        count(lit(1)).as("n_source"))
      .drop("__chain")
  }

  /** Per-key coverage rollup over the merged intervals: how many
    * disjoint extents and how much total extent each key covers.
    * Exact long arithmetic — merged extents are disjoint by
    * construction, so the sum never double-counts.
    */
  def coveragePerKey(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame =
    mergePerKey(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("m_end") - col("m_start")).as("covered"),
        sum(col("n_source")).as("n_source"))
}
