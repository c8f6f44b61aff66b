package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history: turn a change stream of
  * (key, tracked attribute, event time) rows into validity intervals
  * — the versioned-dataset primitive a training pipeline uses to
  * answer "what did this record look like as of snapshot T?".
  *
  * Gaps-and-islands with windows, all within one hash partition per
  * key (the natural distribution: `partitionBy(key)` shuffles each
  * key's history to one task, histories are short relative to the
  * table). Consecutive rows with an unchanged attribute collapse into
  * one interval; `effective_to` is the next interval's start (null =
  * open/current).
  */
object Scd {

  /** Build SCD2 intervals.
    * @param df source change rows
    * @param keyCol entity key
    * @param attrCol tracked attribute (change triggers a new version)
    * @param tsCol event-time column (orders versions within a key;
    *              ties broken by `tieCol`)
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    // change flag: attribute differs from the previous row (null-safe)
    val flagged = df.withColumn("chg",
      when(lag(col(attrCol), 1).over(byTime) <=> col(attrCol), lit(0))
        .otherwise(lit(1)))
    // island id = running count of changes
    val versioned = flagged.withColumn("version",
      sum(col("chg")).over(byTime.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"))
    val runs = versioned.groupBy(col(keyCol), col("version"))
      .agg(min(col(tsCol)).as("effective_from"),
        min(col(attrCol)).as(attrCol),
        count(lit(1)).as("n_rows"))
    val byVersion = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVersion))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
