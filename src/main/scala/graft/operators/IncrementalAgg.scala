package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive aggregates: a stored
  * per-key state (count / sum / min / max) absorbs a delta batch
  * without touching historical rows — the merge is the partial-
  * aggregation algebra Spark itself uses map-side, applied across
  * batches. count and sum are fully additive; min/max are additive
  * under inserts only (deletes would need a full or windowed
  * recompute — documented, not hidden).
  *
  * Scale shape: state and delta both carry one row per key; the merge
  * is a union + one key aggregation. The raw corpus is read once ever
  * (at state build), then only deltas.
  */
object IncrementalAgg {

  /** Per-key additive state of `valueCol`: (key, n, sum_v, min_v,
    * max_v).
    */
  def state(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("double")).as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /** Merge two states: counts/sums add, extremes combine. Keys
    * present in either side survive.
    */
  def merge(stored: DataFrame, delta: DataFrame, keyCol: String): DataFrame =
    stored.unionByName(delta)
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Absorb a DELETE batch — the documented non-additive path, made
    * explicit and scoped: min/max cannot subtract, so every key
    * touched by a delete is recomputed from the surviving raw rows
    * (one scan restricted to affected keys via a semi-join on the
    * tiny delete-key set); untouched keys keep their stored state
    * byte-for-byte. A key whose rows are all deleted disappears.
    * At 100 TB the semi-join prunes the recompute scan to the deleted
    * keys' partitions — deletes are rare and keyed; a global rebuild
    * would re-read the corpus for every batch.
    */
  def applyDeletes(stored: DataFrame, surviving: DataFrame,
      deletes: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val touched = deletes.select(col(keyCol)).distinct()
    val recomputed = state(
      surviving.join(touched, Seq(keyCol), "left_semi"), keyCol, valueCol)
    stored.join(touched, Seq(keyCol), "left_anti")
      .unionByName(recomputed)
  }
}
