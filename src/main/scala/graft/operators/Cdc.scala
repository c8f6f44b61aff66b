package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an (insert/update/delete)
  * changelog into the current snapshot — the table-maintenance
  * primitive behind every CDC-fed lakehouse table (Debezium feed ->
  * queryable state).
  *
  * Scale shape: ONE hash aggregate — per key, max(struct(version...,
  * op, payload...)) picks the latest change (struct comparison is
  * lexicographic, so version columns lead), map-side combinable: a
  * key updated a billion times reaches the reducer as one row per
  * map task. No window, no per-key sort, no join. Deletes survive
  * the aggregate and are dropped at the end, so a delete that is the
  * LATEST change erases the key even when older upserts exist in the
  * same batch.
  */
object Cdc {

  /** Latest surviving row per key. `versionCols` must totally order
    * each key's changes (e.g. ts + a unique change id); `opCol`
    * values: anything equal to `deleteOp` is a tombstone, everything
    * else upserts. Output: keyCols ++ versionCols ++ payloadCols of
    * the winning change, tombstoned keys omitted.
    */
  def latestState(cdc: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], opCol: String, payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val packed = struct(
      (versionCols.map(col) ++ Seq(col(opCol).as("__op")) ++
        payloadCols.map(col)): _*)
    cdc.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__last"))
      .filter(col("__last.__op") =!= deleteOp)
      .select((keyCols.map(col) ++
        versionCols.map(c => col(s"__last.$c").as(c)) ++
        payloadCols.map(c => col(s"__last.$c").as(c))): _*)
  }
}
