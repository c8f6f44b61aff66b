package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join split
  * (on by default in GraftSession) handles most runtime skew; salting
  * is the static fallback for pathological keys — e.g. a single
  * instrument producing 90% of file_inventory rows, or a stop-shingle
  * shared by every document.
  *
  * Deterministic salting: the salt is derived from a hash of the
  * large side's whole row, not rand(), so retries and replays
  * partition identically (Spark task retries would otherwise see
  * different salt assignments mid-shuffle).
  */
object Skew {

  /** Equi-join `large` with `small` on `key`, spreading each key of
    * the large side over `saltFactor` sub-keys and replicating the
    * small side once per sub-key. Semantically identical to
    * large.join(small, key) for inner joins.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(struct(large.columns.map(col): _*)), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for heavily skewed group keys: partial
    * count per (key, salt), then final combine per key. Spark's
    * map-side partial aggregation already does this for algebraic
    * aggregates; this form exists for aggregations where the
    * per-key state is large (e.g. collect_set) and one reducer would
    * otherwise hold a hot key's entire state.
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n_distinct"))
}
