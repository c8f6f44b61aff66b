package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches (SURVEY §7.4): the bounded-memory
  * summaries a 100 TB profile pass runs instead of exact
  * distinct/quantile scans. All built-in (HLL++, GK quantiles,
  * count-min-style frequent items) — mergeable partial sketches, one
  * shuffle of sketch state per group.
  */
object Sketches {

  /** Per-group cardinality profile: exact count, approximate distinct
    * (HLL++, default 5% rsd), and approximate distinct at a tighter
    * precision, for cheap cardinality screening of huge tables.
    */
  def cardinalityProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(col(valueCol)).as("approx_distinct"),
        approx_count_distinct(col(valueCol), 0.01).as("approx_distinct_1pct"))

  /** Approximate quantiles of a numeric column (Greenwald-Khanna via
    * approx_percentile) per group.
    */
  def quantileProfile(df: DataFrame, groupCol: String, valueCol: String,
      probabilities: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        array(probabilities.map(lit): _*), lit(10000)).as("quantiles"))

  /** Heavy hitters: values covering at least `support` fraction of
    * rows (DataFrameStatFunctions.freqItems).
    */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double): DataFrame =
    df.stat.freqItems(cols.toArray, support)

  /** The MERGEABLE-sketch rollup — the reason sketches beat exact
    * distinct at 100 TB: build one DataSketches HLL sketch per
    * (group, bucket) — e.g. per day, at ingest time, over that day's
    * partition only — then answer any coarser rollup by UNIONING the
    * stored sketch bytes, never re-scanning raw data. Both levels are
    * one hash aggregate whose state is a fixed-size sketch (lgK=12 →
    * ~2.5 KB), map-side combinable; the union aggregate's input is
    * |groups x buckets| sketch rows, not the corpus.
    *
    * Output per group: bucket count, the union-of-bucket-sketches
    * estimate, and a direct whole-group sketch estimate (the
    * one-pass cross-check).
    */
  def mergeableDistinctRollup(df: DataFrame, groupCol: String,
      bucketExpr: Column, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol), bucketExpr.as("bucket"))
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))
    val unioned = daily.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_buckets"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("union_distinct"))
    val direct = df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol)))
        .as("direct_distinct"))
    unioned.join(direct, Seq(groupCol))
  }
}
