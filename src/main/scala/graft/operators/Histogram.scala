package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution profiling — the two histogram shapes an analytics
  * engine needs: fixed-width bins (range profile) and equi-depth
  * tiles (quantile profile).
  *
  * Scale shape: equi-width is a 1-row min/max broadcast plus one
  * (bin) aggregation with map-side combine — bins, not rows, cross
  * the wire. Equi-depth uses a single global-order window (ntile);
  * that global sort is the honest cost of exact quantile boundaries —
  * the approximate alternative is the GK sketch in `Sketches`.
  */
object Histogram {

  /** Fixed-width histogram: `bins` equal-width buckets over the
    * observed [min, max]; the max value folds into the last bin.
    * Output: (bin, n_rows, lo, hi) with lo/hi the observed per-bin
    * extremes rounded to 2dp. Degenerate min==max data lands in bin 0.
    */
  def equiWidth(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("mn"), max(v).as("mx"))
    df.select(v.as("v")).crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / bins)),
            lit(bins - 1L)).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("v")), 2).as("lo"),
        round(max(col("v")), 2).as("hi"))
  }

  /** Equi-depth histogram: `ntiles` tiles of (near-)equal row count
    * in value order. `tieBreakCols` MUST make the global order total —
    * ntile splits runs of equal values by position, so without a
    * deterministic tiebreak two engines can disagree on which side of
    * a tile boundary a tied row falls.
    */
  def equiDepth(df: DataFrame, valueCol: String, tieBreakCols: Seq[String],
      ntiles: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy((col(valueCol) +: tieBreakCols.map(col)).map(_.asc): _*)
    df.withColumn("tile", ntile(ntiles).over(w).cast("long"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col(valueCol)).cast("double"), 2).as("lo"),
        round(max(col(valueCol)).cast("double"), 2).as("hi"))
  }
}
