package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket gap filling: a rollup over raw events has no row for
  * empty buckets, but downstream consumers (charts, anomaly
  * detection, training windows) need a dense grid. The grid is
  * generated with sequence()+explode from the observed bucket span —
  * one tiny aggregate plus a generator, no driver-side collect — and
  * the dimension values are cross-joined (broadcast: dimensions are
  * small by definition) before a left join fills the measures.
  */
object Resample {

  /** Dense (bucket x dimension) count grid with zero fill.
    * `bucket` must be an integral bucket expression (e.g. epoch-hour);
    * missing (bucket, dim) combinations get n = 0.
    */
  def zeroFilledCounts(df: DataFrame, bucket: Column, dimCol: String): DataFrame = {
    val b = df.select(bucket.as("bucket"), col(dimCol))
    val grid = b.agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(explode(sequence(col("b0"), col("b1"))).as("bucket"))
      .crossJoin(broadcast(b.select(col(dimCol)).distinct()))
    val counts = b.groupBy(col("bucket"), col(dimCol))
      .agg(count(lit(1)).as("n"))
    grid.join(counts, Seq("bucket", dimCol), "left")
      .select(col("bucket"), col(dimCol), coalesce(col("n"), lit(0L)).as("n"))
  }
}
