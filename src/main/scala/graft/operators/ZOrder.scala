package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout codes — multi-dimensional clustering for
  * data skipping: sorting/partitioning by the interleaved code keeps
  * BOTH dimensions locally bounded inside every file, so min/max file
  * stats prune range predicates on either column (single-column sort
  * prunes only its own).
  *
  * Pure bit arithmetic on codegen'd built-ins — no UDF, no shuffle;
  * the layout query's only wide stage is the per-bucket aggregation.
  */
object ZOrder {

  /** Morton code: bit b of `x` lands at position 2b, bit b of `y` at
    * 2b+1. Inputs must fit in `bits` bits (enforce with a filter or
    * cap upstream); terms occupy disjoint bit positions so summing
    * them is the same as OR-ing.
    */
  def mortonCode(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** N-dimensional Morton code — the 2-D interleave generalized: bit
    * b of dimension i lands at position `b*n + i` (round-robin), so
    * for n = 2 this is bit-identical to [[mortonCode]]. Terms occupy
    * disjoint positions; summing equals OR-ing. `bits * n` must fit a
    * long (enforced by callers; [[VersionedTable.compactByZOrderN]]
    * requires `bits * n <= 62`).
    */
  def mortonCodeN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "mortonCodeN needs at least one dimension")
    val n = cols.size
    cols.zipWithIndex.map { case (c, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** The DuckDB expression for the same code (oracle mirror). */
  def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** Locality profile of the z-ordered layout: bucket rows by the
    * top bits of their Morton code (one bucket ~ one file under a
    * z-sorted write) and report each bucket's per-dimension extent.
    * Bounded extents on BOTH dims are what make the layout skippable.
    */
  def zLocality(df: DataFrame, xCol: String, yCol: String, bits: Int,
      bucketShift: Int): DataFrame =
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("z", mortonCode(col("x"), col("y"), bits))
      .groupBy(shiftright(col("z"), bucketShift).as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  /** zLocality's Hilbert twin: bucket by the top bits of the Hilbert
    * index instead of the Morton code. Hilbert index ranges have no
    * diagonal seams (every unit step is a grid neighbor), so the
    * same bucket granularity yields tighter per-bucket extents —
    * compare the two locality profiles to pick a table's layout.
    */
  def hilbertLocality(df: DataFrame, xCol: String, yCol: String, bits: Int,
      bucketShift: Int): DataFrame =
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("h",
        graft.expressions.HilbertFunctions.hilbert2d(col("x"), col("y"), bits))
      .groupBy(shiftright(col("h"), bucketShift).as("hbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
}
