package graft.operators

import scala.jdk.CollectionConverters._

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
    *
    * Single-partition global `ntile` window — the simple reference
    * form, kept for the distributed twin's equivalence spec. Use
    * [[equiDepthDistributed]] on anything large.
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

  /** Per-GROUP equi-depth tiles: the grouped form is scale-safe with
    * a plain window — partitionBy(group) spreads the sort across
    * groups, so no single partition ever holds more than one group's
    * rows (the global form needs [[equiDepthDistributed]] precisely
    * because it lacks this partitioning). Same tiebreak contract as
    * [[equiDepth]].
    */
  def equiDepthByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieBreakCols: Seq[String], ntiles: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy((col(valueCol) +: tieBreakCols.map(col)).map(_.asc): _*)
    df.withColumn("tile", ntile(ntiles).over(w).cast("long"))
      .groupBy(col(groupCol), col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col(valueCol)).cast("double"), 2).as("lo"),
        round(max(col(valueCol)).cast("double"), 2).as("hi"))
  }

  /** Distributed exact equi-depth: identical output to [[equiDepth]]
    * (asserted in PlanAssertionsSpec) with no single-partition global
    * sort. Two-phase prefix sum, the `Packing.packByBudgetDistributed`
    * pattern: range-partition by the total order, per-partition row
    * counts → broadcast prefix offsets (numPartitions longs — the only
    * driver traffic), then each row's global position is offset +
    * local index and its tile follows from SQL ntile arithmetic: with
    * N rows the first N % ntiles tiles take one extra row. Every
    * partition sorts only its own range slice — the plan that survives
    * a 100x scale-up.
    */
  def equiDepthDistributed(df: DataFrame, valueCol: String,
      tieBreakCols: Seq[String], ntiles: Int,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val keyed = df.select(
      col(valueCol).cast("double").as("v") +: tieBreakCols.map(col): _*)
    val ord = (col("v") +: tieBreakCols.map(col)).map(_.asc)
    val sorted = keyed
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .select(col("v")).as[Double]
    val rdd = sorted.rdd
    rdd.cache()
    val counts = rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    val bOff = spark.sparkContext.broadcast(offsets)
    val base = n / ntiles
    val rem = n % ntiles
    val cut = rem * (base + 1) // global position of the first base-size tile
    val tiles = rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = bOff.value(i)
      it.map { v =>
        // base == 0 (fewer rows than tiles) never reaches the division:
        // then rem == n and every pos < cut
        val tile =
          if (pos < cut) pos / (base + 1) + 1
          else rem + (pos - cut) / base + 1
        pos += 1
        (tile, v)
      }
    }.toDF("tile", "v")
    val out = tiles.groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("v")), 2).as("lo"),
        round(max(col("v")), 2).as("hi"))
    // the aggregate is ntiles rows — collect it locally so nothing
    // cached outlives the call (a per-invocation result.cache() would
    // pin a new relation every run until clearCache), then drop the
    // RDD pin and return a local relation
    val rows = out.collect().toSeq
    rdd.unpersist(false)
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), out.schema)
  }

  /** Percentile-rank normalization: each row's score replaced by its
    * corpus percentile in exact basis points — the calibration step
    * that makes heterogeneous quality scores comparable ("top 5% by
    * signal X" composes across signals; raw scores don't). rank via
    * the windowless global prefix-sum (`Layout.globalRank` — a
    * row_number window here would sort the corpus in one partition);
    * pct_bp = (rank · 10000) div (n - 1), all-integer. `tieBreak`
    * must complete a total order or ranks are layout-dependent.
    */
  def percentileRank(df: DataFrame, scoreCol: String, tieBreak: String,
      numPartitions: Int = 0): DataFrame = {
    val n = df.count() // one driver scalar
    val ranked = Layout.globalRank(df,
      Seq(col(scoreCol), col(tieBreak)), rankName = "__r",
      numPartitions = numPartitions)
    val denom = math.max(n - 1, 1L)
    ranked.withColumn("pct_bp", expr(s"(__r * 10000L) div $denom"))
      .drop("__r")
  }
}
