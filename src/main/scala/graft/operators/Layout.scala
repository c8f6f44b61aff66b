package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-sorted data layout — the clustering pass that makes range
  * predicates cheap at 100 TB.
  *
  * `repartitionByRange` gives each output file a disjoint value range
  * of the sort column (range exchange samples the column to pick
  * balanced boundaries); `sortWithinPartitions` orders rows inside
  * each file. Parquet then stores tight per-row-group min/max stats,
  * so a pushed-down range predicate skips whole row groups — on a
  * randomly-laid-out table every row group spans the full value range
  * and nothing can be skipped (LayoutSpec measures the difference via
  * scan output rows). This composes with Hive partitioning: partition
  * dirs prune coarse (day), the range-sorted files prune fine
  * (minute) — the standard time-series layout for event tables.
  */
object Layout {

  /** Rewrite `df` as `nFiles` range-sorted parquet files at `path`. */
  def rangeSortedWrite(df: DataFrame, sortCol: String, nFiles: Int,
      path: String): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Windowless 0-based GLOBAL rank under a total order — the
    * distributed prefix-sum pattern (q90/q150 discipline) factored
    * out: range partition on the sort key, decompose
    * `monotonically_increasing_id` into (partition, local index), and
    * broadcast per-partition prefix offsets (numPartitions longs —
    * the ONLY driver traffic). A `row_number()` window over the same
    * order would sort the entire table in ONE partition; this keeps
    * the sort distributed.
    *
    * The returned frame is cached and MUST stay the single evaluation
    * point: rank is a pure function of the total order, but without
    * the cache boundary separate downstream branches could re-sample
    * range boundaries independently and disagree on (partition,
    * local-index) splits. `sortCols` must be a total order (add a
    * unique id as the last key) or ranks within ties are
    * layout-dependent.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankName: String = "r", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val local = df
      .repartitionByRange(parts, sortCols.map(_.asc): _*)
      .sortWithinPartitions(sortCols.map(_.asc): _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__li", col("__mid") bitwiseAND ((1L << 33) - 1))
      .drop("__mid")
      .cache()
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0L until parts.toLong).map { p =>
      (p, (0L until p).map(q => counts.getOrElse(q, 0L)).sum)
    }
    val offDf = spark.createDataFrame(offsets).toDF("__pid", "__off")
    local.join(broadcast(offDf), "__pid")
      .withColumn(rankName, col("__off") + col("__li"))
      .drop("__pid", "__li", "__off")
  }

  /** Windowless GLOBAL inclusive prefix sum of a LONG column under a
    * total order — [[globalRank]]'s pattern carrying a running value
    * instead of a row count: range partition + local sorted scan +
    * broadcast per-partition value offsets (numPartitions longs, the
    * only driver traffic). The row_number/sum window alternative
    * sorts the whole table in ONE partition; this stays distributed.
    * `sortCols` must be a total order or the per-row running value is
    * layout-dependent. Appends `cumName` to the input columns.
    */
  def globalPrefixSum(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      cumName: String = "cum", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val local = df
      .repartitionByRange(parts, sortCols.map(_.asc): _*)
      .sortWithinPartitions(sortCols.map(_.asc): _*)
      .cache()
    val vIdx = local.schema.fieldIndex(valueCol)
    require(local.schema(vIdx).dataType ==
      org.apache.spark.sql.types.LongType, s"$valueCol must be LONG")
    val rdd = local.rdd
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](totals.length + 1)
    totals.zipWithIndex.foreach { case ((_, s), k) =>
      offsets(k + 1) = offsets(k) + s
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    val withCum = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bOff.value(i)
      it.map { r =>
        acc += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(withCum, local.schema.add(cumName,
      org.apache.spark.sql.types.LongType, nullable = false))
  }
}
