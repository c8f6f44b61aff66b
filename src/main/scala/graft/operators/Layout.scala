package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
