package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column statistics — the null/distinct/extent profile
  * a cost-based optimizer (or a data engineer) reads first.
  *
  * All requested columns are profiled in ONE aggregation over ONE
  * scan; the exact distinct counts make Spark plan an Expand (one
  * duplicated stream per distinct aggregate), which is the honest
  * price of exactness — at 100 TB use [[approxNumericStats]]
  * (declared q98_table_stats_approx, tolerance-verified) and the
  * Expand disappears.
  */
object TableStats {

  /** Stats per numeric column: (column, n_nulls, n_distinct, min_v,
    * max_v) with extents rounded to 2dp.
    */
  def numericStats(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn$i"),
        countDistinct(col(c)).as(s"nd$i"),
        round(min(col(c)).cast("double"), 2).as(s"mn$i"),
        round(max(col(c)).cast("double"), 2).as(s"mx$i"))
    }
    val stacked = columns.zipWithIndex.map { case (c, i) =>
      s"'$c', nn$i, nd$i, mn$i, mx$i"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${columns.size}, $stacked) as " +
        "(column, n_nulls, n_distinct, min_v, max_v)")
  }

  /** The 100 TB form of [[numericStats]] (declared as
    * q98_table_stats_approx): `approx_count_distinct` (HLL++, default
    * rsd 5%) replaces the exact distinct, so the plan is a plain
    * two-phase hash aggregate over one scan — no Expand, no duplicated
    * streams, driver traffic = one row. Null counts and extents stay
    * exact. Tolerance-verified against the exact counts per the q46
    * pattern.
    */
  def approxNumericStats(df: DataFrame, columns: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn$i"),
        approx_count_distinct(col(c), rsd).as(s"nd$i"),
        round(min(col(c)).cast("double"), 2).as(s"mn$i"),
        round(max(col(c)).cast("double"), 2).as(s"mx$i"))
    }
    val stacked = columns.zipWithIndex.map { case (c, i) =>
      s"'$c', nn$i, nd$i, mn$i, mx$i"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${columns.size}, $stacked) as " +
        "(column, n_nulls, approx_distinct, min_v, max_v)")
  }

  /** Pairwise sample correlations of all column pairs in ONE
    * aggregation over one scan (n*(n-1)/2 corr aggregates share the
    * pass); floor4-truncated for cross-engine float parity. Output:
    * (col_a, col_b, corr4) per unordered pair.
    */
  def correlationMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    val pairs = for {
      i <- columns.indices; j <- (i + 1) until columns.size
    } yield (columns(i), columns(j))
    val aggs = pairs.zipWithIndex.map { case ((a, b), k) =>
      (floor(corr(col(a), col(b)) * 10000) / 10000.0).as(s"c$k")
    }
    val stacked = pairs.zipWithIndex.map { case ((a, b), k) =>
      s"'$a', '$b', c$k"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${pairs.size}, $stacked) as (col_a, col_b, corr4)")
  }
}
