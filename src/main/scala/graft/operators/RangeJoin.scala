package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points joined to intervals that contain
  * them, with an equi-joinable bin key so Spark never falls into the
  * O(points x intervals) broadcast-nested-loop that a raw BETWEEN
  * predicate plans as. Both sides are bucketed into fixed-width time
  * bins; an interval explodes to every bin it covers, a point to one
  * — the join is then (key, bin) hash equi-join + exact BETWEEN
  * filter. Classic bin trick: shuffle volume grows only with
  * interval_width / bin_width.
  */
object RangeJoin {

  /** points: (keyCol, timeCol, ...), intervals: (keyCol, startCol,
    * endCol, ...). Inclusive bounds. binSize in the same time unit.
    * Output: all point columns + all interval columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, timeCol: String, startCol: String, endCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val p = points.withColumn("__bin", floor(col(timeCol) / binSize))
    val i = intervals
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binSize), floor(col(endCol) / binSize))))
    p.join(i, Seq(keyCol, "__bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bin")
  }
}
