package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with the
  * same key and time <= the left time — the canonical operator Spark
  * lacks natively. Composed Spark-first (preference order (a) in the
  * design brief) as a union + one running-max window:
  *
  *   union(tagged left, tagged right) sorted by (time, tag) per key;
  *   the running max of right-times over the preceding frame IS the
  *   as-of match.
  *
  * One shuffle total (on the key), versus the naive inequality-join +
  * row_number which builds every (left, right-before) pair first. Tie
  * semantics: a right row at exactly the left time matches (>=); if
  * several right rows tie on the match time the time value itself is
  * returned, which is deterministic regardless of tie choice —
  * callers needing a payload column must disambiguate ties
  * themselves.
  */
object AsOfJoin {

  /** leftTime/rightTime are epoch-seconds long columns. Output: all
    * left columns + `asof_time` (nullable long: matched right time).
    */
  def asOfTime(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val l = left.withColumn("__t", col(leftTimeCol).cast("long"))
      .withColumn("__tag", lit(1))
    val leftCols = left.columns
    val r = right.select(col(keyCol), col(rightTimeCol).cast("long").as("__t"))
      .withColumn("__tag", lit(0))
    // right side carries nulls for the left payload columns
    val unioned = l.select((leftCols.map(col) :+ col("__t") :+ col("__tag")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_time",
        max(when(col("__tag") === 0, col("__t"))).over(w))
      .filter(col("__tag") === 1)
      .drop("__t", "__tag")
  }
}
