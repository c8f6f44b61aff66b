package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.TopKFunctions

/** Top-k rows per group via the bounded-heap aggregate
  * (graft.expressions.TopKRows): each map task contributes at most k
  * rows per group to the shuffle. Use instead of
  * Window.partitionBy(...).row_number <= k when groups are large —
  * the window form sorts every group member.
  */
object TopK {

  /** Keep the k best rows per group, best = highest scoreCol, ties
    * by lowest idCol. Output columns: groupCols ++ (score, id) ++
    * payloadCols, one row per kept element, best first within each
    * group (rank available from the ordering).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, payloadCols: Seq[String], k: Int): DataFrame = {
    val packed = struct(
      (Seq(col(scoreCol).cast("double").as("score"),
        col(idCol).cast("long").as("id")) ++
        payloadCols.map(col)): _*)
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(TopKFunctions.top_k_rows(packed, k).as("__topk"))
    val exploded = agged.select(
      (groupCols.map(col) :+ explode(col("__topk")).as("__e")): _*)
    exploded.select(
      (groupCols.map(col) ++
        Seq(col("__e.score").as(scoreCol), col("__e.id").as(idCol)) ++
        payloadCols.map(c => col(s"__e.$c").as(c))): _*)
  }
}
