package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: ordered funnels and
  * cohort retention — the queries a product pipeline runs daily over
  * the same event tables the ingest side lands.
  *
  * Scale shape: funnels are one user-keyed aggregation per stage
  * chained by strictly-after semi-joins on user_id (all stages
  * co-partition on the same key, so AQE plans one exchange layout);
  * retention is two user-day aggregations. Nothing is per-event
  * stateful and nothing collects.
  */
object Funnel {

  /** Ordered-funnel user counts: for stages (e.g. signup -> view ->
    * click -> purchase), a user converts to stage k when an event of
    * that type occurs STRICTLY AFTER their earliest stage-(k-1)
    * conversion time. Output: (stage_idx, stage, n_users) — stage_idx
    * keeps funnel order under the driver's by-name column sort.
    */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: Column, stages: Seq[String]): DataFrame = {
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      tsCol.as("ts"))
    var reached = ev.filter(col("t") === stages.head)
      .groupBy(col("u")).agg(min(col("ts")).as("conv_ts"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(0).as("stage_idx"), lit(stages.head).as("stage"),
        col("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = ev.filter(col("t") === stage)
        .join(reached.select(col("u"), col("conv_ts").as("prev_ts")), Seq("u"))
        .filter(col("ts") > col("prev_ts"))
        .groupBy(col("u")).agg(min(col("ts")).as("conv_ts"))
      out = out.unionByName(
        reached.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("stage_idx"), lit(stage).as("stage"),
            col("n_users")))
    }
    out
  }

  /** Cohort retention: day 0 is each user's earliest active day;
    * output (day_offset, n_users) counts users active again exactly
    * `day_offset` days after their day 0 (offset 0 = cohort size).
    */
  def retentionCounts(events: DataFrame, userCol: String,
      dayCol: Column): DataFrame = {
    val userDays = events
      .select(col(userCol).as("u"), dayCol.as("day")).distinct()
    val day0 = userDays.groupBy(col("u")).agg(min(col("day")).as("day0"))
    userDays.join(day0, Seq("u"))
      .groupBy((col("day") - col("day0")).as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
