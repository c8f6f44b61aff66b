package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Analytics-shape completions: dense time grids, pivot, and
  * grouping-sets rollups — the OLAP surface a reference user expects
  * beyond plain GROUP BY.
  */
object AnalyticsQueries extends QueryRegistry {

  /** Hourly event counts on a dense (hour x event_type) grid with
    * zero-filled gaps (Resample.zeroFilledCounts) — no driver-side
    * collect: the grid is sequence()+explode over the observed span.
    */
  val q51 = GraftQuery(
    "q51_resample_zero_fill",
    (s, d) => graft.operators.Resample.zeroFilledCounts(
      Tables.events(s, d), expr("ts div 3600000000000"), "event_type")
      .withColumnRenamed("bucket", "hour")
      .withColumnRenamed("n", "n_events"),
    Some("""
      WITH b AS (SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type FROM events),
      span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM b),
      grid AS (SELECT unnest(range(h0, h1 + 1)) AS hour FROM span),
      types AS (SELECT DISTINCT event_type FROM b),
      c AS (SELECT hour, event_type, count(*) AS n FROM b GROUP BY 1, 2)
      SELECT g.hour, t.event_type, coalesce(c.n, 0) AS n_events
      FROM grid g CROSS JOIN types t
      LEFT JOIN c ON c.hour = g.hour AND c.event_type = t.event_type
    """.trim))

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: hour-of-day rows x event-type columns. Explicit pivot
    * values keep the plan a single two-phase aggregate (no extra
    * distinct-values job) and make the output schema static; missing
    * cells are coalesced to 0 to match SQL FILTER counts.
    */
  val q52 = GraftQuery(
    "q52_pivot_hourly_mix",
    (s, d) => {
      val piv = Tables.events(s, d)
        .withColumn("hour_of_day", expr("(ts div 3600000000000) % 24"))
        .groupBy(col("hour_of_day"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
      piv.select(col("hour_of_day") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    },
    Some {
      val cols = EventTypes.map(t =>
        s"count(*) FILTER (event_type = '$t') AS $t").mkString(",\n             ")
      s"""
      SELECT (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day,
             $cols
      FROM events
      GROUP BY 1
      """.trim
    })

  /** Grouping sets: ROLLUP over (returnflag, linestatus) with
    * per-level grouping flags — subtotals and the grand total in one
    * two-phase aggregate pass.
    */
  val q53 = GraftQuery(
    "q53_rollup_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS INT) AS g_status,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.trim))

  def all: Seq[GraftQuery] = Seq(q51, q52, q53)
}
