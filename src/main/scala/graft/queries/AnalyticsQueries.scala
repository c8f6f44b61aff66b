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

  /** Ranking-window suite over one partition pass: row_number, rank,
    * dense_rank, ntile, cume_dist share a single (partition, order)
    * spec, so Catalyst runs them in ONE Window operator — one shuffle
    * + one sort for five functions. Ordering is made total
    * (totalprice desc, orderkey) so every function is deterministic;
    * cume_dist is floor4-truncated for cross-engine float parity.
    */
  val q54 = GraftQuery(
    "q54_window_suite",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        graft.functions.QualityFunctions.floor4(cume_dist().over(w)).as("cume4"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(rank() OVER w AS INT) AS rnk,
             CAST(dense_rank() OVER w AS INT) AS drnk,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             floor(cume_dist() OVER w * 10000) / 10000 AS cume4
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """.trim))

  /** Set-operation completions: customers that have orders
    * (INTERSECT) but none above the high-value threshold (EXCEPT).
    * Spark's intersect/except are distinct set ops, exactly ANSI
    * INTERSECT/EXCEPT — and both plan as shuffles on the key only.
    */
  val q55 = GraftQuery(
    "q55_intersect_except",
    (s, d) => {
      val withOrders = Tables.orders(s, d).select(col("o_custkey"))
      val highValue = Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      Tables.customer(s, d).select(col("c_custkey").as("o_custkey"))
        .intersect(withOrders)
        .except(highValue)
    },
    Some("""
      SELECT c_custkey AS o_custkey FROM customer
      INTERSECT
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """.trim))

  /** Exact percentiles (not the GK sketch): Spark's percentile
    * aggregate and DuckDB's quantile_cont both linearly interpolate
    * over the sorted values, so on identical inputs the doubles agree
    * bit-for-bit before the floor4 guard.
    */
  val q57 = GraftQuery(
    "q57_exact_percentiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.QualityFunctions.floor4(
          expr("percentile(l_quantity, 0.5)")).as("p50_qty"),
        graft.functions.QualityFunctions.floor4(
          expr("percentile(l_quantity, 0.95)")).as("p95_qty"),
        graft.functions.QualityFunctions.floor4(
          expr("percentile(l_extendedprice, 0.5)")).as("p50_price")),
    Some("""
      SELECT l_returnflag,
             floor(quantile_cont(l_quantity, 0.5) * 10000) / 10000 AS p50_qty,
             floor(quantile_cont(l_quantity, 0.95) * 10000) / 10000 AS p95_qty,
             floor(quantile_cont(l_extendedprice, 0.5) * 10000) / 10000 AS p50_price
      FROM lineitem
      GROUP BY l_returnflag
    """.trim))

  /** Statistical moments per group: stddev / variance (sample) and
    * the quantity-price correlation. floor2/floor4 guards: the two
    * engines use different accumulation algorithms (Welford vs
    * textbook), so agreement is to ~1e-10 relative, not to the ulp.
    */
  val q58 = GraftQuery(
    "q58_stats_moments",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        (floor(stddev(col("l_quantity")) * 100) / 100.0).as("sd_qty"),
        (floor(var_samp(col("l_quantity")) * 100) / 100.0).as("var_qty"),
        graft.functions.QualityFunctions.floor4(
          corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp")),
    Some("""
      SELECT l_returnflag,
             floor(stddev_samp(l_quantity) * 100) / 100 AS sd_qty,
             floor(var_samp(l_quantity) * 100) / 100 AS var_qty,
             floor(corr(l_quantity, l_extendedprice) * 10000) / 10000 AS corr_qp
      FROM lineitem
      GROUP BY l_returnflag
    """.trim))

  /** Rate-anomaly detection: hourly event counts per type scored
    * against a trailing 24-hour window (avg + 3 sigma). The spike
    * flag is computed from the FLOORED trailing stats in both engines
    * — the floors are the cross-engine-stable values (q58's lesson:
    * Welford vs textbook stddev agree to ~1e-10, not the ulp), so the
    * comparison never sits on an unstable boundary. Frames with <2
    * points yield NULL stats -> spike=false on both sides.
    */
  val q69 = GraftQuery(
    "q69_rate_anomaly",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, d)
        .groupBy((expr("ts div 3600000000000") * 3600).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour_epoch"))
        .rowsBetween(-24, -1)
      hourly.select(col("hour_epoch"), col("event_type"), col("n_events"),
        graft.functions.QualityFunctions.floor4(
          avg(col("n_events")).over(w)).as("trailing_avg"),
        (floor(stddev(col("n_events")).over(w) * 100) / 100.0).as("trailing_sd"))
        .withColumn("spike", coalesce(
          col("n_events") > col("trailing_avg") + lit(3.0) * col("trailing_sd"),
          lit(false)))
    },
    Some("""
      WITH hourly AS (
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      tr AS (
        SELECT hour_epoch, event_type, n_events,
               floor(avg(n_events) OVER w * 10000) / 10000 AS trailing_avg,
               floor(stddev_samp(n_events) OVER w * 100) / 100 AS trailing_sd
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      SELECT hour_epoch, event_type, n_events, trailing_avg, trailing_sd,
             coalesce(n_events > trailing_avg + 3.0 * trailing_sd, false) AS spike
      FROM tr
    """.trim))

  /** Equi-width price histogram: 1-row min/max broadcast + one (bin)
    * aggregation — bins, not rows, cross the wire.
    */
  val q89 = GraftQuery(
    "q89_histogram_width",
    (s, d) => graft.operators.Histogram.equiWidth(
      Tables.lineitem(s, d), "l_extendedprice", bins = 20),
    Some("""
      WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
                  FROM lineitem)
      SELECT CASE WHEN mx = mn THEN 0
                  ELSE CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 20.0)),
                                  19) AS BIGINT) END AS bin,
             CAST(count(*) AS BIGINT) AS n_rows,
             round(min(l_extendedprice), 2) AS lo,
             round(max(l_extendedprice), 2) AS hi
      FROM lineitem CROSS JOIN mm
      GROUP BY bin
    """.trim))

  /** Equi-depth price histogram: exact decile tiles with ntile
    * semantics, computed distributed — range-partition on the total
    * order (value + key tiebreaks, so tile membership is
    * engine-independent) + per-partition prefix offsets; no
    * single-partition global sort anywhere in the plan. The
    * approximate one-pass alternative is the GK sketch (q73).
    */
  val q90 = GraftQuery(
    "q90_histogram_depth",
    (s, d) => graft.operators.Histogram.equiDepthDistributed(
      Tables.lineitem(s, d), "l_extendedprice",
      Seq("l_orderkey", "l_linenumber"), ntiles = 10),
    Some("""
      SELECT tile, CAST(count(*) AS BIGINT) AS n_rows,
             round(min(l_extendedprice), 2) AS lo,
             round(max(l_extendedprice), 2) AS hi
      FROM (SELECT l_extendedprice,
                   CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                                        l_linenumber) AS BIGINT) AS tile
            FROM lineitem)
      GROUP BY tile
    """.trim))

  /** Per-returnflag price quartiles: the grouped equi-depth form —
    * partitionBy(group) spreads the ntile sort across groups, so
    * unlike the global form (q90's distributed rewrite) the window
    * here is already the scale-safe plan.
    */
  val q110 = GraftQuery(
    "q110_histogram_depth_grouped",
    (s, d) => graft.operators.Histogram.equiDepthByGroup(
      Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
      Seq("l_orderkey", "l_linenumber"), ntiles = 4),
    Some("""
      SELECT l_returnflag, tile, CAST(count(*) AS BIGINT) AS n_rows,
             round(min(l_extendedprice), 2) AS lo,
             round(max(l_extendedprice), 2) AS hi
      FROM (SELECT l_returnflag, l_extendedprice,
                   CAST(ntile(4) OVER (PARTITION BY l_returnflag
                                       ORDER BY l_extendedprice, l_orderkey,
                                       l_linenumber) AS BIGINT) AS tile
            FROM lineitem)
      GROUP BY l_returnflag, tile
    """.trim))

  /** CUBE over (returnflag, linestatus): all four grouping sets with
    * flags in one two-phase pass (q53's ROLLUP completed to the full
    * lattice).
    */
  val q91 = GraftQuery(
    "q91_cube_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
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
      GROUP BY CUBE (l_returnflag, l_linestatus)
    """.trim))

  /** Ordered conversion funnel signup -> view -> click -> purchase
    * with strictly-after semantics; one user-keyed aggregation per
    * stage, chained on the same key.
    */
  val q92 = GraftQuery(
    "q92_funnel",
    (s, d) => graft.operators.Funnel.funnelCounts(
      Tables.events(s, d), "user_id", "event_type", col("ts"),
      Seq("signup", "view", "click", "purchase")),
    Some("""
      WITH s0 AS (SELECT user_id AS u, min(ts) AS conv_ts FROM events
                  WHERE event_type = 'signup' GROUP BY 1),
      s1 AS (SELECT e.user_id AS u, min(e.ts) AS conv_ts FROM events e
             JOIN s0 ON e.user_id = s0.u
             WHERE e.event_type = 'view' AND e.ts > s0.conv_ts GROUP BY 1),
      s2 AS (SELECT e.user_id AS u, min(e.ts) AS conv_ts FROM events e
             JOIN s1 ON e.user_id = s1.u
             WHERE e.event_type = 'click' AND e.ts > s1.conv_ts GROUP BY 1),
      s3 AS (SELECT e.user_id AS u, min(e.ts) AS conv_ts FROM events e
             JOIN s2 ON e.user_id = s2.u
             WHERE e.event_type = 'purchase' AND e.ts > s2.conv_ts GROUP BY 1)
      SELECT 0 AS stage_idx, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s0
      UNION ALL
      SELECT 1, 'view', CAST(count(*) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
    """.trim))

  /** Cohort retention: users active again exactly k days after their
    * first active day; two user-day aggregations, no per-event state.
    */
  val q93 = GraftQuery(
    "q93_retention",
    (s, d) => graft.operators.Funnel.retentionCounts(
      Tables.events(s, d), "user_id", expr("ts div 86400000000000")),
    Some("""
      WITH ud AS (SELECT DISTINCT user_id AS u,
                    CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS day
                  FROM events),
      d0 AS (SELECT u, min(day) AS day0 FROM ud GROUP BY u)
      SELECT ud.day - d0.day0 AS day_offset,
             CAST(count(DISTINCT ud.u) AS BIGINT) AS n_users
      FROM ud JOIN d0 ON ud.u = d0.u
      GROUP BY day_offset
    """.trim))

  /** Rolling 7-day event aggregates per user at every event (event-
    * time RANGE frame): one shuffle on user, one sort, both rolling
    * functions in a single Window operator. RANGE frames treat equal
    * timestamps as peers identically in both engines.
    */
  val q95 = GraftQuery(
    "q95_rolling_window",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sevenDaysNanos = 7L * 86400L * 1000000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-sevenDaysNanos, 0)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_7d"),
        round(sum(col("value")).over(w), 2).as("sum_7d"))
    },
    Some("""
      SELECT event_id, user_id,
             CAST(count(*) OVER w AS BIGINT) AS n_7d,
             round(sum(value) OVER w, 2) AS sum_7d
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """.trim))

  /** Unpivot/melt — q52's inverse reshape: four lineitem measures
    * stacked into (metric, value) rows, then profiled per metric.
    * Values in exact integer cents BEFORE the stack so the sums are
    * order-independent in both engines; the oracle is the canonical
    * UNION ALL expansion.
    */
  val q129 = GraftQuery(
    "q129_unpivot_measures",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        round(col("l_quantity") * 100).cast("long").as("quantity_c"),
        round(col("l_extendedprice") * 100).cast("long").as("extendedprice_c"),
        round(col("l_discount") * 100).cast("long").as("discount_c"),
        round(col("l_tax") * 100).cast("long").as("tax_c"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("quantity_c"), col("extendedprice_c"), col("discount_c"),
          col("tax_c")),
        "metric", "v_c")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v_c")).as("sum_c"),
        min(col("v_c")).as("min_c"), max(col("v_c")).as("max_c")),
    Some {
      Seq("quantity", "extendedprice", "discount", "tax").map { m =>
        s"""SELECT '${m}_c' AS metric, CAST(count(*) AS BIGINT) AS n_rows,
           |CAST(sum(CAST(round(l_$m * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           |CAST(min(CAST(round(l_$m * 100) AS BIGINT)) AS BIGINT) AS min_c,
           |CAST(max(CAST(round(l_$m * 100) AS BIGINT)) AS BIGINT) AS max_c
           |FROM lineitem""".stripMargin.replace("\n", " ")
      }.mkString("\nUNION ALL\n")
    })

  /** Grouped ordinary-least-squares trend fit: per event type,
    * regress value on hours-since-2024-01-01 via the closed form
    * slope = covar_samp/var_samp — one hash aggregate over
    * map-side-combinable moments, the way a trend fit survives 100 TB
    * (no per-group sort, no collected series). Both engines evaluate
    * the identical formula from their own moment sums; q58's lesson
    * (aggregation orders agree to ~1e-10, not the ulp) makes floor4
    * the stable cross-engine grid. x is rebased to small integers for
    * double conditioning (shift-invariant in exact arithmetic).
    */
  val q139 = GraftQuery(
    "q139_trend_fit",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"),
        (expr("ts div 3600000000000") - 473352L).as("x"),
        col("value").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.QualityFunctions.floor4(
          covar_samp(col("x"), col("y")) / var_samp(col("x"))).as("slope"),
        graft.functions.QualityFunctions.floor4(
          avg(col("y")) - covar_samp(col("x"), col("y")) / var_samp(col("x"))
            * avg(col("x"))).as("intercept"),
        graft.functions.QualityFunctions.floor4(
          corr(col("x"), col("y")) * corr(col("x"), col("y"))).as("r2")),
    Some("""
      WITH t AS (
        SELECT event_type,
               epoch_ns(ts) // 3600000000000 - 473352 AS x,
               value AS y
        FROM events)
      SELECT event_type, count(*) AS n_rows,
             floor(covar_samp(x, y) / var_samp(x) * 10000) / 10000 AS slope,
             floor((avg(y) - covar_samp(x, y) / var_samp(x) * avg(x)) * 10000) / 10000 AS intercept,
             floor(corr(x, y) * corr(x, y) * 10000) / 10000 AS r2
      FROM t
      GROUP BY event_type
    """.trim))

  /** Time-decayed engagement score (the trending-items counter): a
    * trailing 7-day window with a one-day half-life, per event type.
    * Exactness trick: with integer day ages k in [0, 6], the decayed
    * term value_c * 2^-k is computed as value_c << (6 - k) — pure
    * long arithmetic on a common 1/64-cent grid, so the sum is
    * order-independent and engine-exact (a double formulation with
    * pow/exp would be neither). Reference instant fixed at
    * 2024-01-31T00Z (just past the data's end).
    */
  val q147 = GraftQuery(
    "q147_decayed_engagement",
    (s, d) => {
      val refNs = 1706659200000000000L // 2024-01-31T00:00:00Z
      val weekNs = 7L * 86400000000000L
      Tables.events(s, d)
        .filter(col("ts") >= lit(refNs - weekNs))
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("vc"),
          expr(s"cast(($refNs - ts) div 86400000000000 as int)").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events_7d"),
          sum(col("vc")).as("sum_vc"),
          sum(expr("vc * shiftleft(cast(1 as bigint), 6 - k)"))
            .as("decayed_score_u"))
    },
    Some("""
      WITH t AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS vc,
               CAST((1706659200000000000 - epoch_ns(ts)) // 86400000000000 AS INT) AS k
        FROM events
        WHERE epoch_ns(ts) >= 1706659200000000000 - 7 * 86400000000000)
      SELECT event_type, count(*) AS n_events_7d,
             CAST(sum(vc) AS BIGINT) AS sum_vc,
             CAST(sum(vc * (CAST(1 AS BIGINT) << (6 - k))) AS BIGINT) AS decayed_score_u
      FROM t
      GROUP BY event_type
    """.trim))

  /** Winsorized statistics — the outlier-clipping curation pass: per
    * event type, clip values at the floored p05/p95 interpolated
    * percentiles and report the clipped mean plus how many rows each
    * clamp touched. Thresholds are FLOORED to the 4dp grid before
    * clipping so both engines clamp at the identical boundary (the
    * q57 percentile-parity + q58 floor4 disciplines composed); counts
    * are exact integers.
    */
  val q149 = GraftQuery(
    "q149_winsorized_stats",
    (s, d) => {
      val vc = round(col("value") * 100).cast("long")
      val e = Tables.events(s, d).select(col("event_type"), vc.as("vc"))
      val bounds = e.groupBy(col("event_type")).agg(
        graft.functions.QualityFunctions.floor4(
          expr("percentile(vc, 0.05)")).as("lo"),
        graft.functions.QualityFunctions.floor4(
          expr("percentile(vc, 0.95)")).as("hi"))
      e.join(broadcast(bounds), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("lo")).as("lo"), min(col("hi")).as("hi"),
          sum(when(col("vc") < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
          sum(when(col("vc") > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
          graft.functions.QualityFunctions.floor4(
            avg(least(greatest(col("vc").cast("double"), col("lo")), col("hi"))))
            .as("wins_mean"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(round(value * 100) AS BIGINT) AS vc
                 FROM events),
      b AS (SELECT event_type,
                   floor(quantile_cont(vc, 0.05) * 10000) / 10000 AS lo,
                   floor(quantile_cont(vc, 0.95) * 10000) / 10000 AS hi
            FROM e GROUP BY event_type)
      SELECT e.event_type, count(*) AS n_rows,
             min(lo) AS lo, min(hi) AS hi,
             CAST(sum(CASE WHEN vc < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
             CAST(sum(CASE WHEN vc > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
             floor(avg(least(greatest(CAST(vc AS DOUBLE), lo), hi)) * 10000) / 10000 AS wins_mean
      FROM e JOIN b ON b.event_type = e.event_type
      GROUP BY e.event_type
    """.trim))

  /** Skyline / Pareto front (Börzsönyi et al., ICDE 2001): the parts
    * no other part beats on BOTH price (minimize, exact cents) and
    * size (maximize) — the best-tradeoff query ORDER BY cannot ask.
    * The oracle runs the textbook quadratic NOT EXISTS; the Spark
    * plan is the banded form (prefix-max over $10 price bands prunes
    * to near-frontier rows, band-local equi-join resolves the rest —
    * no theta join against the table, no Window; SkylineSpec proves
    * parity with brute force on tie-heavy fixtures).
    */
  val q152 = GraftQuery(
    "q152_skyline_price_size",
    (s, d) => graft.operators.Skyline.skyline2D(
      Tables.part(s, d)
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("price_c"),
          col("p_size")),
      "p_partkey", "price_c", "p_size", bucketWidth = 1000L)
      .select(col("id").as("part_key"), col("cost").as("price_c"),
        col("gain").as("size")),
    Some("""
      WITH p AS (SELECT p_partkey,
                        CAST(round(p_retailprice * 100) AS BIGINT) AS cost,
                        CAST(p_size AS BIGINT) AS gain
                 FROM part)
      SELECT x.p_partkey AS part_key, x.cost AS price_c, x.gain AS size
      FROM p x
      WHERE NOT EXISTS (SELECT 1 FROM p y
                        WHERE y.cost <= x.cost AND y.gain >= x.gain
                          AND (y.cost < x.cost OR y.gain > x.gain))
    """.trim))

  /** Interval merge + coverage: each event projects a [ts, ts +
    * value_cents seconds) extent; overlapping/touching extents per
    * user coalesce and the per-user rollup reports disjoint-extent
    * count and exact covered nanos. The general-interval sibling of
    * q148's gap sessions — a long interval can swallow many later
    * ones, which no fixed gap expresses. All arithmetic is exact
    * longs — in MICROsecond units, because DuckDB TIMESTAMPs carry µs
    * while the parquet longs carry nanos (the q141 truncation
    * gotcha); the oracle replays the same two-window sweep.
    */
  val q156 = GraftQuery(
    "q156_interval_coverage",
    (s, d) => graft.operators.Intervals.coveragePerKey(
      Tables.events(s, d).select(col("user_id"), expr("ts div 1000").as("s"),
        (expr("ts div 1000") + round(col("value") * 100).cast("long") * 1000000L)
          .as("e")),
      "user_id", "s", "e")
      .select(col("user_id"), col("n_intervals"), col("covered").as("covered_us"),
        col("n_source")),
    Some("""
      WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                         epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 1000000 AS e
                  FROM events),
      m AS (SELECT user_id, s, e,
                   max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
            FROM iv),
      g AS (SELECT user_id, s, e,
                   sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
            FROM m),
      mg AS (SELECT user_id, chain, min(s) AS ms, max(e) AS me, count(*) AS nsrc
             FROM g GROUP BY user_id, chain)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(me - ms) AS BIGINT) AS covered_us,
             CAST(sum(nsrc) AS BIGINT) AS n_source
      FROM mg GROUP BY user_id
    """.trim))

  /** Chi-square independence test on the lang x source contingency
    * grid — "is document language independent of source?", the
    * categorical-association check a curation pipeline runs before
    * trusting per-source language mixes. All inputs are exact longs
    * (cell counts + margins from ONE hash aggregate, re-aggregated —
    * the corpus is scanned once); each cell term (o·n - rt·ct)² /
    * (rt·ct·n) is IEEE-division-deterministic on identical longs, so
    * flooring it to 1e4 units BEFORE the sum makes the statistic an
    * exact long total — order-independent across engines and
    * partitionings. Zero cells are materialized via the margin cross
    * join (bounded grid: |langs| x |sources|), because observed-zero
    * cells still carry expected mass.
    */
  val q157 = GraftQuery(
    "q157_chisq_independence",
    (s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
      val ct = cells.groupBy(col("source")).agg(sum(col("o")).as("ct"))
      val n = cells.agg(sum(col("o")).as("n"))
      val grid = rt.crossJoin(broadcast(ct))
        .join(cells, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(n))
      val dv = col("o") * col("n") - col("rt") * col("ct")
      val t4 = floor(dv * dv / (col("rt") * col("ct") * col("n")) * 10000)
        .cast("long")
      grid.agg(sum(t4).as("chi2_e4"), count(lit(1)).as("n_cells"),
        max(col("n")).as("n_docs"))
    },
    Some("""
      WITH c AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY 1),
      s AS (SELECT source, sum(o) AS ct FROM c GROUP BY 1),
      t AS (SELECT sum(o) AS n FROM c),
      grid AS (SELECT r.lang, s.source, rt, ct, coalesce(c.o, 0) AS o
               FROM r CROSS JOIN s
               LEFT JOIN c ON r.lang = c.lang AND s.source = c.source),
      terms AS (SELECT CAST(floor((o*n - rt*ct)*(o*n - rt*ct) * 1.0 / (rt*ct*n) * 10000) AS BIGINT) AS t4, n
                FROM grid CROSS JOIN t)
      SELECT CAST(sum(t4) AS BIGINT) AS chi2_e4,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(max(n) AS BIGINT) AS n_docs
      FROM terms
    """.trim))

  /** Benford first-digit audit of order totals — the numeric-column
    * distribution check auditors run against fabricated data. The
    * first digit comes from the exact-cents long via string head (no
    * runtime log10 — log is not IEEE-portable across engines; the
    * Benford expectations are literal basis points, floor(log10(1 +
    * 1/d)·1e4), hardcoded identically in both declarations). Shares
    * are exact integral division; one count aggregate + a 1-row
    * broadcast total (the q131 shape).
    */
  val q159 = GraftQuery(
    "q159_benford_audit",
    (s, d) => {
      val benford = Seq(1 -> 3010L, 2 -> 1760L, 3 -> 1249L, 4 -> 969L,
        5 -> 791L, 6 -> 669L, 7 -> 579L, 8 -> 511L, 9 -> 457L)
      val bexpr = benford.tail.foldLeft(
        when(col("digit") === 1, lit(3010L))) {
        case (acc, (dg, bp)) => acc.when(col("digit") === dg, lit(bp))
      }
      val counts = Tables.orders(s, d)
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("nt"))
      counts.crossJoin(broadcast(total))
        .withColumn("share_bp", expr("div(n * 10000, nt)"))
        .withColumn("benford_bp", bexpr)
        .withColumn("dev_bp", abs(col("share_bp") - col("benford_bp")))
        .select(col("digit"), col("n"), col("share_bp"), col("benford_bp"),
          col("dev_bp"))
    },
    Some("""
      WITH dg AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
                  FROM orders),
      c AS (SELECT digit, count(*) AS n FROM dg GROUP BY digit),
      t AS (SELECT sum(n) AS nt FROM c),
      b(digit, benford_bp) AS (VALUES (1, 3010), (2, 1760), (3, 1249), (4, 969),
                                      (5, 791), (6, 669), (7, 579), (8, 511), (9, 457))
      SELECT c.digit, CAST(c.n AS BIGINT) AS n,
             CAST(c.n * 10000 // nt AS BIGINT) AS share_bp,
             CAST(b.benford_bp AS BIGINT) AS benford_bp,
             CAST(abs(c.n * 10000 // nt - b.benford_bp) AS BIGINT) AS dev_bp
      FROM c JOIN b ON c.digit = b.digit CROSS JOIN t
    """.trim))

  /** Cramér's V effect size on the q157 grid — chi-square tells you
    * association EXISTS; V ∈ [0, 1] tells you whether it matters.
    * The statistic needs a square root, which IS portable (IEEE
    * requires sqrt correctly rounded — unlike log/pow, which q159 and
    * q147 route around): exact-long chi2 and margins in, identical
    * doubles out, floor4 guard on top.
    */
  val q161 = GraftQuery(
    "q161_cramers_v",
    (s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
      val ct = cells.groupBy(col("source")).agg(sum(col("o")).as("ct"))
      val n = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("lang")).as("r_levels"),
        countDistinct(col("source")).as("c_levels"))
      val grid = rt.crossJoin(broadcast(ct))
        .join(cells, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(n))
      val dv = col("o") * col("n") - col("rt") * col("ct")
      val t4 = floor(dv * dv / (col("rt") * col("ct") * col("n")) * 10000)
        .cast("long")
      grid.groupBy(col("n"), col("r_levels"), col("c_levels"))
        .agg(sum(t4).as("chi2_e4"))
        .withColumn("mindim",
          least(col("r_levels") - 1, col("c_levels") - 1))
        .select(col("chi2_e4"), col("r_levels"), col("c_levels"),
          col("n").as("n_docs"),
          (floor(sqrt((col("chi2_e4") / 10000.0) / (col("n") * col("mindim")))
            * 10000) / 10000.0).as("v4"))
    },
    Some("""
      WITH c AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY 1),
      s AS (SELECT source, sum(o) AS ct FROM c GROUP BY 1),
      t AS (SELECT sum(o) AS n FROM c),
      dims AS (SELECT (SELECT count(*) FROM r) AS rl, (SELECT count(*) FROM s) AS cl),
      grid AS (SELECT r.lang, s.source, rt, ct, coalesce(c.o, 0) AS o
               FROM r CROSS JOIN s
               LEFT JOIN c ON r.lang = c.lang AND s.source = c.source),
      terms AS (SELECT CAST(floor((o*n - rt*ct)*(o*n - rt*ct) * 1.0 / (rt*ct*n) * 10000) AS BIGINT) AS t4
                FROM grid CROSS JOIN t),
      chi AS (SELECT sum(t4) AS chi2_e4 FROM terms)
      SELECT CAST(chi2_e4 AS BIGINT) AS chi2_e4,
             CAST(rl AS BIGINT) AS r_levels, CAST(cl AS BIGINT) AS c_levels,
             CAST(n AS BIGINT) AS n_docs,
             floor(sqrt((chi2_e4 / 10000.0) / (n * least(rl - 1, cl - 1))) * 10000) / 10000 AS v4
      FROM chi CROSS JOIN t CROSS JOIN dims
    """.trim))

  /** First-touch attribution: per (user, 30-min session), which
    * entry event type "owns" the session, and how often sessions it
    * owns convert (contain a purchase). The session index is q41's
    * lag + cumulative-flag sweep; the session's first event rides a
    * min(struct(ts_us, event_id, type)) argmin (the PQ-update carry
    * pattern — no re-join of the corpus). All time arithmetic in µs
    * (the q156 lesson) with event_id tiebreak, so both engines pick
    * the same first event even for same-microsecond pairs.
    */
  val q162 = GraftQuery(
    "q162_first_touch_attribution",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(col("user_id"),
        expr("ts div 1000").as("tsu"), col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsu").asc, col("event_id").asc)
      val flagged = ev.withColumn("new_s",
        when(lag(col("tsu"), 1).over(w).isNull ||
          col("tsu") - lag(col("tsu"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      val sess = flagged.withColumn("sid",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val perSession = sess.groupBy(col("user_id"), col("sid"))
        .agg(min(struct(col("tsu"), col("event_id"), col("event_type")))
          .getField("event_type").as("first_touch"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
      perSession.groupBy(col("first_touch"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("converted")).as("n_converted"))
        .withColumn("conversion_bp",
          expr("div(n_converted * 10000, n_sessions)"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type FROM events),
      flagged AS (
        SELECT user_id, tsu, event_id, event_type,
               CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      sess AS (
        SELECT user_id, tsu, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      ft AS (SELECT user_id, sid, event_type AS first_touch
             FROM (SELECT user_id, sid, event_type,
                          row_number() OVER (PARTITION BY user_id, sid
                                             ORDER BY tsu, event_id) AS rn
                   FROM sess) WHERE rn = 1),
      conv AS (SELECT user_id, sid,
                      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
               FROM sess GROUP BY 1, 2)
      SELECT first_touch, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(converted) AS BIGINT) AS n_converted,
             CAST(sum(converted) * 10000 // count(*) AS BIGINT) AS conversion_bp
      FROM ft JOIN conv USING (user_id, sid)
      GROUP BY first_touch
    """.trim))

  /** Trailing 7-day distinct users per day — sliding-window DISTINCT,
    * the aggregation windows can't compose (distinct is not
    * mergeable across overlapping frames). Exact plan: each event
    * explodes into the <= 7 day-buckets whose trailing window it
    * falls in, then one countDistinct per bucket — shuffle volume is
    * window_days × events, the honest cost of exactness; for wide
    * windows the q141 mergeable-HLL rollup is the scale alternative
    * (per-day sketches, union 7 at read time). Buckets are clamped to
    * observed days so both engines emit the same grid.
    */
  val q163 = GraftQuery(
    "q163_sliding_distinct_users",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      val obs = ev.select(col("day")).distinct()
      ev.select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .join(obs, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("u7_distinct"),
          count(lit(1)).as("n7_events"))
    },
    Some("""
      WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events),
      ex AS (SELECT day + i AS day2, user_id FROM ev, unnest(range(0, 7)) AS t(i))
      SELECT day2 AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS u7_distinct,
             CAST(count(*) AS BIGINT) AS n7_events
      FROM ex
      WHERE day2 IN (SELECT day FROM ev)
      GROUP BY day2
    """.trim))

  /** Cohen's kappa between two heuristic quality raters (lexical-
    * diversity gate vs stopword gate) — the label-quality check run
    * before trusting any classifier-filtered corpus: agreement
    * CORRECTED for chance (raw agreement of imbalanced raters is
    * inflated). All four cells are exact longs from one scan; kappa =
    * (n·agree - pe_num) / (n² - pe_num) is a single IEEE division on
    * exact longs -> floor4. Gate thresholds compare floor4 values
    * (identical doubles cross-engine by the floor4 discipline).
    */
  val q170 = GraftQuery(
    "q170_rater_agreement_kappa",
    (s, d) => {
      import graft.functions.{QualityFunctions => Q, TextFunctions => T}
      val m = Tables.documents(s, d)
        .withColumn("ws", T.tokens(col("text")))
        .select((Q.uniqueRatio(col("ws")) >= 0.55).as("a"),
          (Q.stopwordRatio(col("ws")) <= 0.06).as("b"))
      m.agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("a"), 1L).otherwise(0L)).as("a_yes"),
          sum(when(col("b"), 1L).otherwise(0L)).as("b_yes"),
          sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
        .withColumn("kappa_e4", expr("""
          CAST(floor(
            CAST(n_docs*agree - (a_yes*b_yes + (n_docs-a_yes)*(n_docs-b_yes)) AS DOUBLE) /
            CAST(n_docs*n_docs - (a_yes*b_yes + (n_docs-a_yes)*(n_docs-b_yes)) AS DOUBLE)
            * 10000) AS BIGINT)"""))
    },
    Some("""
      WITH w AS (SELECT list_filter(string_split(text, ' '), t -> len(t) > 0) AS ws
                 FROM documents),
      m AS (SELECT
              floor(len(list_distinct(ws)) * 1.0 / len(ws) * 10000) / 10000 >= 0.55 AS a,
              floor(len(list_filter(ws, t -> t IN ('the', 'a'))) * 1.0 / len(ws) * 10000) / 10000 <= 0.06 AS b
            FROM w),
      c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a_yes,
                   CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b_yes,
                   CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
            FROM m)
      SELECT n_docs, a_yes, b_yes, agree,
             CAST(floor((n_docs*agree - (a_yes*b_yes + (n_docs-a_yes)*(n_docs-b_yes))) * 1.0 /
                        (n_docs*n_docs - (a_yes*b_yes + (n_docs-a_yes)*(n_docs-b_yes))) * 10000)
               AS BIGINT) AS kappa_e4
      FROM c
    """.trim))

  /** Percentile-rank normalization of document length: raw n_chars
    * replaced by its corpus percentile in exact bp — heterogeneous
    * quality signals become composable once each is a percentile.
    * Windowless global rank (Layout.globalRank); all-integer bp.
    */
  val q174 = GraftQuery(
    "q174_percentile_normalize",
    (s, d) => graft.operators.Histogram.percentileRank(
      Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      "n_chars", "doc_id"),
    Some("""
      WITH r AS (SELECT doc_id, n_chars,
                        row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS r,
                        count(*) OVER () AS n
                 FROM documents)
      SELECT doc_id, n_chars,
             CAST((r * 10000) // greatest(n - 1, 1) AS BIGINT) AS pct_bp
      FROM r
    """.trim))

  /** Daily event-volume anomaly flags per event type WITHOUT a single
    * float: |z| > 2 is equivalent to (x·n - s)² > 4·(n·ss - s²) by
    * cross-multiplying the population z-score — every term an exact
    * long (bounded: daily counts x day counts stay far under 2^63 at
    * any SF here), so the flag can never flip on an ulp. Two hash
    * aggregates + a broadcast per-type stats join; the monitoring
    * primitive over ingest volumes.
    */
  val q178 = GraftQuery(
    "q178_volume_anomaly_days",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), expr("ts div 86400000000000").as("day_idx"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg(count(lit(1)).as("n_events"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("n_events")).as("sx"),
          sum(col("n_events") * col("n_events")).as("sxx"))
      daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("day_idx"), col("n_events"),
          ((col("n_events") * col("n") - col("sx")) *
            (col("n_events") * col("n") - col("sx")) >
            lit(4L) * (col("n") * col("sxx") - col("sx") * col("sx")))
            .as("is_anomaly"))
    },
    Some("""
      WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
                            CAST(count(*) AS BIGINT) AS n_events
                     FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(n_events) AS BIGINT) AS sx,
                    CAST(sum(n_events * n_events) AS BIGINT) AS sxx
             FROM daily GROUP BY 1)
      SELECT d.event_type, d.day_idx, d.n_events,
             (d.n_events * n - sx) * (d.n_events * n - sx) >
               4 * (n * sxx - sx * sx) AS is_anomaly
      FROM daily d JOIN st USING (event_type)
    """.trim))

  /** MAD-based robust outliers over order totals: median and the
    * median absolute deviation replace mean/stddev (one extreme order
    * cannot drag the fence). Exact cents in, floor4'd exact
    * percentiles (the q149 grid), and the fence comparison is
    * adev·10000 > mad·44478 (3·1.4826 in exact e4 units) — identical
    * doubles on both engines, no libm.
    */
  val q179 = GraftQuery(
    "q179_mad_outliers",
    (s, d) => {
      import graft.functions.QualityFunctions.floor4
      val o = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      val med = o.agg(floor4(expr("percentile(cents, 0.5)")).as("med"))
      val dev = o.crossJoin(broadcast(med))
        .select(col("cents"), col("med"),
          abs(col("cents").cast("double") - col("med")).as("adev"))
      val mad = dev.agg(floor4(expr("percentile(adev, 0.5)")).as("mad"))
      dev.crossJoin(broadcast(mad))
        .agg(count(lit(1)).as("n_orders"),
          min(col("med")).as("med"), min(col("mad")).as("mad"),
          sum(when(col("adev") * 10000 > col("mad") * 44478, 1L)
            .otherwise(0L)).as("n_outliers"))
    },
    Some("""
      WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      m AS (SELECT floor(quantile_cont(cents, 0.5) * 10000) / 10000 AS med FROM o),
      d AS (SELECT cents, med, abs(CAST(cents AS DOUBLE) - med) AS adev
            FROM o CROSS JOIN m),
      md AS (SELECT floor(quantile_cont(adev, 0.5) * 10000) / 10000 AS mad FROM d)
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             min(med) AS med, min(mad) AS mad,
             CAST(sum(CASE WHEN adev * 10000 > mad * 44478 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM d CROSS JOIN md
    """.trim))

  /** RFM segmentation: per-customer recency/frequency/monetary
    * quartile codes — the classic warehouse cohort labeling. Metrics
    * are exact longs; the nine quartile fences are floor4'd exact
    * percentiles broadcast once; code = r·100 + f·10 + m.
    */
  val q180 = GraftQuery(
    "q180_rfm_segmentation",
    (s, d) => {
      import graft.functions.QualityFunctions.floor4
      def quart(v: org.apache.spark.sql.Column, p25: String, p50: String,
          p75: String) =
        when(v <= col(p25), 1).when(v <= col(p50), 2)
          .when(v <= col(p75), 3).otherwise(4)
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("ep"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val rfm = o.groupBy(col("o_custkey")).agg(
        max(col("ep")).as("last_ep"), count(lit(1)).as("freq"),
        sum(col("cents")).as("mon"))
      val th = rfm.agg(
        floor4(expr("percentile(last_ep, 0.25)")).as("r25"),
        floor4(expr("percentile(last_ep, 0.5)")).as("r50"),
        floor4(expr("percentile(last_ep, 0.75)")).as("r75"),
        floor4(expr("percentile(freq, 0.25)")).as("f25"),
        floor4(expr("percentile(freq, 0.5)")).as("f50"),
        floor4(expr("percentile(freq, 0.75)")).as("f75"),
        floor4(expr("percentile(mon, 0.25)")).as("m25"),
        floor4(expr("percentile(mon, 0.5)")).as("m50"),
        floor4(expr("percentile(mon, 0.75)")).as("m75"))
      rfm.crossJoin(broadcast(th))
        .select(col("o_custkey"), col("last_ep"), col("freq"), col("mon"),
          quart(col("last_ep"), "r25", "r50", "r75").as("r_q"),
          quart(col("freq"), "f25", "f50", "f75").as("f_q"),
          quart(col("mon"), "m25", "m50", "m75").as("m_q"))
        .withColumn("rfm_code",
          (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).cast("int"))
    },
    Some("""
      WITH o AS (SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS ep,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
      rfm AS (SELECT o_custkey, max(ep) AS last_ep,
                     CAST(count(*) AS BIGINT) AS freq,
                     CAST(sum(cents) AS BIGINT) AS mon
              FROM o GROUP BY o_custkey),
      th AS (SELECT
               floor(quantile_cont(last_ep, 0.25) * 10000) / 10000 AS r25,
               floor(quantile_cont(last_ep, 0.5) * 10000) / 10000 AS r50,
               floor(quantile_cont(last_ep, 0.75) * 10000) / 10000 AS r75,
               floor(quantile_cont(freq, 0.25) * 10000) / 10000 AS f25,
               floor(quantile_cont(freq, 0.5) * 10000) / 10000 AS f50,
               floor(quantile_cont(freq, 0.75) * 10000) / 10000 AS f75,
               floor(quantile_cont(mon, 0.25) * 10000) / 10000 AS m25,
               floor(quantile_cont(mon, 0.5) * 10000) / 10000 AS m50,
               floor(quantile_cont(mon, 0.75) * 10000) / 10000 AS m75
             FROM rfm),
      coded AS (SELECT o_custkey, last_ep, freq, mon,
                       CASE WHEN last_ep <= r25 THEN 1 WHEN last_ep <= r50 THEN 2
                            WHEN last_ep <= r75 THEN 3 ELSE 4 END AS r_q,
                       CASE WHEN freq <= f25 THEN 1 WHEN freq <= f50 THEN 2
                            WHEN freq <= f75 THEN 3 ELSE 4 END AS f_q,
                       CASE WHEN mon <= m25 THEN 1 WHEN mon <= m50 THEN 2
                            WHEN mon <= m75 THEN 3 ELSE 4 END AS m_q
                FROM rfm CROSS JOIN th)
      SELECT o_custkey, last_ep, freq, mon,
             CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
             CAST(m_q AS INT) AS m_q,
             CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
      FROM coded
    """.trim))

  /** Exact two-sample KS drift between the click and purchase value
    * distributions — the pre-training audit "do these cohorts draw
    * from one distribution". All integer: |i·m − j·n| over exact
    * cents with the windowless prefix-sum (see [[graft.operators.Drift]]);
    * the only division is one integer div at the end.
    */
  val q184 = GraftQuery(
    "q184_ks_drift",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(round(col("value") * 100).cast("long").as("cents"),
          col("event_type"))
      graft.operators.Drift.ksStatistic(ev, "cents",
        col("event_type") === "click", col("event_type") === "purchase")
    },
    Some("""
      WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
                        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
                 FROM events WHERE event_type IN ('click', 'purchase')),
      pv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
             FROM e GROUP BY 1),
      c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS ca,
                   sum(cb) OVER (ORDER BY v) AS cb FROM pv),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS n, CAST(sum(cb) AS BIGINT) AS m
            FROM pv),
      dd AS (SELECT v, abs(ca * m - cb * n) AS dv FROM c CROSS JOIN t),
      mx AS (SELECT CAST(max(dv) AS BIGINT) AS dmax FROM dd)
      SELECT t.n AS n_a, t.m AS n_b, mx.dmax AS d_max,
             CAST(mx.dmax * 1000000 // (t.n * t.m) AS BIGINT) AS ks_e6,
             (SELECT min(v) FROM dd WHERE dv = mx.dmax) AS at_value
      FROM t CROSS JOIN mx
    """.trim))

  /** Gini coefficient + top-decile share of customer spend — the
    * data-balance audit (is the corpus dominated by a few heavy
    * sources). Ranks come from the windowless global rank
    * (Layout.globalRank — range partition + broadcast offsets, no
    * single-partition Window); Σ(i·x) accumulates in decimal(38,0)
    * exact integers, and the only floats are two deterministic
    * int→double conversions and one division, then floor.
    */
  val q185 = GraftQuery(
    "q185_gini_spend",
    (s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val ranked = graft.operators.Layout.globalRank(
        spend, Seq(col("cents"), col("o_custkey")), "r")
      val t = ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"),
        sum(((col("r") + 1).cast("decimal(38,0)") *
          col("cents").cast("decimal(38,0)"))).as("s1"))
      val s10 = ranked.crossJoin(broadcast(t))
        .filter(col("r") >= col("n") - expr("n div 10"))
        .agg(sum(col("cents")).as("s10"))
      s10.crossJoin(broadcast(t))
        .select(col("n").as("n_customers"), col("tot").as("total_cents"),
          floor(
            ((col("s1") * 2 - (col("n") + 1).cast("decimal(38,0)") *
              col("tot").cast("decimal(38,0)")).cast("double") /
              (col("n").cast("decimal(38,0)") *
                col("tot").cast("decimal(38,0)")).cast("double")) * 10000)
            .cast("long").as("gini_e4"),
          expr("s10 * 10000L div tot").as("top10_share_e4"))
    },
    Some("""
      WITH s AS (SELECT o_custkey,
                        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
      r AS (SELECT o_custkey, cents,
                   row_number() OVER (ORDER BY cents, o_custkey) AS i FROM s),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot,
                   CAST(sum(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS s1 FROM r),
      sten AS (SELECT CAST(sum(cents) AS BIGINT) AS s10
               FROM r CROSS JOIN t WHERE i > n - n // 10)
      SELECT n AS n_customers, tot AS total_cents,
             CAST(floor(CAST(2 * s1 - (n + 1) * CAST(tot AS HUGEINT) AS DOUBLE) /
                        CAST(CAST(n AS HUGEINT) * tot AS DOUBLE) * 10000) AS BIGINT) AS gini_e4,
             CAST(s10 * 10000 // tot AS BIGINT) AS top10_share_e4
      FROM t CROSS JOIN sten
    """.trim))

  /** k-anonymity audit (k=5) over customer quasi-identifiers
    * (nation, segment, balance-bucket): every released group must
    * hide each row among >= k peers. One hash aggregate to group
    * sizes, one to the summary. The balance bucket floors exact
    * cents through double division — NOT `div`, whose
    * truncate-toward-zero disagrees with DuckDB's floor-division
    * `//` on negative balances.
    */
  val q187 = GraftQuery(
    "q187_k_anonymity",
    (s, d) => {
      val g = Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(round(col("c_acctbal") * 100).cast("long")
            .cast("double") / 100000.0).cast("long").as("bal_bucket"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("cnt"))
      g.agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_groups"),
        min(col("cnt")).as("k_anonymity"),
        sum(when(col("cnt") < 5, 1L).otherwise(0L)).as("unsafe_groups"),
        sum(when(col("cnt") < 5, col("cnt")).otherwise(0L)).as("rows_at_risk"))
        .withColumn("suppression_bp",
          expr("rows_at_risk * 10000L div n_rows"))
    },
    Some("""
      WITH g AS (SELECT c_nationkey, c_mktsegment,
                        CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE) / 100000.0) AS BIGINT) AS bal_bucket,
                        CAST(count(*) AS BIGINT) AS cnt
                 FROM customer GROUP BY 1, 2, 3)
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(cnt) AS BIGINT) AS k_anonymity,
             CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS unsafe_groups,
             CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS rows_at_risk,
             CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) * 10000 // sum(cnt) AS BIGINT) AS suppression_bp
      FROM g
    """.trim))

  /** New-vs-returning daily actives + cumulative reach — the product
    * health panel. Per-user first day is one hash aggregate; daily
    * splits come from comparing each active (user, day) against it;
    * the cumulative is a running sum over DAY rows only — bounded by
    * the calendar, not the corpus, so the single-partition window is
    * a non-issue at any SF.
    */
  val q191 = GraftQuery(
    "q191_new_vs_returning",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("fday"))
      val daily = ud.join(first, "user_id")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("day") === col("fday"), 1L).otherwise(0L)).as("n_new"))
        .withColumn("n_returning", col("n_active") - col("n_new"))
      daily.withColumn("cum_users",
        sum(col("n_new")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("day")).rowsBetween(Long.MinValue, 0)))
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id,
                         epoch_ns(ts) // 86400000000000 AS day
                  FROM events),
      f AS (SELECT user_id, min(day) AS fday FROM ud GROUP BY 1),
      daily AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                       CAST(sum(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT) AS n_new
                FROM ud JOIN f USING (user_id) GROUP BY day)
      SELECT day, n_active, n_new, n_active - n_new AS n_returning,
             CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
      FROM daily
    """.trim))

  /** Seasonal-naive forecast backtest: predict each day's per-type
    * event count with the same weekday last week, score WAPE in exact
    * integer counts — the baseline every real forecaster must beat,
    * and the backtest is pure relational algebra (a self-join on
    * day-7; no window, no state).
    */
  val q193 = GraftQuery(
    "q193_seasonal_naive_backtest",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val scored = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day") === col("b.day") + 7)
        .select(col("a.event_type").as("event_type"),
          abs(col("a.cnt") - col("b.cnt")).as("ae"), col("a.cnt").as("actual"))
      scored.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("ae")).as("total_abs_err"),
          sum(col("actual")).as("total_actual"))
        .withColumn("wape_bp",
          expr("total_abs_err * 10000L div total_actual"))
    },
    Some("""
      WITH daily AS (SELECT event_type,
                            epoch_ns(ts) // 86400000000000 AS day,
                            CAST(count(*) AS BIGINT) AS cnt
                     FROM events GROUP BY 1, 2)
      SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(abs(a.cnt - b.cnt)) AS BIGINT) AS total_abs_err,
             CAST(sum(a.cnt) AS BIGINT) AS total_actual,
             CAST(sum(abs(a.cnt - b.cnt)) * 10000 // sum(a.cnt) AS BIGINT) AS wape_bp
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day = b.day + 7
      GROUP BY 1
    """.trim))

  /** Difference-in-differences cohort uplift: treatment = odd
    * user_id, period split at day 15 — purchase rate per user-day in
    * each (cohort, period) cell, DiD in exact e6 units. Rates are
    * integer ratios (purchases·10^6 div user-days); the DiD is
    * arithmetic over those exact longs, so the whole causal readout
    * is float-free.
    */
  val q198 = GraftQuery(
    "q198_cohort_uplift",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        expr("ts div 86400000000000").as("day"), col("event_type"))
      val cell = ev
        .withColumn("treated", (col("user_id") % 2 === 1).cast("int"))
        .withColumn("after", (col("day") >= 19738).cast("int"))
        .groupBy(col("treated"), col("after"))
        .agg(countDistinct(col("user_id"), col("day")).as("user_days"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purchases"))
        .withColumn("rate_e6", expr("purchases * 1000000L div user_days"))
      val p = cell.groupBy()
        .pivot(concat(col("treated"), col("after")), Seq("00", "01", "10", "11"))
        .agg(first(col("rate_e6")))
      cell.agg(sum(col("user_days")).as("total_user_days"),
          sum(col("purchases")).as("total_purchases"))
        .crossJoin(broadcast(p))
        .select(col("total_user_days"), col("total_purchases"),
          (col("11") - col("10") - (col("01") - col("00"))).as("did_e6"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
                         event_type
                  FROM events),
      cell AS (SELECT CAST(user_id % 2 AS INT) AS treated,
                      CASE WHEN day >= 19738 THEN 1 ELSE 0 END AS after,
                      CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS user_days,
                      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
               FROM ev GROUP BY 1, 2),
      r AS (SELECT treated, after, user_days, purchases,
                   purchases * 1000000 // user_days AS rate_e6
            FROM cell)
      SELECT CAST(sum(user_days) AS BIGINT) AS total_user_days,
             CAST(sum(purchases) AS BIGINT) AS total_purchases,
             CAST(max(CASE WHEN treated = 1 AND after = 1 THEN rate_e6 END)
                - max(CASE WHEN treated = 1 AND after = 0 THEN rate_e6 END)
                - (max(CASE WHEN treated = 0 AND after = 1 THEN rate_e6 END)
                 - max(CASE WHEN treated = 0 AND after = 0 THEN rate_e6 END))
               AS BIGINT) AS did_e6
      FROM r
    """.trim))

  /** Event-type Markov transition matrix: per-user consecutive
    * event-type pairs, row-normalized to e4 probabilities by integer
    * div — the behavioral fingerprint (what follows a click?). 25
    * cells; the window is the per-user ordered scan every session
    * analysis here already pays.
    */
  val q204 = GraftQuery(
    "q204_markov_transitions",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("cnt"))
      val totals = pairs.groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("row_total"))
      pairs.join(broadcast(totals), "event_type")
        .select(col("event_type"), col("next_type"), col("cnt"),
          expr("cnt * 10000L div row_total").as("prob_e4"))
    },
    Some("""
      WITH p AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
      c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS cnt
            FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS row_total
            FROM c GROUP BY 1)
      SELECT c.event_type, c.next_type, c.cnt,
             c.cnt * 10000 // t.row_total AS prob_e4
      FROM c JOIN t USING (event_type)
    """.trim))

  /** Pareto / ABC inventory classification: parts ranked by exact
    * micro-unit revenue (the q176 integer-units rule), cumulative
    * share through [[graft.operators.Layout.globalPrefixSum]] — the
    * distributed prefix sum, never a one-partition window over the
    * part universe — then A/B/C at the 80/95 fences via exact
    * cross-multiplied comparisons (cum·100 <= T·80).
    */
  val q205 = GraftQuery(
    "q205_abc_classification",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
        .groupBy(col("l_partkey")).agg(sum(col("rev_u")).as("rev"))
        .withColumn("neg_rev", -col("rev"))
      val cum = graft.operators.Layout.globalPrefixSum(rev,
        Seq(col("neg_rev"), col("l_partkey")), "rev", "cum")
      val total = cum.agg(max(col("cum")).as("t"))
      cum.crossJoin(broadcast(total))
        .withColumn("cls",
          when(col("cum") * 100 <= col("t") * 80, "A")
            .when(col("cum") * 100 <= col("t") * 95, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("revenue_u"))
        .crossJoin(broadcast(total))
        .select(col("cls"), col("n_parts"), col("revenue_u"),
          expr("revenue_u * 10000L div t").as("share_bp"))
    },
    Some("""
      WITH rev AS (SELECT l_partkey,
                          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                                   (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev
                   FROM lineitem GROUP BY 1),
      cum AS (SELECT l_partkey, rev,
                     CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS BIGINT) AS cum
              FROM rev),
      t AS (SELECT CAST(sum(rev) AS BIGINT) AS t FROM rev),
      cls AS (SELECT l_partkey, rev,
                     CASE WHEN cum * 100 <= t * 80 THEN 'A'
                          WHEN cum * 100 <= t * 95 THEN 'B'
                          ELSE 'C' END AS cls
              FROM cum CROSS JOIN t)
      SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rev) AS BIGINT) AS revenue_u,
             CAST(sum(rev) * 10000 // max(t) AS BIGINT) AS share_bp
      FROM cls CROSS JOIN t
      GROUP BY cls
    """.trim))

  /** Last-touch attribution with a bounded lookback: each purchase
    * credits the most recent click by the same user within 1 day,
    * else counts as organic — the marketing-attribution staple.
    * The as-of lookup is [[graft.operators.AsOfJoin.asOfTime]]'s
    * union + running-max shape (one shuffle, no per-pair join); the
    * oracle is DuckDB's native ASOF LEFT JOIN with the same window
    * predicate applied after the match.
    */
  val q213 = GraftQuery(
    "q213_last_touch_attribution",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ns"),
          round(col("value") * 100).cast("long").as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ns"))
      graft.operators.AsOfJoin.asOfTime(purchases, clicks,
          "user_id", "p_ns", "c_ns")
        .withColumn("bucket",
          when(col("asof_time").isNotNull &&
            col("p_ns") - col("asof_time") <= 86400000000000L, "paid")
            .otherwise("organic"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("value_c"))
    },
    Some("""
      WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS p_ns,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_ns(ts) AS c_ns
            FROM events WHERE event_type = 'click'),
      j AS (SELECT p.event_id, p.cents,
                   CASE WHEN c.c_ns IS NOT NULL
                             AND p.p_ns - c.c_ns <= 86400000000000
                        THEN 'paid' ELSE 'organic' END AS bucket
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.p_ns >= c.c_ns)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS value_c
      FROM j GROUP BY 1
    """.trim))

  /** Cohort LTV curve: per signup-week cohort, cumulative purchase
    * value by week age — the matrix a growth team reads daily. First
    * week per user is one hash aggregate; the cumulative runs over
    * (cohort, age) cells only — bounded by calendar², never by users.
    */
  val q214 = GraftQuery(
    "q214_cohort_ltv",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        expr("ts div 604800000000000").as("week"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val first = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      val cells = ev.filter(col("event_type") === "purchase")
        .join(first, "user_id")
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("age"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("value_c"))
      val cohortSizes = first.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"))
      cells.join(broadcast(cohortSizes), "cohort")
        .withColumn("cum_value_c",
          sum(col("value_c")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cohort")).orderBy(col("age"))
            .rowsBetween(Long.MinValue, 0)))
        .withColumn("ltv_per_user_c", expr("cum_value_c div n_users"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS week,
                         event_type, CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events),
      f AS (SELECT user_id, min(week) AS cohort FROM ev GROUP BY 1),
      cells AS (SELECT cohort, week - cohort AS age,
                       CAST(count(*) AS BIGINT) AS n_purchases,
                       CAST(sum(cents) AS BIGINT) AS value_c
                FROM ev JOIN f USING (user_id)
                WHERE event_type = 'purchase'
                GROUP BY 1, 2),
      sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users FROM f GROUP BY 1)
      SELECT cohort, age, n_purchases, value_c, n_users,
             CAST(sum(value_c) OVER (PARTITION BY cohort ORDER BY age) AS BIGINT) AS cum_value_c,
             CAST(sum(value_c) OVER (PARTITION BY cohort ORDER BY age) // n_users AS BIGINT) AS ltv_per_user_c
      FROM cells JOIN sz USING (cohort)
    """.trim))

  /** Rolling 7-day active users per day — the WAU curve. Distinct
    * window-membership cannot compose from daily distincts, so each
    * user-day expands into the 7 report days it supports (explode of
    * a 7-element sequence — linear volume) and the per-day distinct
    * is one exact aggregate. Report days clip to the observed max.
    */
  val q216 = GraftQuery(
    "q216_rolling_wau",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val mx = ud.agg(max(col("day")).as("max_day"))
      ud.select(col("user_id"),
          explode(expr("sequence(day, day + 6)")).as("d"))
        .crossJoin(broadcast(mx))
        .filter(col("d") <= col("max_day"))
        .select(col("user_id"), col("d")).distinct()
        .groupBy(col("d")).agg(count(lit(1)).as("wau"))
        .withColumnRenamed("d", "day")
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id,
                         epoch_ns(ts) // 86400000000000 AS day
                  FROM events),
      mx AS (SELECT max(day) AS max_day FROM ud),
      ex AS (SELECT DISTINCT user_id, CAST(t.d AS BIGINT) AS day
             FROM ud CROSS JOIN mx
             CROSS JOIN unnest(generate_series(ud.day, ud.day + 6)) t(d)
             WHERE t.d <= mx.max_day)
      SELECT day, CAST(count(*) AS BIGINT) AS wau
      FROM ex GROUP BY 1
    """.trim))

  /** CUSUM change-point detection over daily event volume — the
    * classic "when did the level shift" statistic, float-free: with
    * daily counts x_i, n days and total S, the cumulative deviation
    * C_t = Σ_{i<=t}(x_i·n − S) is an exact long (each term is the
    * deviation from the mean scaled by n, so no division ever
    * happens); the change point is the day of max |C_t|, ties to the
    * earliest day. The cumulative runs over calendar-bounded day rows.
    */
  val q218 = GraftQuery(
    "q218_cusum_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val t = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val cum = daily.crossJoin(broadcast(t))
        .withColumn("c", sum(col("x") * col("n") - col("s"))
          // BOUNDED window: per-day rows — calendar-sized, not
          // data-volume-sized
          .over(org.apache.spark.sql.expressions.Window.orderBy(col("day"))
            .rowsBetween(Long.MinValue, 0)))
      val peak = cum.agg(max(abs(col("c"))).as("peak"))
      cum.crossJoin(broadcast(peak))
        .filter(abs(col("c")) === col("peak"))
        .agg(min(col("day")).as("change_day"))
        .crossJoin(broadcast(peak))
        .crossJoin(broadcast(t))
        .select(col("n").as("n_days"), col("s").as("total_events"),
          col("change_day"), col("peak").as("cusum_peak"))
    },
    Some("""
      WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                            CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
            FROM daily),
      cum AS (SELECT day, CAST(sum(x * n - s) OVER (ORDER BY day) AS BIGINT) AS c
              FROM daily CROSS JOIN t),
      pk AS (SELECT CAST(max(abs(c)) AS BIGINT) AS peak FROM cum)
      SELECT t.n AS n_days, t.s AS total_events,
             (SELECT min(day) FROM cum CROSS JOIN pk WHERE abs(c) = peak) AS change_day,
             pk.peak AS cusum_peak
      FROM t CROSS JOIN pk
    """.trim))

  /** Hash-partition skew audit: row counts per md5-derived bucket
    * (32) for each candidate shuffle key — the pre-flight that picks
    * a partitioning key before a 100 TB shuffle. skew_e2 = max
    * bucket over mean in e2 units; near 100 = balanced.
    */
  val q219 = GraftQuery(
    "q219_partition_skew_audit",
    (s, d) => {
      def audit(keyName: String, df: org.apache.spark.sql.DataFrame,
          c: String) =
        df.groupBy(pmod(conv(substring(md5(col(c).cast("string")), 1, 8),
            16, 10).cast("long"), lit(32)).as("b"))
          .agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_buckets"), sum(col("cnt")).as("n_rows"),
            max(col("cnt")).as("max_bucket"))
          .select(lit(keyName).as("key"), col("n_buckets"), col("n_rows"),
            col("max_bucket"),
            expr("max_bucket * 3200L div n_rows").as("skew_e2"))
      val li = Tables.lineitem(s, d)
      audit("l_orderkey", li, "l_orderkey")
        .unionAll(audit("l_partkey", li, "l_partkey"))
        .unionAll(audit("l_suppkey", li, "l_suppkey"))
    },
    Some("""
      WITH b1 AS (SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 32 AS b,
                         count(*) AS cnt FROM lineitem GROUP BY 1),
      b2 AS (SELECT CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 32 AS b,
                    count(*) AS cnt FROM lineitem GROUP BY 1),
      b3 AS (SELECT CAST('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 8) AS BIGINT) % 32 AS b,
                    count(*) AS cnt FROM lineitem GROUP BY 1)
      SELECT 'l_orderkey' AS key, CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(cnt) AS BIGINT) AS n_rows, CAST(max(cnt) AS BIGINT) AS max_bucket,
             CAST(max(cnt) * 3200 // sum(cnt) AS BIGINT) AS skew_e2 FROM b1
      UNION ALL
      SELECT 'l_partkey', CAST(count(*) AS BIGINT), CAST(sum(cnt) AS BIGINT),
             CAST(max(cnt) AS BIGINT), CAST(max(cnt) * 3200 // sum(cnt) AS BIGINT) FROM b2
      UNION ALL
      SELECT 'l_suppkey', CAST(count(*) AS BIGINT), CAST(sum(cnt) AS BIGINT),
             CAST(max(cnt) AS BIGINT), CAST(max(cnt) * 3200 // sum(cnt) AS BIGINT) FROM b3
    """.trim))

  /** Deterministic review sample: the 100 documents with the
    * smallest md5(doc_id) — a stable "random" sample that is
    * IDENTICAL across engines, runs, partitionings, and appends of
    * higher ids (the property review workflows need: yesterday's
    * sample stays reviewable today). TakeOrdered on the hash, id
    * tie-break.
    */
  val q220 = GraftQuery(
    "q220_review_sample",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(100)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
    Some("""
      SELECT doc_id, lang, source, n_chars
      FROM (SELECT *, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
            ORDER BY h, doc_id LIMIT 100)
    """.trim))

  /** CUBE over (returnflag, linestatus) — q53's ROLLUP sibling with
    * ALL four grouping levels (the cross-combinations ROLLUP omits:
    * per-linestatus subtotals without a returnflag). One Expand +
    * two-phase aggregate pass, exactly like ROLLUP — the level count
    * changes, the plan shape does not.
    */
  val q233 = GraftQuery(
    "q233_cube_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
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
      GROUP BY CUBE (l_returnflag, l_linestatus)
    """.trim))

  /** Population stability index per event type — THE industry drift
    * scorecard metric (credit-risk lineage; the 0.1/0.25 action
    * thresholds every monitoring runbook quotes), comparing the value
    * distribution of the first half-month (reference) against the
    * second (current) over 10 fixed 50-unit bins with add-one
    * smoothing. Exactness: bin ids and counts are exact integers; the
    * per-bin double term (p−q)·ln(p/q) is computed once per (type,
    * bin) — a 10-row table per type — and floor-quantized to e6
    * BEFORE summation; since each PSI term is ≥ 0 by construction,
    * the quantized sum is an order-independent exact long (the q245
    * discipline). Missing bins participate via an explicit
    * type × bin grid, not by accident of the data.
    */
  val q253 = GraftQuery(
    "q253_psi_drift",
    (s, d) => {
      val midNs = 1705363200000000000L // 2024-01-16T00:00:00Z
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("least(cast(round(value * 100) as long) div 5000, 9L)")
            .as("bin"),
          (col("ts") < midNs).as("is_ref"))
      val counts = ev.groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(s.range(0, 10).select(col("id").as("bin")))
      val tot = counts.groupBy(col("event_type"))
        .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
      grid.join(counts, Seq("event_type", "bin"), "left_outer")
        .na.fill(0L, Seq("c_ref", "c_cur"))
        .join(tot, Seq("event_type"))
        .withColumn("p", (col("c_ref") + 1L).cast("double") /
          (col("n_ref") + 10L).cast("double"))
        .withColumn("q", (col("c_cur") + 1L).cast("double") /
          (col("n_cur") + 10L).cast("double"))
        .withColumn("term_e6",
          floor((col("p") - col("q")) * log(col("p") / col("q")) * 1e6)
            .cast("long"))
        .groupBy(col("event_type"))
        .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
          sum(col("term_e6")).as("psi_e6"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               least(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS bin,
               (epoch_ns(ts) < 1705363200000000000) AS is_ref
        FROM events),
      counts AS (
        SELECT event_type, bin,
               CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
               CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
        FROM ev GROUP BY 1, 2),
      grid AS (
        SELECT event_type, CAST(t.b AS BIGINT) AS bin
        FROM (SELECT DISTINCT event_type FROM ev) CROSS JOIN range(0, 10) t(b)),
      tot AS (
        SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
               CAST(sum(c_cur) AS BIGINT) AS n_cur
        FROM counts GROUP BY 1),
      terms AS (
        SELECT g.event_type, t.n_ref, t.n_cur,
               CAST(floor(
                 (CAST(coalesce(c.c_ref, 0) + 1 AS DOUBLE) / (t.n_ref + 10) -
                  CAST(coalesce(c.c_cur, 0) + 1 AS DOUBLE) / (t.n_cur + 10)) *
                 ln((CAST(coalesce(c.c_ref, 0) + 1 AS DOUBLE) / (t.n_ref + 10)) /
                    (CAST(coalesce(c.c_cur, 0) + 1 AS DOUBLE) / (t.n_cur + 10)))
                 * 1000000) AS BIGINT) AS term_e6
        FROM grid g
        LEFT JOIN counts c ON c.event_type = g.event_type AND c.bin = g.bin
        JOIN tot t ON t.event_type = g.event_type)
      SELECT event_type, n_ref, n_cur,
             CAST(sum(term_e6) AS BIGINT) AS psi_e6
      FROM terms GROUP BY 1, 2, 3
    """.trim))

  /** k-anonymity audit (Sweeney 2002) over a would-be event release
    * with quasi-identifiers (day, value band): per event type, how
    * many equivalence classes fall below k=5 and what fraction of
    * rows they expose — the data-governance pre-release check, in
    * exact integer basis points. One hash aggregate over the QI
    * tuple, then a bounded rollup; oracle replays the banding, the
    * class sizes, and the risk arithmetic.
    */
  val q257 = GraftQuery(
    "q257_k_anonymity_audit",
    (s, d) => graft.operators.Privacy.kAnonymityAudit(
        Tables.events(s, d),
        qi = Seq(expr("ts div 86400000000000").as("day"),
          expr("cast(round(value * 100) as long) div 10000").as("value_band")),
        reportBy = col("event_type"), k = 5L)
      .withColumnRenamed("grp", "event_type"),
    Some("""
      WITH qi AS (
        SELECT event_type,
               epoch_ns(ts) // 86400000000000 AS day,
               CAST(round(value * 100) AS BIGINT) // 10000 AS value_band
        FROM events),
      cls AS (
        SELECT event_type, day, value_band, CAST(count(*) AS BIGINT) AS n
        FROM qi GROUP BY 1, 2, 3)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
             CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000 //
                  sum(n) AS BIGINT) AS risk_bp
      FROM cls GROUP BY 1
    """.trim))

  /** PII scan + redaction audit — the scrub step every releasable
    * training corpus runs. The fixture text carries no PII, so the
    * query INJECTS it deterministically (an id-derived email, phone,
    * IPv4, or card number appended to every 10th document per
    * category — the oracle replays the injection literally), scans
    * with the four shared Java/RE2 patterns, redacts in pattern
    * order, and RE-SCANS the redacted text: per category the output
    * is (docs hit, matches found, residual matches after redaction) —
    * and the residual must be 0, proving the redaction catches
    * exactly what the scan counts. One codegen'd regexp per pattern
    * per row, no shuffle before the 4-row rollup.
    */
  val q277 = GraftQuery(
    "q277_pii_scan_redact",
    (s, d) => {
      import graft.operators.Privacy
      val id = col("doc_id")
      val injected = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(id % 10 === 0, concat(lit(" contact user"),
            id.cast("string"), lit("@mail.example.com"))).otherwise(lit("")),
          when(id % 10 === 1, concat(lit(" call 555-"),
            lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
          when(id % 10 === 2, concat(lit(" host 10.0.0."),
            (id % 256).cast("string"))).otherwise(lit("")),
          when(id % 10 === 3, concat(lit(" card 4111 1111 1111 "),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
          .as("text"))
      val summary = Privacy.piiScan(injected, "doc_id", "text")
        .groupBy(col("category"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_matches")).as("n_matches"))
      val residual = Privacy.piiScan(
          injected.select(col("doc_id"),
            Privacy.piiRedact(col("text")).as("text")),
          "doc_id", "text")
        .groupBy(col("category")).agg(sum(col("n_matches")).as("n_residual"))
      summary.join(residual, Seq("category"), "left")
        .select(col("category"), col("n_docs"), col("n_matches"),
          coalesce(col("n_residual"), lit(0L)).as("n_residual"))
    },
    Some {
      val patterns = graft.operators.Privacy.PiiPatterns
      val injectSql = """text ||
               CASE WHEN doc_id % 10 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END ||
               CASE WHEN doc_id % 10 = 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
               CASE WHEN doc_id % 10 = 2 THEN ' host 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE '' END ||
               CASE WHEN doc_id % 10 = 3 THEN ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"""
      val redactSql = patterns.foldLeft("text") { case (acc, (cat, re)) =>
        s"regexp_replace($acc, '$re', '<${cat.toUpperCase}>', 'g')"
      }
      val scanRows = patterns.map { case (cat, re) =>
        s"SELECT doc_id, '$cat' AS category, CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_matches FROM injected"
      }.mkString("\n        UNION ALL\n        ")
      val residualRows = patterns.map { case (cat, re) =>
        s"SELECT '$cat' AS category, CAST(len(regexp_extract_all(redacted, '$re')) AS BIGINT) AS n_matches FROM redactedt"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH injected AS (
        SELECT doc_id,
               $injectSql AS text
        FROM documents),
      scan AS (
        $scanRows),
      summary AS (
        SELECT category, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(sum(n_matches) AS BIGINT) AS n_matches
        FROM scan WHERE n_matches > 0 GROUP BY 1),
      redactedt AS (
        SELECT doc_id, $redactSql AS redacted FROM injected),
      residual AS (
        SELECT category, CAST(sum(n_matches) AS BIGINT) AS n_residual
        FROM ($residualRows) WHERE n_matches > 0 GROUP BY 1)
      SELECT s.category, s.n_docs, s.n_matches,
             coalesce(r.n_residual, 0) AS n_residual
      FROM summary s LEFT JOIN residual r ON r.category = s.category
      """.trim
    })

  def all: Seq[GraftQuery] =
    Seq(q51, q52, q53, q54, q55, q57, q58, q69, q89, q90, q91, q92, q93, q95,
      q110, q129, q139, q147, q149, q152, q156, q157, q159, q161, q162, q163,
      q170, q174, q178, q179, q180, q184, q185, q187, q191, q193, q198,
      q204, q205, q213, q214, q216, q218, q219, q220, q233, q253, q257, q277)
}
