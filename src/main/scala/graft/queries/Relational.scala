package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational parity queries — each maps an operator family from
  * SURVEY.md §2 (reference: /root/reference, SynBioExplorer/
  * agf-data-ingestion) onto the driver testdata tables.
  *
  * All float aggregates are rounded to a fixed scale so the Spark
  * result and the DuckDB oracle agree bit-for-bit despite different
  * summation orders.
  */
object Relational extends QueryRegistry {

  /** A1/A5-style aggregation (SURVEY §2.5): grouped sums/averages over
    * the fact table — the classic pricing-summary shape. Exercises
    * partial (map-side) aggregation + single shuffle on the group key.
    */
  val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)       AS sum_qty,
             round(sum(l_extendedprice), 2)  AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 4)       AS avg_qty,
             round(avg(l_extendedprice), 4)  AS avg_price,
             round(avg(l_discount), 4)       AS avg_disc,
             count(*)                        AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """.trim))

  /** S5 (SURVEY §2.1): scan with projection + filter pushdown — both
    * the predicate and the 4-column read schema should reach the
    * parquet scan (verified via explain in PLANS.md).
    */
  val q02 = GraftQuery(
    "q02_scan_project_filter",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") >= 49)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("price"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_quantity >= 49
    """.trim))

  /** O1 (SURVEY §2.6): sorted top-k — TakeOrderedAndProject. Ties on
    * rounded revenue broken by the unique order key so the top-20 set
    * is deterministic across engines.
    */
  val q03 = GraftQuery(
    "q03_top_revenue_orders",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      val o = Tables.orders(s, d)
      rev.join(o, rev("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("revenue"), col("o_custkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("orderdate_epoch"))
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(20)
    },
    Some("""
      SELECT o_orderkey, revenue, o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch
      FROM (SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY l_orderkey) r
      JOIN orders ON r.l_orderkey = o_orderkey
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 20
    """.trim))

  /** J1 (SURVEY §2.4): anti-join / set difference — the reconciliation
    * core (reference: lambda/agf_reconciliation_lambda.py:64-66).
    */
  val q04 = GraftQuery(
    "q04_customers_without_recent_orders",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """.trim))

  /** Semi-join (EXISTS) companion of J1: orders having at least one
    * deeply-discounted line, counted per priority bucket.
    */
  val q05 = GraftQuery(
    "q05_discounted_orders_by_priority",
    (s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_discount") >= 0.09)
        .select(col("l_orderkey"))
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
      GROUP BY o_orderpriority
    """.trim))

  /** J2 (SURVEY §2.4): union + distinct across heterogeneous tables —
    * one key-set from three tables with different key columns
    * (reference: lambda/agf_reconciliation_lambda.py:128-166).
    */
  val q06 = GraftQuery(
    "q06_union_distinct_keys",
    (s, d) => {
      val a = Tables.lineitem(s, d).select(col("l_suppkey").cast("long").as("key"))
      val b = Tables.supplier(s, d).select(col("s_suppkey").cast("long").as("key"))
      val c = Tables.customer(s, d).select(col("c_custkey").cast("long").as("key"))
      a.union(b).union(c).distinct()
    },
    Some("""
      SELECT DISTINCT key FROM (
        SELECT CAST(l_suppkey AS BIGINT) AS key FROM lineitem
        UNION ALL SELECT CAST(s_suppkey AS BIGINT) FROM supplier
        UNION ALL SELECT CAST(c_custkey AS BIGINT) FROM customer)
    """.trim))

  /** J3 (SURVEY §2.4): insert-if-absent idempotent merge — new rows
    * are the incoming batch anti-joined against the existing table on
    * the primary key (reference: conditional put_item,
    * lambda/agf_ingestion_lambda.py:226-236).
    */
  val q07 = GraftQuery(
    "q07_insert_if_absent",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val existing = orders
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"))
      val incoming = orders.filter(col("o_totalprice") > 150000)
      incoming.join(existing, Seq("o_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders i
      WHERE o_totalprice > 150000
        AND NOT EXISTS (SELECT 1 FROM orders e
                        WHERE e.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                          AND e.o_orderkey = i.o_orderkey)
    """.trim))

  /** J4 (SURVEY §2.4): last-writer-wins merge — keep the
    * highest-priority row per key, priority = (ts desc, event_id desc)
    * (reference: unconditional batch_writer overwrite,
    * lambda/agf_ingestion_lambda.py:238-252).
    */
  val q08 = GraftQuery(
    "q08_last_writer_wins",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(desc("ts"), desc("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
    },
    Some("""
      SELECT user_id, event_type, event_id, value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) = 1
    """.trim))

  /** W2 (SURVEY §2.7): latest-version-per-key read — the versioned
    * experiments table pattern (key = (experiment_id, last_updated)).
    */
  val q09 = GraftQuery(
    "q09_latest_order_per_customer",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("orderdate_epoch"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """.trim))

  /** W1 (SURVEY §2.7): duplicate-basename disambiguation — collision
    * on a derived name gets suffix _1, _2, ... in arrival order
    * (reference: lambda/agf_zip_generator_lambda.py:104-114).
    */
  val q10 = GraftQuery(
    "q10_dedup_basename_suffix",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("base")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("base", substring_index(col("text"), " ", 1))
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"),
          when(col("rn") === 1, col("base"))
            .otherwise(concat(col("base"), lit("_"), col("rn") - 1))
            .as("final_name"))
    },
    Some("""
      SELECT doc_id,
             CASE WHEN rn = 1 THEN base ELSE base || '_' || CAST(rn - 1 AS VARCHAR) END AS final_name
      FROM (SELECT doc_id, split_part(text, ' ', 1) AS base,
                   row_number() OVER (PARTITION BY split_part(text, ' ', 1)
                                      ORDER BY doc_id) AS rn
            FROM documents)
    """.trim))

  /** Time-bucketed rollup (T6 analog in batch): tumbling 1-hour
    * windows over the event stream table.
    */
  val q11 = GraftQuery(
    "q11_hourly_event_rollup",
    (s, d) => {
      Tables.events(s, d)
        .groupBy((expr("ts div 3600000000000") * 3600).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
    },
    Some("""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
    """.trim))

  /** J1 both directions + A3 (SURVEY §3.2): the reconciliation job —
    * keys present on one side but not the other, tagged by direction
    * (reference: lambda/agf_reconciliation_lambda.py:48-96).
    */
  val q12 = GraftQuery(
    "q12_reconcile_orphans",
    (s, d) => {
      val left = Tables.events(s, d).select(col("user_id").cast("long").as("key")).distinct()
      val right = Tables.customer(s, d).select(col("c_custkey").cast("long").as("key")).distinct()
      val inLeftOnly = left.join(right, Seq("key"), "left_anti")
        .select(lit("events_only").as("direction"), col("key"))
      val inRightOnly = right.join(left, Seq("key"), "left_anti")
        .select(lit("customer_only").as("direction"), col("key"))
      inLeftOnly.union(inRightOnly)
    },
    Some("""
      SELECT 'events_only' AS direction, key
      FROM (SELECT DISTINCT CAST(user_id AS BIGINT) AS key FROM events) l
      WHERE NOT EXISTS (SELECT 1 FROM customer WHERE CAST(c_custkey AS BIGINT) = l.key)
      UNION ALL
      SELECT 'customer_only' AS direction, key
      FROM (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS key FROM customer) r
      WHERE NOT EXISTS (SELECT 1 FROM events WHERE CAST(user_id AS BIGINT) = r.key)
    """.trim))

  /** Bounded-heap top-k per group (custom TypedImperativeAggregate,
    * graft.expressions.TopKRows): shuffles at most k rows per group
    * per map task — the scalable form of the W2 window pattern. The
    * oracle is the equivalent window formulation.
    */
  val q17 = GraftQuery(
    "q17_topk_per_group",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("rowid",
          col("l_orderkey") * 100 + col("l_linenumber").cast("long"))
      graft.operators.TopK.perGroup(li, Seq("l_suppkey"),
        "l_extendedprice", "rowid", Seq("l_partkey"), k = 2)
    },
    Some("""
      SELECT l_suppkey, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
             l_orderkey * 100 + l_linenumber AS rowid, l_partkey
      FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_suppkey
                                 ORDER BY l_extendedprice DESC,
                                          l_orderkey * 100 + l_linenumber ASC) <= 2
    """.trim))

  /** As-of join (operators.AsOfJoin): each event matched to the
    * latest order of the same customer at or before the event time —
    * composed as union + one running-max window (single shuffle).
    * Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  val q18 = GraftQuery(
    "q18_asof_join",
    (s, d) => {
      val events = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("event_sec"))
      val orders = Tables.orders(s, d)
        .select(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("timestamp").cast("long").as("order_sec"))
      graft.operators.AsOfJoin.asOfTime(events, orders,
        "user_id", "event_sec", "order_sec")
        .withColumnRenamed("asof_time", "last_order_epoch")
    },
    Some("""
      SELECT e.event_id, e.user_id,
             epoch_ns(e.ts) // 1000000000 AS event_sec,
             CAST(epoch(o.o_orderdate) AS BIGINT) AS last_order_epoch
      FROM events e ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey
       AND (epoch_ns(e.ts) // 1000000000) >= epoch(o.o_orderdate)
    """.trim))

  /** Range join (operators.RangeJoin): purchase/error events landing
    * inside the hour after the same user's signup events — binned
    * equi-join, not a nested-loop BETWEEN. Oracle: plain inequality
    * join.
    */
  val q19 = GraftQuery(
    "q19_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("sec", expr("ts div 1000000000"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("sec").as("start_sec"),
          (col("sec") + 3600).as("end_sec"))
      val others = ev.filter(col("event_type") =!= "signup")
        .select(col("user_id"), col("event_id"), col("sec"))
      graft.operators.RangeJoin.pointInInterval(others, signups,
        "user_id", "sec", "start_sec", "end_sec", binSize = 3600)
        .select(col("signup_id"), col("event_id"), col("user_id"),
          (col("sec") - col("start_sec")).as("lag_sec"))
    },
    Some("""
      WITH ev AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000000000 AS sec FROM events)
      SELECT s.event_id AS signup_id, o.event_id, s.user_id,
             o.sec - s.sec AS lag_sec
      FROM ev s JOIN ev o
        ON s.user_id = o.user_id
       AND s.event_type = 'signup' AND o.event_type <> 'signup'
       AND o.sec >= s.sec AND o.sec <= s.sec + 3600
    """.trim))

  /** TPC-H Q7-shaped volume shipping: revenue between two nation
    * pairs by ship year, across a five-way join (lineitem-orders-
    * customer-supplier-nation x2). The join-planning showcase: both
    * nation sides broadcast (25 rows), the fact joins shuffle on
    * their keys, and revenue aggregates as EXACT integer 1e-4-dollar
    * units (price cents x (100 - discount pct) — the q85 lesson:
    * double sums at this magnitude are order-unstable on BOTH round
    * and floor boundaries; integers are the only stable grid).
    */
  val q109 = GraftQuery(
    "q109_volume_shipping",
    (s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("revenue_u"))
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      GROUP BY 1, 2, 3
    """.trim))

  /** TPC-H Q8-shaped market share: among PROMO-part order lines of
    * ASIA-region customers, NATION_1 suppliers' revenue share by
    * order year — an eight-table join (lineitem, part, orders,
    * customer, nation x2, region, supplier) with every dimension side
    * broadcast. Revenue in exact integer units (q85/q109 discipline);
    * the share is a floor4 of an exactly-rounded IEEE division of
    * identical longs, so it is engine-deterministic.
    */
  val q111 = GraftQuery(
    "q111_market_share",
    (s, d) => {
      val nCust = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val nSupp = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val revU = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))
      Tables.lineitem(s, d)
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(revU).as("total_rev_u"),
          sum(when(col("supp_nation") === "NATION_1", revU)
            .otherwise(lit(0L))).as("nation1_rev_u"))
        .withColumn("share4",
          floor(col("nation1_rev_u").cast("double") /
            col("total_rev_u").cast("double") * 10000) / 10000.0)
    },
    Some("""
      WITH rev AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(round(l_extendedprice * 100) AS BIGINT) *
               (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON l_partkey  = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO')
      SELECT o_year,
             CAST(sum(rev_u) AS BIGINT) AS total_rev_u,
             CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_u ELSE 0 END) AS BIGINT) AS nation1_rev_u,
             floor(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_u ELSE 0 END) AS DOUBLE) /
                   CAST(sum(rev_u) AS DOUBLE) * 10000) / 10000 AS share4
      FROM rev
      GROUP BY o_year
    """.trim))

  /** TPC-H Q22-shaped "global accounts": positive-balance customers
    * strictly above the average positive balance with no RECENT orders
    * (none since 2000-01-01 — Q22's seven-year dormancy window, q04's
    * cutoff), rolled up per nation — the scalar-subquery + anti-join
    * construct (Q22's phone-prefix filter becomes the nation rollup
    * our schema supports). The global average is a 1-row aggregate
    * broadcast via crossJoin — exactly the plan Catalyst builds for a
    * scalar subquery, declared explicitly. The threshold compares in
    * INTEGER CENTS with integral division (avg_c = sum div n): a
    * double average can land within an ulp of an exact-2dp balance
    * and flip the > across engines (the q85 lesson applied to a
    * comparison instead of a sum).
    */
  val q119 = GraftQuery(
    "q119_dormant_high_balance",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .withColumn("bal_c", round(col("c_acctbal") * 100).cast("long"))
        .filter(col("bal_c") > 0)
      val thresh = cust.agg(expr("sum(bal_c) div count(1)").as("avg_c"))
      val dormant = cust.crossJoin(broadcast(thresh))
        .filter(col("bal_c") > col("avg_c"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
      dormant
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"), sum(col("bal_c")).as("total_bal_c"))
    },
    Some("""
      WITH c AS (SELECT c_custkey, c_nationkey,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
                 FROM customer),
      pos AS (SELECT * FROM c WHERE bal_c > 0),
      t AS (SELECT CAST(sum(bal_c) // count(*) AS BIGINT) AS avg_c FROM pos),
      d AS (SELECT pos.* FROM pos CROSS JOIN t
            WHERE bal_c > avg_c
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
             CAST(sum(bal_c) AS BIGINT) AS total_bal_c
      FROM d JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    """.trim))

  /** Bloom-runtime-filtered fact/dim join: urgent orders' keys are
    * tree-aggregated into a Bloom filter (commutative bit-OR — one
    * pass, MB-scale bits on the driver) and probed as a codegen'd
    * native predicate inside the lineitem scan stage, so the fact
    * side is pruned BEFORE the join shuffle — the move for dims too
    * big to broadcast whose key set still fits Bloom bits. The exact
    * join that follows removes Bloom false positives, so the result
    * is byte-identical to the plain join (which is exactly what the
    * oracle runs — the Bloom stage is invisible to it at every fpp).
    * Revenue in exact integer units (q109 discipline).
    */
  val q123 = GraftQuery(
    "q123_bloom_prune_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.RuntimeFilter
        .bloomPrunedEquiJoin(Tables.lineitem(s, d), "l_orderkey",
          urgent, "o_orderkey", fpp = 0.01)
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("revenue_u"))
    },
    Some("""
      SELECT l_returnflag, year(l_shipdate) AS ship_year,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1, 2
    """.trim))

  /** TPC-H Q13-shaped order-count distribution: how many customers
    * placed how many (non-low-priority) orders, INCLUDING the
    * zero-order customers the left join preserves — the histogram
    * shape plain inner-join aggregates can't produce. Two chained
    * hash aggregates, both map-side combinable; the right-side
    * predicate pre-filters before the join (equivalent to Q13's
    * join-condition placement for LEFT OUTER).
    */
  val q144 = GraftQuery(
    "q144_order_count_distribution",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select(col("o_custkey"), col("o_orderkey"))
      c.select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""
      WITH pc AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
      SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
      FROM pc GROUP BY c_count
    """.trim))

  /** TPC-H Q17 shape (small-quantity-order revenue): lineitems of one
    * brand's parts below 20% of their part's average quantity. The
    * correlated scalar subquery decorrelates into a per-part
    * aggregate joined back; the brand filter broadcasts FIRST so both
    * the aggregate and the probe scan only the brand's lineitems.
    * The 0.2·avg comparison is exact rational arithmetic
    * (5·q·cnt < sum_q — quantities are integral), and revenue is an
    * exact-cents integral division by 7 — no float anywhere.
    */
  val q175 = GraftQuery(
    "q175_small_qty_revenue",
    (s, d) => {
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val l = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val stats = l.groupBy(col("l_partkey"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("c"))
      l.join(stats, "l_partkey")
        .filter(lit(5) * col("q") * col("c") < col("sq"))
        .agg(count(lit(1)).as("n_small"),
          expr("sum(cents) div 7").as("avg_yearly_cents"))
    },
    Some("""
      WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
      l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem JOIN p ON l_partkey = p_partkey),
      s AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq, count(*) AS c
            FROM l GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_small,
             CAST(sum(l.cents) // 7 AS BIGINT) AS avg_yearly_cents
      FROM l JOIN s USING (l_partkey)
      WHERE 5 * l.q * s.c < s.sq
    """.trim))

  /** TPC-H Q15 shape (top supplier for a quarter): per-supplier
    * revenue in EXACT integer micro-units (cents x (100 - disc%)) so
    * the argmax can never flip on a float ulp cross-engine; the
    * scalar max is a 1-row broadcast; winners (all ties) join the
    * supplier dim by key. Revenue compares exactly or not at all —
    * that's the Q15 semantics (the view's max may tie).
    */
  val q176 = GraftQuery(
    "q176_top_supplier_quarter",
    (s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("u"))
      val rev = l.groupBy(col("l_suppkey")).agg(sum(col("u")).as("rev_u"))
      val mx = rev.agg(max(col("rev_u")).as("mx"))
      rev.crossJoin(broadcast(mx)).filter(col("rev_u") === col("mx"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev_u"))
    },
    Some("""
      WITH l AS (SELECT l_suppkey,
                        CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT)) AS u
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
      r AS (SELECT l_suppkey, CAST(sum(u) AS BIGINT) AS rev_u FROM l GROUP BY 1),
      m AS (SELECT max(rev_u) AS mx FROM r)
      SELECT s_suppkey, s_name, rev_u
      FROM r CROSS JOIN m JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev_u = mx
    """.trim))

  /** TPC-H Q16 shape (supplier diversity): distinct suppliers per
    * (brand, type) excluding one brand and all high-return suppliers
    * (return rate > 35%, decided by the exact cross-multiply
    * r·20 > n·7 — no float rates). The exclusion list is a hash-agg
    * over lineitem broadcast into a left-anti join; part is a
    * broadcast dimension. The two count(DISTINCT) columns expand the
    * aggregate 3x (Spark's multi-distinct Expand) — the price of
    * exact distincts; the HLL twin (q46 family) is the approximate
    * escape at 100 TB.
    */
  val q188 = GraftQuery(
    "q188_supplier_diversity",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val bad = li.groupBy(col("l_suppkey"))
        .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"),
          count(lit(1)).as("c"))
        .filter(col("r") * 20 > col("c") * 7)
        .select(col("l_suppkey"))
      li.join(broadcast(bad), Seq("l_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, d)),
          col("p_partkey") === col("l_partkey"))
        .filter(col("p_brand") =!= "Brand#1")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("p_partkey")).as("n_parts"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      WITH bad AS (SELECT l_suppkey FROM lineitem GROUP BY 1
                   HAVING sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 20 > count(*) * 7)
      SELECT p_brand, p_type,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1'
        AND l_suppkey NOT IN (SELECT l_suppkey FROM bad)
      GROUP BY 1, 2
    """.trim))

  /** Referential-integrity audit across the star schema: orphan
    * counts + coverage for every FK edge — the constraint-check half
    * of the Expectations suite, as data instead of an exception.
    * Each edge is one left join over DISTINCT child keys (the join
    * carries keys, not rows — at 100 TB lineitem's billions of rows
    * reduce map-side to their key set first); no broadcast is forced
    * because parent sides (orders) are fact-sized — AQE picks the
    * strategy per edge.
    */
  val q203 = GraftQuery(
    "q203_referential_integrity",
    (s, d) => {
      def fk(rel: String, child: org.apache.spark.sql.DataFrame,
          childKey: String, parent: org.apache.spark.sql.DataFrame,
          parentKey: String) =
        child.select(col(childKey).as("k")).distinct()
          .join(parent.select(col(parentKey).as("pk")).distinct(),
            col("k") === col("pk"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_child"), col("n_orphans"))
      val li = Tables.lineitem(s, d)
      fk("lineitem->orders", li, "l_orderkey", Tables.orders(s, d), "o_orderkey")
        .unionAll(fk("lineitem->part", li, "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionAll(fk("lineitem->supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionAll(fk("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .withColumn("coverage_bp",
          expr("(n_child - n_orphans) * 10000L div n_child"))
    },
    Some("""
      WITH checks AS (
        SELECT 'lineitem->orders' AS relation,
               CAST(count(*) AS BIGINT) AS n_child,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT DISTINCT l_partkey FROM lineitem) c
        LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON l_partkey = p_partkey
        UNION ALL
        SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
        LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) p ON l_suppkey = s_suppkey
        UNION ALL
        SELECT 'orders->customer', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT DISTINCT o_custkey FROM orders) c
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p ON o_custkey = c_custkey)
      SELECT relation, n_child, n_orphans,
             (n_child - n_orphans) * 10000 // n_child AS coverage_bp
      FROM checks
    """.trim))

  /** Order-to-ship latency SLO by priority: exact integer latency
    * days (timestamp div — both sides date-resolution), floor4 exact
    * percentiles on the q57/q149 grid, and 7-day attainment in bp.
    * The logistics scorecard, float-free.
    */
  val q206 = GraftQuery(
    "q206_ship_latency_slo",
    (s, d) => {
      import graft.functions.QualityFunctions.floor4
      val lat = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          ((col("l_shipdate").cast("timestamp").cast("long") -
            col("o_orderdate").cast("timestamp").cast("long")) / lit(86400L))
            .cast("long").as("lat_days"))
      lat.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          floor4(expr("percentile(lat_days, 0.5)")).as("p50_days"),
          floor4(expr("percentile(lat_days, 0.9)")).as("p90_days"),
          sum(when(col("lat_days") <= 7, 1L).otherwise(0L)).as("within_7d"))
        .withColumn("slo_bp", expr("within_7d * 10000L div n_lines"))
    },
    Some("""
      WITH lat AS (SELECT o_orderpriority,
                          CAST((epoch(l_shipdate) - epoch(o_orderdate)) // 86400 AS BIGINT) AS lat_days
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
             floor(quantile_cont(lat_days, 0.5) * 10000) / 10000 AS p50_days,
             floor(quantile_cont(lat_days, 0.9) * 10000) / 10000 AS p90_days,
             CAST(sum(CASE WHEN lat_days <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS within_7d,
             CAST(sum(CASE WHEN lat_days <= 7 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS slo_bp
      FROM lat GROUP BY 1
    """.trim))

  /** Supplier concentration (Herfindahl index) per region: HHI_e8 =
    * Σs²·10^8 div T² with supplier revenues s and region total T as
    * exact integers — squares accumulate in decimal(38,0) (Spark) /
    * HUGEINT (DuckDB), the q185 big-integer discipline, so the
    * monopoly metric is bit-exact. Dimensions (supplier→nation→
    * region) broadcast.
    */
  val q207 = GraftQuery(
    "q207_supplier_hhi",
    (s, d) => {
      val dim = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("r_name"))
      val sup = Tables.lineitem(s, d)
        .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("r_name"), col("s_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long"))).as("srev"))
      sup.groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"), sum(col("srev")).as("total_u"),
          sum(col("srev").cast("decimal(38,0)") *
            col("srev").cast("decimal(38,0)")).as("ss"))
        .select(col("r_name"), col("n_suppliers"), col("total_u"),
          expr("""cast(ss * 100000000 div
                       (cast(total_u as decimal(38,0)) * total_u) as long)""")
            .as("hhi_e8"))
    },
    Some("""
      WITH dim AS (SELECT s_suppkey, r_name
                   FROM supplier JOIN nation ON s_nationkey = n_nationkey
                                 JOIN region ON n_regionkey = r_regionkey),
      sup AS (SELECT r_name, s_suppkey,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                              (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS srev
              FROM lineitem JOIN dim ON l_suppkey = s_suppkey
              GROUP BY 1, 2)
      SELECT r_name, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(srev) AS BIGINT) AS total_u,
             CAST(sum(CAST(srev AS HUGEINT) * srev) * 100000000
                  // (CAST(sum(srev) AS HUGEINT) * sum(srev)) AS BIGINT) AS hhi_e8
      FROM sup GROUP BY 1
    """.trim))

  /** TPC-H Q5 shape (region-restricted snowflake rollup): revenue by
    * nation for one region and one order-year — the canonical 6-table
    * star join. All dimension sides broadcast; the only shuffle is
    * the final 25-group aggregate; revenue in exact micro-units (the
    * q176 rule).
    */
  val q208 = GraftQuery(
    "q208_local_supplier_volume",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust),
          col("o_custkey") === col("c_custkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_u"))
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    """.trim))

  /** TPC-H Q6 shape (forecast revenue change): one tight scan —
    * year + discount band + quantity cap — reduced to a single exact
    * micro-unit scalar (cents x discount-pct, the integer-units
    * rule). The predicate and 3-column read schema push to parquet;
    * the discount band compares exact integer pct, not doubles.
    */
  val q209 = GraftQuery(
    "q209_forecast_revenue",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") < 24)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .filter(col("disc_pct") >= 5 && col("disc_pct") <= 7)
      .agg(count(lit(1)).as("n_lines"),
        sum(col("cents") * col("disc_pct")).as("revenue_u")),
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_quantity < 24
        AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
    """.trim))

  /** TPC-H Q10 shape (returned-item reporting): top-20 customers by
    * revenue lost to returns in one quarter — fact-fact join on
    * orderkey, customer+nation dims broadcast, exact micro-units,
    * TakeOrdered with custkey tie-break.
    */
  val q210 = GraftQuery(
    "q210_returned_items",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long")))
          .as("lost_u"))
      rev.join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("lost_u"))
        .orderBy(col("lost_u").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      WITH rev AS (SELECT o_custkey,
                          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                                   (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS lost_u
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE l_returnflag = 'R'
                     AND o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate < TIMESTAMP '1996-04-01'
                   GROUP BY 1)
      SELECT c_custkey, c_name, n_name, lost_u
      FROM rev JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
      ORDER BY lost_u DESC, c_custkey LIMIT 20
    """.trim))

  /** TPC-H Q14 shape (promotion effect): promo revenue share in exact
    * bp — conditional sum over one month's lines with the part
    * dimension broadcast; the share is an integer ratio of two exact
    * micro-unit sums, no 100.0 * double division.
    */
  val q211 = GraftQuery(
    "q211_promo_effect",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long")))
          .as("rev_u"))
      .agg(sum(when(col("p_type") === "PROMO", col("rev_u")).otherwise(0L))
        .as("promo_u"),
        sum(col("rev_u")).as("total_u"))
      .withColumn("promo_share_bp", expr("promo_u * 10000L div total_u")),
    Some("""
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
                                (100 - CAST(round(l_discount * 100) AS BIGINT))
                           ELSE 0 END) AS BIGINT) AS promo_u,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_u,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
                                (100 - CAST(round(l_discount * 100) AS BIGINT))
                           ELSE 0 END) * 10000
                  // sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS promo_share_bp
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
    """.trim))

  /** TPC-H Q18 shape (large-volume orders): orders whose total
    * quantity exceeds 150 units, with their customer — the classic
    * HAVING-on-fact-aggregate + dim join. Quantities are integral
    * doubles; they become exact longs before summing. Full filtered
    * set, no limit — the driver's hash compare is order-insensitive.
    */
  val q212 = GraftQuery(
    "q212_large_volume_orders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("total_qty"))
        .filter(col("total_qty") > 150)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          round(col("o_totalprice") * 100).cast("long").as("price_c"),
          col("total_qty"))
    },
    Some("""
      WITH big AS (SELECT l_orderkey,
                          CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
                   FROM lineitem GROUP BY 1 HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 150)
      SELECT o_orderkey, c_custkey, c_name,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, total_qty
      FROM big JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
    """.trim))

  /** FK fan-out audit: children-per-parent distribution for every
    * join edge — the pre-flight that predicts join output blowup and
    * flags keys needing skew handling (the q144 cardinality estimate,
    * per-edge and with a max). One hash aggregate per edge.
    */
  val q215 = GraftQuery(
    "q215_fanout_audit",
    (s, d) => {
      def edge(rel: String, child: org.apache.spark.sql.DataFrame,
          key: String) =
        child.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_parents"), sum(col("c")).as("n_children"),
            max(col("c")).as("max_fanout"))
          .select(lit(rel).as("edge"), col("n_parents"), col("n_children"),
            col("max_fanout"),
            expr("n_children * 100L div n_parents").as("avg_fanout_e2"))
      val li = Tables.lineitem(s, d)
      edge("lineitem/order", li, "l_orderkey")
        .unionAll(edge("lineitem/part", li, "l_partkey"))
        .unionAll(edge("lineitem/supplier", li, "l_suppkey"))
        .unionAll(edge("orders/customer", Tables.orders(s, d), "o_custkey"))
    },
    Some("""
      WITH e1 AS (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey),
      e2 AS (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey),
      e3 AS (SELECT count(*) AS c FROM lineitem GROUP BY l_suppkey),
      e4 AS (SELECT count(*) AS c FROM orders GROUP BY o_custkey)
      SELECT 'lineitem/order' AS edge, CAST(count(*) AS BIGINT) AS n_parents,
             CAST(sum(c) AS BIGINT) AS n_children, CAST(max(c) AS BIGINT) AS max_fanout,
             CAST(sum(c) * 100 // count(*) AS BIGINT) AS avg_fanout_e2 FROM e1
      UNION ALL
      SELECT 'lineitem/part', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
             CAST(max(c) AS BIGINT), CAST(sum(c) * 100 // count(*) AS BIGINT) FROM e2
      UNION ALL
      SELECT 'lineitem/supplier', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
             CAST(max(c) AS BIGINT), CAST(sum(c) * 100 // count(*) AS BIGINT) FROM e3
      UNION ALL
      SELECT 'orders/customer', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
             CAST(max(c) AS BIGINT), CAST(sum(c) * 100 // count(*) AS BIGINT) FROM e4
    """.trim))

  /** TPC-H Q4 shape: orders with a correlated EXISTS — at least one
    * lineitem shipped more than 30 days after the order date (the
    * commit/receipt-date correlation re-expressed on this schema's
    * columns), counted by priority. The decorrelation pattern nothing
    * else in the suite exercises: the EXISTS predicate references the
    * OUTER row (o_orderdate) inside the subquery, so it must become a
    * LEFT SEMI join with the correlated comparison in the join
    * condition — never a full join + distinct (which would double
    * count multi-line orders) and never a cartesian.
    */
  val q224 = GraftQuery(
    "q224_priority_late_semi",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("interval 30 days"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY 1
    """.trim))

  /** TPC-H Q21 shape (suppliers who kept the order waiting): for each
    * finished-order lineitem flagged 'R', the supplier is counted iff
    * ANOTHER supplier participated in the order (EXISTS -> LEFT SEMI
    * on the same fact table, inequality in the join condition) and NO
    * other supplier's line was also flagged (NOT EXISTS -> LEFT ANTI,
    * same shape) — the classic multi-level semi/anti chain over one
    * fact table, the hardest of the canonical TPC-H plans. Supplier
    * dim broadcasts; the two self-joins shuffle on l_orderkey only,
    * carrying three narrow columns. Top-20 cut is deterministic:
    * (numwait DESC, s_name ASC) and s_name is unique.
    */
  val q225 = GraftQuery(
    "q225_waiting_supplier_anti_chain",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
      val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("l3_orderkey"),
          col("l_suppkey").as("l3_suppkey"))
      l1.join(l2,
          col("l_orderkey") === col("l2_orderkey") &&
            col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(l3,
          col("l_orderkey") === col("l3_orderkey") &&
            col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(20)
    },
    Some("""
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20
    """.trim))

  /** TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    * both join sides (brand x size x quantity bands) — the classic
    * test that a DISJUNCTION still pushes down: Catalyst must extract
    * the per-side implications (the brand/size OR-chain to the part
    * scan, the quantity OR-chain to the lineitem scan) so both scans
    * prune before the join, while the full disjunction is re-checked
    * after it. PushedFilters evidence recorded in PLANS.md; part
    * broadcasts. Revenue in exact integer micro-units (cents x
    * discount-pct, the q208/q209 rule).
    */
  val q226 = GraftQuery(
    "q226_disjunctive_pushdown",
    (s, d) => {
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("p_partkey") === col("l_partkey"))
        .filter(cond)
        .agg(count(lit(1)).as("n_lines"),
          sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100) - round(col("l_discount") * 100).cast("long")))
            .as("revenue_u"))
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity >= 1 AND l_quantity <= 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity >= 10 AND l_quantity <= 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity >= 20 AND l_quantity <= 30)
    """.trim))

  /** TPC-H Q20 shape (excess-volume suppliers): suppliers who, for
    * some 'red' part, shipped more than 30% of that part's total
    * 1996 volume — the nested correlated-aggregate chain: a
    * (part, supplier) aggregate compared against a correlated
    * part-level aggregate, the survivors semi-joined up to the
    * supplier dim. Decorrelated form: both aggregates come from ONE
    * shuffle lineage (pair re-aggregates to tot), the threshold is a
    * co-partitioned join on l_partkey (no second fact scan), part
    * filter broadcasts into the pair side, supplier dim broadcasts at
    * the end. Quantities in exact centi-units; the 30% test is
    * integer cross-multiplication, never a double ratio.
    */
  val q227 = GraftQuery(
    "q227_excess_volume_supplier",
    (s, d) => {
      val pair = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(round(sum(col("l_quantity")) * 100).cast("long").as("qty_c"))
      val redPair = pair.join(
        broadcast(Tables.part(s, d).filter(col("p_name").like("red%"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      val tot = pair.groupBy(col("l_partkey"))
        .agg(sum(col("qty_c")).as("tot_c"))
      redPair.join(tot, Seq("l_partkey"))
        .filter(col("qty_c") * 10 > col("tot_c") * 3)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_parts"))
    },
    Some("""
      WITH pair AS (
        SELECT l_partkey, l_suppkey,
               CAST(round(sum(l_quantity) * 100) AS BIGINT) AS qty_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2),
      tot AS (SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS tot_c
              FROM pair GROUP BY 1),
      excess AS (
        SELECT p.l_suppkey
        FROM pair p
        JOIN part ON p_partkey = p.l_partkey AND p_name LIKE 'red%'
        JOIN tot t ON t.l_partkey = p.l_partkey
        WHERE p.qty_c * 10 > t.tot_c * 3)
      SELECT s_name, CAST(count(*) AS BIGINT) AS n_parts
      FROM supplier JOIN excess ON l_suppkey = s_suppkey
      GROUP BY s_name
    """.trim))

  /** TPC-H Q11 shape (important stock): per-part revenue kept only
    * where it exceeds 1.5x the average per-part revenue — the
    * HAVING-over-a-global-scalar-subquery pattern. Decorrelated form:
    * the global (count, sum) is a one-row aggregate of the SAME
    * per-part aggregate (shared lineage, no second scan), broadcast
    * back over the per-part rows as a cross join; the threshold
    * itself is exact integer cross-multiplication. The relative
    * (x average) threshold — unlike Q11's absolute fraction — keeps
    * the selectivity meaningful at every scale factor.
    */
  val q228 = GraftQuery(
    "q228_revenue_above_average",
    (s, d) => {
      val pr = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long")))
          .as("rev_u"))
      val g = pr.agg(count(lit(1)).as("n_parts_g"),
        sum(col("rev_u")).as("tot_u"))
      // threshold compares in DecimalType: rev_u * n_parts * 10 can
      // exceed 2^63 at large SF, where Spark's long multiply wraps
      // silently (non-ANSI) while DuckDB promotes to HUGEINT — the
      // decimal(38,0) compare keeps both engines exact and aligned
      pr.crossJoin(broadcast(g))
        .filter(col("rev_u").cast("decimal(38,0)") * col("n_parts_g") * 10 >
          col("tot_u").cast("decimal(38,0)") * 15)
        .select(col("l_partkey"), col("rev_u"))
    },
    Some("""
      WITH pr AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_u
        FROM lineitem GROUP BY 1)
      SELECT l_partkey, rev_u FROM pr
      WHERE CAST(rev_u AS HUGEINT) * (SELECT count(*) FROM pr) * 10 >
            CAST((SELECT sum(rev_u) FROM pr) AS HUGEINT) * 15
    """.trim))

  /** TPC-H Q2 shape (min-cost supplier): for each SMALL-type part,
    * the supplier(s) achieving the MINIMUM unit price — the
    * correlated-min-subquery pattern, kept tie-preserving exactly as
    * Q2 is (a struct-argmin would drop tied suppliers). Decorrelated
    * form: the per-(part, supplier) unit price and the per-part min
    * share one shuffle lineage; the "= (SELECT min ...)" becomes a
    * co-partitioned join back on l_partkey; part filter and supplier
    * dim broadcast. Unit price in exact rounded centi-units.
    */
  val q229 = GraftQuery(
    "q229_min_unit_price_supplier",
    (s, d) => {
      val pl = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 0)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") * 100 / col("l_quantity")))
          .cast("long").as("unit_c"))
      val mn = pl.groupBy(col("l_partkey"))
        .agg(min(col("unit_c")).as("min_c"))
      pl.join(mn, Seq("l_partkey"))
        .filter(col("unit_c") === col("min_c"))
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "SMALL")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("s_name"), col("unit_c"))
    },
    Some("""
      WITH pl AS (
        SELECT l_partkey, l_suppkey,
               CAST(min(round(l_extendedprice * 100 / l_quantity)) AS BIGINT) AS unit_c
        FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2)
      SELECT p.p_partkey, s.s_name, pl.unit_c
      FROM part p
      JOIN pl ON pl.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = pl.l_suppkey
      WHERE p.p_type = 'SMALL'
        AND pl.unit_c = (SELECT min(unit_c) FROM pl x
                         WHERE x.l_partkey = p.p_partkey)
    """.trim))

  /** TPC-H Q12 shape (priority mix per line status): the fact-to-fact
    * join with CONDITIONAL aggregation — two complementary CASE-WHEN
    * sums in one pass (never two filtered scans), grouped by a
    * low-cardinality dimension. The 1996 ship-date filter pushes to
    * the lineitem scan; only (l_orderkey, l_linestatus) survive the
    * scan projection; the orders side carries (o_orderkey,
    * o_orderpriority). Both counts are exact longs.
    */
  val q231 = GraftQuery(
    "q231_linestatus_priority_mix",
    (s, d) => {
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
    },
    Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    """.trim))

  /** TPC-H Q9 shape (product profit by nation and year): lineitem
    * restricted to a part-name LIKE filter (pushed into the broadcast
    * part dim's scan as StringContains), routed supplier -> nation,
    * grouped by (nation, ship year). Q9's distinctive plan features
    * on this schema: a LIKE-filtered dim driving the fact join, two
    * more broadcast dims stacked on the same fact scan, and a
    * two-column composite group key where one key is COMPUTED
    * (year extraction) — all in one pass, exact micro-unit revenue.
    */
  val q232 = GraftQuery(
    "q232_profit_by_nation_year",
    (s, d) => Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_name").like("%blue%")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .as("revenue_u")),
    Some("""
      SELECT n_name, year(l_shipdate) AS o_year,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%blue%'
      GROUP BY 1, 2
    """.trim))

  /** TPC-H Q3 shape (shipping priority): unshipped revenue of one
    * market segment — orders placed BEFORE the cutoff whose lineitems
    * ship AFTER it, top-10 order groups by revenue. The last absent
    * member of the canonical decorrelation family (q224-q232). Plan
    * shape at 100 TB: both date filters push into the parquet scans
    * (each side reads its own slice), the segment-filtered customer
    * list broadcasts into orders, the only shuffle joins lineitem to
    * the surviving orders on l_orderkey, and the top-10 is a
    * TakeOrderedAndProject streaming heap (asserted in
    * PlanAssertionsSpec), never a global sort. Revenue in exact
    * integer micro-units; the cut is fully deterministic —
    * (revenue DESC, o_orderdate ASC, l_orderkey ASC) and l_orderkey
    * is unique per group.
    */
  val q238 = GraftQuery(
    "q238_shipping_priority_top10",
    (s, d) => {
      val cut = lit("1997-06-01").cast("timestamp")
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
      val oc = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      l.join(oc, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev_u")).as("revenue_u"))
        .orderBy(col("revenue_u").desc, col("o_orderdate").asc,
          col("l_orderkey").asc)
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01'
        AND l_shipdate > TIMESTAMP '1997-06-01'
      GROUP BY 1, 2, 3
      ORDER BY revenue_u DESC, o_orderdate ASC, l_orderkey ASC
      LIMIT 10
    """.trim))

  /** TPC-H Q13 shape (customer order distribution): how many
    * customers placed 0, 1, 2, ... qualifying orders — the
    * outer-join-preserving double aggregation. The zero bucket is the
    * whole point: the order filter (priority not '4-NOT SPECIFIED',
    * standing in for Q13's comment pattern) lives in the JOIN
    * CONDITION, not a WHERE — pushed to a WHERE it would delete the
    * zero-order customers the query exists to count. Plan shape at
    * 100 TB: orders shuffles once on o_custkey (count(o_orderkey)
    * skips outer-join nulls for free), the second aggregate is over
    * at-most-|distinct counts| rows, and nothing ever sorts.
    */
  val q239 = GraftQuery(
    "q239_customer_order_distribution",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
            o("o_orderpriority") =!= "4-NOT SPECIFIED",
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""
      WITH co AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey
         AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey)
      SELECT CAST(c_count AS BIGINT) AS c_count,
             CAST(count(*) AS BIGINT) AS custdist
      FROM co GROUP BY c_count
    """.trim))

  /** TPC-H Q15 shape (top supplier): the supplier(s) whose revenue
    * over one ship quarter EQUALS the maximum such revenue — the
    * aggregate-view-consumed-twice pattern (Q15's CREATE VIEW).
    * Decorrelated form: the per-supplier revenue aggregate is ONE
    * lineage feeding both the one-row max scalar and the equality
    * filter; AQE materializes the partial-agg exchange once
    * (ReusedExchange, plan-asserted — the q228 discipline), so the
    * fact table is scanned once. Tie-preserving by construction:
    * every supplier at the exact integer max survives, which is why
    * revenue stays in micro-units end to end — a double would make
    * "equals the max" float-luck.
    */
  val q240 = GraftQuery(
    "q240_top_supplier_revenue",
    (s, d) => {
      // the explicit isNotNull matches the constraint the supplier
      // join pushes into the probe branch — without it the two
      // consumers' exchange subtrees differ by that one filter and
      // AQE cannot reuse the stage (= a second full fact scan)
      val rev = Tables.lineitem(s, d)
        .filter(col("l_suppkey").isNotNull &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long")))
          .as("total_revenue_u"))
      val mx = rev.agg(max(col("total_revenue_u")).as("max_revenue_u"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue_u") === col("max_revenue_u"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_u"))
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_u
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, total_revenue_u
      FROM supplier JOIN rev ON s_suppkey = l_suppkey
      WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM rev)
    """.trim))

  /** TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    * count per (brand, type, size) over qualifying parts, EXCLUDING a
    * blocked supplier list — the NOT IN → LeftAnti pattern. Reshaped
    * to this schema: the part-supplier association is the distinct
    * (l_partkey, l_suppkey) pairs from lineitem (no partsupp table),
    * and the blocked list is suppliers with a negative account
    * balance (no s_comment). Plan shape at 100 TB: the pair distinct
    * is a hash aggregate on exactly the two join columns (never an
    * Expand — the distinct happens BEFORE the count, q98a's rule),
    * the blocked list and the part dim both broadcast, and one
    * shuffle groups the three-column key.
    */
  val q241 = GraftQuery(
    "q241_supplier_count_by_part",
    (s, d) => {
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val blocked = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").startsWith("MEDIUM") &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      ps.join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM ps
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#45'
        AND p_type NOT LIKE 'MEDIUM%'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
    """.trim))

  /** TPC-H Q17 shape (small-quantity-order revenue): revenue from
    * lineitems of one brand whose quantity is below 20% of that
    * part's average quantity — the correlated-scalar-AVG pattern.
    * Decorrelated form: a PARTITIONED window carries the per-part
    * (sum, count) to every row in the same pass — one fact scan, one
    * shuffle on l_partkey, no self-join (a join-back form scans the
    * fact twice: column pruning gives the two branches different
    * projections, so their exchanges can never be shared). The
    * window partition is rows-per-part — bounded by order volume per
    * part (~30 in TPC-H at every SF), never corpus-proportional, so
    * the plan survives 100×. The 20%-of-average test is exact
    * integer cross-multiplication — qty*5*cnt < sum(qty) — never a
    * double ratio; quantities in centi-units (integral in the data,
    * exact after round). The yearly figure is the exact total
    * centi-unit sum (the /7.0 presentation divide belongs to the
    * report, not the engine).
    */
  val q242 = GraftQuery(
    "q242_small_quantity_revenue",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bp = broadcast(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey")))
      val w = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, d)
        .join(bp, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        .withColumn("sum_qty_c", sum(col("qty_c")).over(w))
        .withColumn("n_lines", count(lit(1)).over(w))
        .filter(col("qty_c") * 5 * col("n_lines") < col("sum_qty_c"))
        .agg(count(lit(1)).as("n_small"),
          sum(col("price_c")).as("revenue_c"))
    },
    Some("""
      WITH li AS (
        SELECT l_partkey,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'),
      wi AS (
        SELECT qty_c, price_c,
               sum(qty_c) OVER (PARTITION BY l_partkey) AS sum_qty_c,
               count(*) OVER (PARTITION BY l_partkey) AS n_lines
        FROM li)
      SELECT CAST(count(*) AS BIGINT) AS n_small,
             CAST(sum(price_c) AS BIGINT) AS revenue_c
      FROM wi
      WHERE qty_c * 5 * n_lines < sum_qty_c
    """.trim))

  def all: Seq[GraftQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q17, q18,
      q19, q109, q111, q119, q123, q144, q175, q176, q188, q203, q206, q207,
      q208, q209, q210, q211, q212, q215, q224, q225, q226, q227, q228, q229,
      q231, q232, q238, q239, q240, q241, q242)
}
