package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew

/** Driver-checkable scale-ops queries: the skew-mitigation operators
  * are deterministic, so they get real oracles instead of spec-only
  * coverage.
  */
object ScaleQueries extends QueryRegistry {

  /** Two-phase salted distinct count per event_type — the static
    * skew fallback for hot group keys. Salting is internal (the salt
    * column never escapes), so the result must equal the plain
    * COUNT(DISTINCT): the oracle proves the two-stage rewrite is
    * semantics-preserving; ScaleOpsSpec asserts the plan really
    * aggregates on (key, __salt) first.
    */
  val q44 = GraftQuery(
    "q44_salted_distinct_count",
    (s, d) => Skew.saltedDistinctCount(
      Tables.events(s, d), "event_type", "user_id", saltFactor = 8),
    Some("""
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
      FROM events
      GROUP BY event_type
    """.trim))

  /** HLL++ cardinality sketch under a declared error bound. The
    * sketch value itself can't hash-match a different engine's HLL,
    * but HLL++ is order-insensitive (register maxima), so the
    * WITHIN-TOLERANCE verdict is deterministic: Spark emits
    * |approx - exact| / exact within 3x the sketch's rsd per group
    * (the default rsd=0.05 sketch really does exceed 1x rsd on this
    * data); the oracle, computing the exact count, asserts the same
    * bound trivially holds — a drifting sketch implementation turns
    * the flag false and fails the driver hash.
    */
  val q46 = GraftQuery(
    "q46_hll_cardinality_tolerance",
    (s, d) => graft.operators.Sketches
      .cardinalityProfile(Tables.events(s, d), "event_type", "user_id")
      .join(Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct")), Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("exact_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct")) <=
          col("exact_distinct") * 0.15).as("within_15pct"),
        (abs(col("approx_distinct_1pct") - col("exact_distinct")) <=
          col("exact_distinct") * 0.03).as("tight_within_3pct")),
    Some("""
      SELECT event_type, count(*) AS n_rows,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
             true AS within_15pct,
             true AS tight_within_3pct
      FROM events
      GROUP BY event_type
    """.trim))

  /** Deterministic stratified sampling — the reproducible "mix
    * recipe" primitive: keep 25% of en docs, 75% of everything else,
    * keyed on a content hash of doc_id so the identical sample comes
    * out of any engine, run, or partition layout. Pure filter (no
    * shuffle); the oracle replays the same md5-bucket threshold.
    */
  val q48 = GraftQuery(
    "q48_stratified_sample",
    (s, d) => graft.operators.Sampling.stratifiedSample(
      Tables.documents(s, d), "doc_id", "lang",
      rates = Map("en" -> 0.25), defaultRate = 0.75)
      .select(col("doc_id"), col("lang")),
    Some("""
      SELECT doc_id, lang FROM documents
      WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 <
            CASE WHEN lang = 'en' THEN 2500 ELSE 7500 END
    """.trim))

  /** Deterministic training shards: every doc hash-assigned to one of
    * 8 shards (md5 of doc_id — reproducible in any engine, any run,
    * any partition layout), profiled as a per-shard row/char
    * inventory. The oracle replays the same md5 bucket arithmetic, so
    * the driver verifies shard MEMBERSHIP, not just balance.
    */
  val q112 = GraftQuery(
    "q112_shard_assignment",
    (s, d) => graft.operators.Sampling.shardStats(
      graft.operators.Sampling.assignShards(
        Tables.documents(s, d), "doc_id", nShards = 8), "n_chars"),
    Some("""
      SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_tokens
      FROM documents GROUP BY shard
    """.trim))

  /** CDC apply: the event stream read as a changelog (event_id % 10
    * = 8 is a tombstone, everything else upserts item state) collapsed
    * to the current snapshot in ONE map-side-combinable hash
    * aggregate — max(struct(version, op, payload)) per key, deletes
    * dropped after winning. No window, no per-key sort: a key updated
    * a billion times reaches the reducer as one row per map task.
    */
  val q173 = GraftQuery(
    "q173_cdc_latest_state",
    (s, d) => {
      val cdc = Tables.events(s, d).select(
        col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"),
        when(col("event_id") % 10 === 8, "D").otherwise("U").as("op"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      graft.operators.Cdc.latestState(cdc, Seq("user_id"),
        Seq("ts_us", "event_id"), "op", Seq("item"))
    },
    Some("""
      WITH c AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                        CASE WHEN event_id % 10 = 8 THEN 'D' ELSE 'U' END AS op,
                        CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
                 FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM c)
      SELECT user_id, ts_us, event_id, item FROM r WHERE rn = 1 AND op <> 'D'
    """.trim))

  /** Epoch-shuffle manifest: two independent deterministic
    * permutations of the corpus (sort key md5(epoch:id), position =
    * windowless global rank) — the reproducible "shuffle each epoch"
    * dataloader contract; the corpus itself is never rewritten.
    */
  val q169 = GraftQuery(
    "q169_epoch_shuffle",
    (s, d) => graft.operators.Sampling.epochShuffle(
      Tables.documents(s, d), "doc_id", epochs = 2),
    Some("""
      WITH k AS (
        SELECT CAST(e AS INT) AS epoch, doc_id,
               md5(CAST(e AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents CROSS JOIN (SELECT unnest(range(0, 2)) AS e))
      SELECT epoch, doc_id AS id,
             row_number() OVER (PARTITION BY epoch ORDER BY skey, doc_id) - 1 AS pos
      FROM k
    """.trim))

  /** Temperature-weighted mix (p_s ∝ sqrt(n_s), the multilingual
    * training mix rule at alpha = 0.5): per-source keep rates target
    * 150 · p_s docs, so small sources are upweighted and large ones
    * damped. Rates are exact integer arithmetic over
    * floor(sqrt(n)·1000) weights (sqrt is IEEE correctly-rounded —
    * identical in every engine; integral div avoids any double
    * rounding at bucket boundaries), so the oracle replays membership
    * row-for-row, not just sizes. Corpus never shuffles: one count
    * aggregate, broadcast rate table, pure filter.
    */
  val q114 = GraftQuery(
    "q114_temperature_mix",
    (s, d) => graft.operators.Sampling.temperatureMix(
      Tables.documents(s, d), "doc_id", "source", targetTotal = 150L),
    Some("""
      WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      w AS (SELECT source, n,
                   CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS wt
            FROM c),
      tot AS (SELECT CAST(sum(wt) AS BIGINT) AS w_sum FROM w),
      r AS (SELECT source,
                   CAST(least(10000, (CAST(150 AS HUGEINT) * wt * 10000) // (CAST(w_sum AS HUGEINT) * n)) AS BIGINT) AS rate_bp
            FROM w CROSS JOIN tot)
      SELECT d.doc_id, d.source, r.rate_bp
      FROM documents d JOIN r USING (source)
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 < r.rate_bp
    """.trim))

  /** Compaction invariance: fragment a copy of the documents table
    * into 32 small files, compact it, and prove the compacted table
    * still holds exactly the original content — the rollup (count,
    * byte sum, id sum per lang) is compared against DuckDB reading
    * the ORIGINAL parquet, so a lost or duplicated row during the
    * rewrite breaks the hash.
    */
  val q50 = GraftQuery(
    "q50_compaction_invariance",
    (s, d) => {
      val t = "/tmp/graft_q50_table"
      Tables.documents(s, d).repartition(32).write.mode("overwrite").parquet(t)
      graft.operators.Compaction.compact(s, t, targetBytes = 512L * 1024 * 1024)
      s.read.parquet(t).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"))
    },
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS sum_chars,
             CAST(sum(doc_id) AS BIGINT) AS sum_ids
      FROM documents
      GROUP BY lang
    """.trim))

  /** Range-sorted layout invariance + range query: events rewritten
    * range-sorted by ts (disjoint per-file time ranges, sorted rows
    * -> tight parquet row-group min/max stats), then a first-week
    * rollup read THROUGH the new layout, verified against DuckDB on
    * the original table. Correctness proves the rewrite lost nothing;
    * LayoutSpec proves the pushed range predicate actually skips
    * row groups on this layout (and can't on a round-robin one).
    */
  val q66 = GraftQuery(
    "q66_range_layout_rollup",
    (s, d) => {
      val path = "/tmp/graft_q66_layout_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.operators.Layout.rangeSortedWrite(Tables.events(s, d), "ts", 16, path)
      // 2024-01-08T00:00:00Z in nanos (events.ts reads as nanos long)
      s.read.parquet(path)
        .filter(col("ts") < lit(1704672000000000000L))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
    },
    Some("""
      SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM events
      WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      GROUP BY event_type
    """.trim))

  /** Snapshot diff between two order-book versions: later cutoff adds
    * rows, earlier window start removes rows, and a deterministic
    * price restatement on urgent orders changes rows in the overlap.
    */
  val q87 = GraftQuery(
    "q87_snapshot_diff",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val oldSnap = orders
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val newSnap = orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderpriority") === "1-URGENT",
            round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      graft.operators.Diff.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
    },
    Some("""
      WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                 WHERE o_orderdate < TIMESTAMP '1999-01-01'),
      n AS (SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN round(o_totalprice * 1.1, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      SELECT * FROM (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus <> n.o_orderstatus
                         OR o.o_totalprice <> n.o_totalprice THEN 'changed'
               END AS change
        FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
      WHERE change IS NOT NULL
    """.trim))

  /** Declarative expectations suite over lineitem: scalar rules fold
    * into ONE aggregation pass; uniqueness is a two-phase key count;
    * the foreign-key rule is a single anti-join. One rule is
    * deliberately failing so the violation path is exercised.
    */
  val q88 = GraftQuery(
    "q88_expectations",
    (s, d) => {
      import graft.operators.Expectations._
      validate(Tables.lineitem(s, d), Seq(
        NotNull("l_orderkey"),
        Check("qty_positive", col("l_quantity") > 0),
        Check("price_under_1000", col("l_extendedprice") < 1000),
        Unique(Seq("l_orderkey", "l_linenumber")),
        InReference("l_orderkey", Tables.orders(s, d), "o_orderkey")))
    },
    Some("""
      SELECT 'not_null:l_orderkey' AS rule,
             CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS n_violations,
             count(*) FILTER (WHERE l_orderkey IS NULL) = 0 AS passed
      FROM lineitem
      UNION ALL
      SELECT 'qty_positive',
             CAST(count(*) FILTER (WHERE NOT coalesce(l_quantity > 0, FALSE)) AS BIGINT),
             count(*) FILTER (WHERE NOT coalesce(l_quantity > 0, FALSE)) = 0
      FROM lineitem
      UNION ALL
      SELECT 'price_under_1000',
             CAST(count(*) FILTER (WHERE NOT coalesce(l_extendedprice < 1000, FALSE)) AS BIGINT),
             count(*) FILTER (WHERE NOT coalesce(l_extendedprice < 1000, FALSE)) = 0
      FROM lineitem
      UNION ALL
      SELECT 'unique:l_orderkey,l_linenumber',
             CAST(coalesce(sum(c), 0) AS BIGINT),
             coalesce(sum(c), 0) = 0
      FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
      UNION ALL
      SELECT 'in_reference:l_orderkey',
             CAST(count(*) AS BIGINT), count(*) = 0
      FROM lineitem l
      WHERE l.l_orderkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """.trim))

  /** Z-order locality profile: Morton-interleave (user_id, item k)
    * and report per-bucket extents on BOTH dimensions — the bounded
    * extents that make a z-sorted layout skippable on either column.
    */
  val q97 = GraftQuery(
    "q97_zorder_locality",
    (s, d) => graft.operators.ZOrder.zLocality(
      Tables.events(s, d).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item")),
      "user_id", "item", bits = 16, bucketShift = 8),
    Some {
      val z = graft.operators.ZOrder.mortonSql("user_id", "item", 16)
      s"""
      WITH e AS (SELECT user_id,
                        CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
                 FROM events),
      zc AS (SELECT user_id AS x, item AS y, ($z) AS z FROM e)
      SELECT z >> 8 AS zbucket, CAST(count(*) AS BIGINT) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM zc GROUP BY zbucket
      """.trim
    })

  /** The 100 TB twin of q98: `TableStats.approxNumericStats` profiles
    * the same columns with HLL++ distinct counts — one plain two-phase
    * hash aggregate, no Expand — then joins q98's exact counts to
    * certify the sketch under a 15% tolerance (the q46 pattern: the
    * oracle computes the exact side and asserts the bound trivially; a
    * drifting sketch flips the flag and fails the hash).
    */
  val q98a = GraftQuery(
    "q98_table_stats_approx",
    (s, d) => {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      val li = Tables.lineitem(s, d)
      graft.operators.TableStats.approxNumericStats(li, cols)
        .join(graft.operators.TableStats.numericStats(li, cols)
          .select(col("column"), col("n_distinct").as("exact_distinct")),
          Seq("column"))
        .select(col("column"), col("n_nulls"), col("exact_distinct"),
          col("min_v"), col("max_v"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.15).as("within_15pct"))
    },
    Some {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS column,
           |CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_nulls,
           |CAST(count(DISTINCT $c) AS BIGINT) AS exact_distinct,
           |round(CAST(min($c) AS DOUBLE), 2) AS min_v,
           |round(CAST(max($c) AS DOUBLE), 2) AS max_v,
           |true AS within_15pct
           |FROM lineitem""".stripMargin.replace("\n", " ")
      }.mkString("\nUNION ALL\n")
    })

  /** One-pass ANALYZE over lineitem's numeric columns: null counts,
    * exact distinct counts, and extents from a single scan.
    */
  val q98 = GraftQuery(
    "q98_table_stats",
    (s, d) => graft.operators.TableStats.numericStats(
      Tables.lineitem(s, d),
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    Some {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS column,
           |CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_nulls,
           |CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |round(CAST(min($c) AS DOUBLE), 2) AS min_v,
           |round(CAST(max($c) AS DOUBLE), 2) AS max_v
           |FROM lineitem""".stripMargin.replace("\n", " ")
      }.mkString("\nUNION ALL\n")
    })

  /** Incremental view maintenance: per-type aggregate state built on
    * the first 19 days absorbs the remaining days as a delta merge —
    * the oracle recomputes from scratch, certifying that the
    * partial-aggregation algebra reproduces the one-pass answer.
    */
  val q100 = GraftQuery(
    "q100_incremental_agg",
    (s, d) => {
      import graft.operators.IncrementalAgg
      val ev = Tables.events(s, d)
      // ts is long NANOS (Tables.load nanosAsLong) — compare in nanos
      val cutoff = 1705708800000000000L // 2024-01-20T00:00Z
      val stored = IncrementalAgg.state(
        ev.filter(col("ts") < cutoff), "event_type", "value")
      val delta = IncrementalAgg.state(
        ev.filter(col("ts") >= cutoff), "event_type", "value")
      IncrementalAgg.merge(stored, delta, "event_type")
        .select(col("event_type"), col("n"),
          round(col("sum_v"), 2).as("sum_v"),
          round(col("min_v"), 2).as("min_v"),
          round(col("max_v"), 2).as("max_v"))
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS sum_v,
             round(min(value), 2) AS min_v,
             round(max(value), 2) AS max_v
      FROM events GROUP BY event_type
    """.trim))

  /** q100's delete-path certification: a delete batch (every 100th
    * pre-cutoff event) hits the stored state, triggering the
    * documented per-key recompute from surviving rows
    * (`IncrementalAgg.applyDeletes`); the post-cutoff insert delta
    * then merges additively as in q100. The oracle recomputes from
    * scratch over the corpus minus the deleted rows — certifying that
    * the scoped recompute + additive algebra reproduces the one-pass
    * answer after deletes.
    */
  val q104 = GraftQuery(
    "q104_incremental_agg_delete",
    (s, d) => {
      import graft.operators.IncrementalAgg
      val ev = Tables.events(s, d)
      // ts is long NANOS in Spark (Tables.load nanosAsLong); the
      // oracle matches with DuckDB's epoch_ns integer compare
      val isOld = col("ts") < 1705708800000000000L // 2024-01-20T00:00Z
      val isDeleted = col("event_id") % 100 === 0
      val stored = IncrementalAgg.state(ev.filter(isOld), "event_type", "value")
      val afterDelete = IncrementalAgg.applyDeletes(
        stored,
        ev.filter(isOld && !isDeleted),
        ev.filter(isOld && isDeleted),
        "event_type", "value")
      val delta = IncrementalAgg.state(ev.filter(!isOld), "event_type", "value")
      IncrementalAgg.merge(afterDelete, delta, "event_type")
        .select(col("event_type"), col("n"),
          round(col("sum_v"), 2).as("sum_v"),
          round(col("min_v"), 2).as("min_v"),
          round(col("max_v"), 2).as("max_v"))
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS sum_v,
             round(min(value), 2) AS min_v,
             round(max(value), 2) AS max_v
      FROM events
      WHERE NOT (event_id % 100 = 0 AND epoch_ns(ts) < 1705708800000000000)
      GROUP BY event_type
    """.trim))

  /** Full pairwise correlation matrix of lineitem's numeric columns
    * from ONE aggregation pass (10 corr aggregates share the scan).
    */
  val q102 = GraftQuery(
    "q102_correlation_matrix",
    (s, d) => graft.operators.TableStats.correlationMatrix(
      Tables.lineitem(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_orderkey")),
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_orderkey")
      (for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield
        s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
           |floor(corr(${cols(i)}, ${cols(j)}) * 10000) / 10000 AS corr4
           |FROM lineitem""".stripMargin.replace("\n", " "))
        .mkString("\nUNION ALL\n")
    })

  /** Incremental maintenance of a JOIN view (q100's algebra extended
    * to joins): the stored orders⋈customer view absorbs an orders
    * delta AND a customer delta via the three delta terms
    * ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — stored view rows are never recomputed,
    * and every delta term broadcasts its batch side (the 100 TB
    * sides never shuffle). Deterministic key-modulo splits stand in
    * for arrival batches; the oracle recomputes the full join from
    * scratch, certifying the delta algebra reproduces it. Totals in
    * exact integer cents.
    */
  val q124 = GraftQuery(
    "q124_incremental_join_view",
    (s, d) => {
      import graft.operators.IncrementalJoin
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_c"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      val aOld = orders.filter(col("o_orderkey") % 7 =!= 0)
      val dA = orders.filter(col("o_orderkey") % 7 === 0)
      val bOld = cust.filter(col("c_custkey") % 5 =!= 0)
      val dB = cust.filter(col("c_custkey") % 5 === 0)
      val stored = aOld.join(bOld, aOld("o_custkey") === bOld("c_custkey"))
      IncrementalJoin.maintainJoinView(stored, aOld, dA, bOld, dB,
          (l, r) => l("o_custkey") === r("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("total_c"))
    },
    Some("""
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    """.trim))

  /** Bucketed co-located join, declared end-to-end: both sides are
    * written bucketed+sorted on the join key (the shuffle paid ONCE
    * at write time), then the repeated fact⋈fact join plans with no
    * shuffle exchange on either input — the amortization move for
    * the joins a 100 TB deployment re-runs every day. The only
    * exchange in the whole declared plan is the final tiny
    * partial-agg rollup (asserted in PlanAssertionsSpec). Revenue in
    * exact integer units; the oracle runs the plain join — bucketing
    * is physically transparent.
    */
  val q125 = GraftQuery(
    "q125_bucketed_colocated_join",
    (s, d) => {
      import graft.operators.Bucketing
      val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        round(col("l_discount") * 100).cast("long").as("disc_c"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Bucketing.writeBucketed(li, s"graft_li_bkt$tag", 8, Seq("l_orderkey"))
      Bucketing.writeBucketed(o, s"graft_o_bkt$tag", 8, Seq("o_orderkey"))
      s.table(s"graft_li_bkt$tag")
        .join(s.table(s"graft_o_bkt$tag"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price_c") * (lit(100L) - col("disc_c"))).as("revenue_u"))
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """.trim))

  /** Statically salted shuffle join, declared end-to-end: each hot
    * key of the large side spreads over 8 deterministic sub-keys
    * (row-hash salt — replay/retry stable, never rand()) and the
    * small side replicates once per sub-key, so one pathological key
    * lands on 8 reducers instead of melting one. AQE's skew split
    * handles the common case at runtime; this is the static fallback
    * for the known-degenerate keys (stop-shingles, the one hot
    * instrument). Semantically invisible: the oracle runs the plain
    * join.
    */
  val q126 = GraftQuery(
    "q126_salted_skew_join",
    (s, d) => {
      val large = Tables.lineitem(s, d).select(col("l_orderkey").as("k"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val small = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(large, small, "k", 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("price_c_sum"))
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c_sum
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """.trim))

  /** q97's Hilbert twin: locality profile of the Hilbert-curve
    * layout over the same (user_id, item) plane. The curve index is
    * a native codegen'd expression (one tight bit-plane loop per
    * row, no UDF); the oracle replays the identical
    * rotate-and-accumulate walk as a recursive CTE — per-row, 16
    * iterations, integer-exact. (DuckDB's list_reduce over struct
    * accumulators mis-vectorizes in v1.0.0 — probed while building
    * this oracle — so the recursive form is the trustworthy replay.)
    */
  val q127 = GraftQuery(
    "q127_hilbert_locality",
    (s, d) => graft.operators.ZOrder.hilbertLocality(
      Tables.events(s, d).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item")),
      "user_id", "item", bits = 16, bucketShift = 8),
    Some("""
      WITH RECURSIVE e AS (
        SELECT user_id AS x0,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS y0
        FROM events),
      h AS (
        SELECT x0, y0, CAST(x0 AS BIGINT) AS x, CAST(y0 AS BIGINT) AS y,
               CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
        FROM e
        UNION ALL
        SELECT x0, y0,
          CASE WHEN ((y & s) = 0) AND ((x & s) <> 0) THEN s - 1 - y
               WHEN ((y & s) = 0) THEN y ELSE x END,
          CASE WHEN ((y & s) = 0) AND ((x & s) <> 0) THEN s - 1 - x
               WHEN ((y & s) = 0) THEN x ELSE y END,
          d + s * s * xor(CASE WHEN (x & s) <> 0 THEN 3 ELSE 0 END,
                          CASE WHEN (y & s) <> 0 THEN 1 ELSE 0 END),
          s // 2
        FROM h WHERE s >= 1)
      SELECT d >> 8 AS hbucket, CAST(count(*) AS BIGINT) AS n_rows,
             min(x0) AS min_x, max(x0) AS max_x,
             min(y0) AS min_y, max(y0) AS max_y
      FROM h WHERE s = 0
      GROUP BY hbucket
    """.trim))

  /** Join-key skew diagnosis, declared: per-key share of the events
    * table in exact integer basis points, heavy keys only — the
    * pre-flight check that picks between plain, salted (q126), and
    * hot-subset-broadcast plans. Oracle replays the count + scalar
    * total + integral division.
    */
  val q131 = GraftQuery(
    "q131_key_skew_profile",
    (s, d) => Skew.keySkewProfile(
      Tables.events(s, d), "event_type", minShareBp = 500L),
    Some("""
      WITH c AS (SELECT event_type, count(*) AS n_rows FROM events GROUP BY event_type),
      t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c)
      SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows, total,
             CAST(n_rows * 10000 // total AS BIGINT) AS share_bp
      FROM c CROSS JOIN t
      WHERE n_rows * 10000 // total >= 500
    """.trim))

  /** Manifest-style file skipping: range-sorted layout (q66) + an
    * explicit zone-map catalog (FileSkipping.fileStats), then a
    * two-day range rollup read through the PRUNED file list — files
    * whose [min, max] misses the range are never opened, the
    * manifest shape every table format (Delta/Iceberg) builds on.
    * The exact row predicate still applies after pruning (zone maps
    * are conservative), so the oracle is the plain filtered rollup
    * over the original table; FileSkippingSpec proves files are
    * actually skipped on a handcrafted layout.
    */
  val q136 = GraftQuery(
    "q136_file_skipping_rollup",
    (s, d) => {
      import graft.operators.FileSkipping
      val path = "/tmp/graft_q136_layout_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.operators.Layout.rangeSortedWrite(Tables.events(s, d), "ts", 16, path)
      val stats = FileSkipping.fileStats(s, path, "ts")
      // [2024-01-03, 2024-01-05) in nanos (events.ts reads as nanos long)
      val lo = lit(1704240000000000000L)
      val hi = lit(1704412800000000000L)
      FileSkipping.prunedRead(s, path, stats, lo, hi - 1)
        .filter(col("ts") >= lo && col("ts") < hi)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        AND ts < TIMESTAMP '2024-01-05 00:00:00'
      GROUP BY event_type
    """.trim))

  /** Mergeable-sketch rollup (DataSketches HLL): per-(type, day)
    * sketches unioned into per-type estimates — the re-aggregation
    * path that never re-scans raw data. The q46 tolerance pattern:
    * the oracle computes the exact side and trivially-true flags; a
    * drifting union or direct sketch flips a flag and fails the
    * hash. The union estimate must also track the direct one-pass
    * sketch (same family over the same values) within 5%.
    */
  val q141 = GraftQuery(
    "q141_hll_merge_rollup",
    (s, d) => graft.operators.Sketches.mergeableDistinctRollup(
      Tables.events(s, d), "event_type",
      expr("ts div 86400000000000"), "user_id")
      .join(Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct")),
        Seq("event_type"))
      .select(col("event_type"), col("n_buckets"), col("exact_distinct"),
        (abs(col("union_distinct") - col("exact_distinct")) <=
          col("exact_distinct") * 0.15).as("union_within_15pct"),
        (abs(col("direct_distinct") - col("exact_distinct")) <=
          col("exact_distinct") * 0.15).as("direct_within_15pct"),
        (abs(col("union_distinct") - col("direct_distinct")) <=
          col("direct_distinct") * 0.05).as("merge_consistent_5pct")),
    Some("""
      SELECT event_type,
             CAST(count(DISTINCT epoch_ns(ts) // 86400000000000) AS BIGINT) AS n_buckets,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
             true AS union_within_15pct,
             true AS direct_within_15pct,
             true AS merge_consistent_5pct
      FROM events
      GROUP BY event_type
    """.trim))

  /** Pre-flight join-output cardinality (q131's fan-out companion):
    * the EXACT row count the events-by-user self-join would produce,
    * from per-key counts alone — Σ_k n(k)² — plus the top
    * contributing keys. Two count aggregates and a distinct-key-sized
    * join; the check that catches a hidden many-to-many key before
    * the 100 TB join becomes a cross-product incident.
    */
  val q145 = GraftQuery(
    "q145_join_cardinality",
    (s, d) => Skew.joinCardinalityEstimate(
      Tables.events(s, d), Tables.events(s, d), "user_id", "user_id",
      topN = 10),
    Some("""
      WITH la AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
      t AS (SELECT CAST(sum(n * n) AS BIGINT) AS total_rows FROM la)
      SELECT key, CAST(n AS BIGINT) AS n_left, CAST(n AS BIGINT) AS n_right,
             CAST(n * n AS BIGINT) AS contrib, total_rows
      FROM la CROSS JOIN t
      ORDER BY contrib DESC, key ASC LIMIT 10
    """.trim))

  /** Merkle-bucket anti-entropy between two replicas of the orders
    * table — one with deterministic injected damage (keys % 991
    * deleted, prices of keys % 997 restated by one dollar). Healthy
    * buckets cost only the XOR-digest compare; the row-level
    * drill-down is semi-join pruned to damaged buckets. Digests are
    * md5-int60 over a concat_ws canonical string with exact-integer
    * cents, so both engines serialize identically.
    */
  val q146 = GraftQuery(
    "q146_replica_reconcile",
    (s, d) => {
      import graft.operators.AntiEntropy
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("pc"))
      val damaged = base.filter(col("o_orderkey") % 991 =!= 0)
        .withColumn("pc", when(col("o_orderkey") % 997 === 0,
          col("pc") + 100).otherwise(col("pc")))
      val dig = concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
        col("pc"))
      AntiEntropy.reconcile(base, damaged, "o_orderkey", dig, dig, 64)
    },
    Some("""
      WITH base AS (SELECT o_orderkey, o_orderstatus,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS pc
                    FROM orders),
      l AS (SELECT o_orderkey % 64 AS bucket, o_orderkey AS k,
                   CAST('0x' || substr(md5(concat_ws('|', o_orderkey, concat_ws('|', o_orderkey, o_orderstatus, pc))), 1, 15) AS BIGINT) AS dg
            FROM base),
      rb AS (SELECT o_orderkey, o_orderstatus,
                    CASE WHEN o_orderkey % 997 = 0 THEN pc + 100 ELSE pc END AS pc
             FROM base WHERE o_orderkey % 991 <> 0),
      r AS (SELECT o_orderkey % 64 AS bucket, o_orderkey AS k,
                   CAST('0x' || substr(md5(concat_ws('|', o_orderkey, concat_ws('|', o_orderkey, o_orderstatus, pc))), 1, 15) AS BIGINT) AS dg
            FROM rb),
      sl AS (SELECT bucket, count(*) AS nl, bit_xor(dg) AS xl FROM l GROUP BY bucket),
      sr AS (SELECT bucket, count(*) AS nr, bit_xor(dg) AS xr FROM r GROUP BY bucket),
      db AS (SELECT coalesce(sl.bucket, sr.bucket) AS bucket,
                    coalesce(nl, 0) AS n_left, coalesce(nr, 0) AS n_right
             FROM sl FULL OUTER JOIN sr ON sl.bucket = sr.bucket
             WHERE NOT coalesce(nl = nr AND xl = xr, false)),
      ol AS (SELECT bucket, count(*) AS n_only_left FROM l
             WHERE bucket IN (SELECT bucket FROM db)
               AND NOT EXISTS (SELECT 1 FROM r
                               WHERE r.bucket = l.bucket AND r.k = l.k AND r.dg = l.dg)
             GROUP BY bucket),
      orr AS (SELECT bucket, count(*) AS n_only_right FROM r
              WHERE bucket IN (SELECT bucket FROM db)
                AND NOT EXISTS (SELECT 1 FROM l
                                WHERE l.bucket = r.bucket AND l.k = r.k AND l.dg = r.dg)
              GROUP BY bucket)
      SELECT db.bucket, CAST(n_left AS BIGINT) AS n_left,
             CAST(n_right AS BIGINT) AS n_right,
             CAST(coalesce(ol.n_only_left, 0) AS BIGINT) AS n_only_left,
             CAST(coalesce(orr.n_only_right, 0) AS BIGINT) AS n_only_right
      FROM db LEFT JOIN ol ON ol.bucket = db.bucket
      LEFT JOIN orr ON orr.bucket = db.bucket
    """.trim))

  /** Bloom-catalog point lookup — q136's twin for the layout zone
    * maps cannot help: documents hash-distributed across 16 files, so
    * every file's [min, max] doc_id range overlaps every probe and
    * min/max pruning reads the whole table. The per-file Bloom
    * catalog prunes the batch lookup to the files whose lanes match;
    * the exact isin filter then removes Bloom false positives, so the
    * oracle is the plain key-set selection. FileSkippingSpec proves
    * candidate lists are strict subsets with zero false negatives.
    * The key batch is collected from the table only as fixture setup
    * — in production it is the caller's input (an index lookup
    * batch), bounded by construction.
    */
  val q151 = GraftQuery(
    "q151_bloom_file_skipping",
    (s, d) => {
      import graft.operators.FileSkipping
      val path = "/tmp/graft_q151_layout_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      Tables.documents(s, d).repartition(16, col("doc_id"))
        .write.mode("overwrite").parquet(path)
      val stats = FileSkipping.bloomFileStats(s, path, "doc_id")
      val keys = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
      FileSkipping.bloomPointRead(s, path, stats, "doc_id", keys)
        .select(col("doc_id"), col("source"), col("n_chars"))
    },
    Some("""
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 97 = 0
    """.trim))

  /** Stratified k-fold split audit: 5 folds from q112's pure md5
    * shard expression (reproducible across engines/runs/layouts),
    * checked for per-language balance — bias_e4 = n_fl·N·10^4 div
    * (N_f·N_l), the exact-integer ratio of observed to expected that
    * a fair split keeps near 10^4. The cross-validation harness in
    * one query: assignment + the evidence it is unbiased.
    */
  val q197 = GraftQuery(
    "q197_kfold_balance",
    (s, d) => {
      val folded = graft.operators.Sampling.assignShards(
        Tables.documents(s, d), "doc_id", nShards = 5)
        .withColumnRenamed("shard", "fold")
      val cell = folded.groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n_fl"))
      val perFold = cell.groupBy(col("fold")).agg(sum(col("n_fl")).as("n_f"))
      val perLang = cell.groupBy(col("lang")).agg(sum(col("n_fl")).as("n_l"))
      val total = cell.agg(sum(col("n_fl")).as("n"))
      cell.join(broadcast(perFold), "fold").join(broadcast(perLang), "lang")
        .crossJoin(broadcast(total))
        .select(col("fold"), col("lang"), col("n_fl"), col("n_f"), col("n_l"),
          expr("n_fl * n * 10000L div (n_f * n_l)").as("bias_e4"))
    },
    Some("""
      WITH folded AS (SELECT lang,
                             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS fold
                      FROM documents),
      cell AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_fl
               FROM folded GROUP BY 1, 2),
      pf AS (SELECT fold, CAST(sum(n_fl) AS BIGINT) AS n_f FROM cell GROUP BY 1),
      pl AS (SELECT lang, CAST(sum(n_fl) AS BIGINT) AS n_l FROM cell GROUP BY 1),
      t AS (SELECT CAST(sum(n_fl) AS BIGINT) AS n FROM cell)
      SELECT fold, lang, n_fl, n_f, n_l,
             CAST(n_fl * n * 10000 // (n_f * n_l) AS BIGINT) AS bias_e4
      FROM cell JOIN pf USING (fold) JOIN pl USING (lang) CROSS JOIN t
    """.trim))

  /** Consistent-hash ring rebalance audit: docs assigned to 8 then 9
    * nodes (16 md5 virtual nodes each, successor rule with wrap) and
    * the moved fraction measured — the property that makes consistent
    * hashing worth using (≈1/9 moves, vs ~8/9 for mod-N). Pure
    * per-row arithmetic against a broadcast 144-row vnode table; ties
    * on equal vnode hash break to the lowest node id explicitly, so
    * both engines agree without relying on struct-min semantics.
    */
  val q201 = GraftQuery(
    "q201_consistent_hash_rebalance",
    (s, d) => {
      val vn = s.range(0, 9).toDF("node_id")
        .select(col("node_id"), explode(expr("sequence(0, 15)")).as("vno"))
        .select(col("node_id"),
          conv(substring(md5(concat(lit("vn:"), col("node_id").cast("string"),
            lit(":"), col("vno").cast("string"))), 1, 8), 16, 10)
            .cast("long").as("vh"))
        .cache()
      val docs = Tables.documents(s, d).select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("dh"))
      def ring(n: Int): org.apache.spark.sql.DataFrame = {
        val rv = vn.filter(col("node_id") < n)
        val wrap = rv.agg(min(col("vh")).as("wvh"))
        val succ = docs.join(broadcast(rv), col("vh") >= col("dh"), "left")
          .groupBy(col("doc_id"), col("dh")).agg(min(col("vh")).as("svh"))
        val owned = succ.crossJoin(broadcast(wrap))
          .select(col("doc_id"), coalesce(col("svh"), col("wvh")).as("ovh"))
        owned.join(broadcast(rv), col("ovh") === col("vh"))
          .groupBy(col("doc_id")).agg(min(col("node_id")).as(s"node$n"))
      }
      ring(8).join(ring(9), "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("node8") =!= col("node9"), 1L).otherwise(0L))
            .as("n_moved"))
        .withColumn("moved_bp", expr("n_moved * 10000L div n_docs"))
    },
    Some("""
      WITH vn AS (SELECT n.i AS node_id,
                         CAST('0x' || substr(md5('vn:' || CAST(n.i AS VARCHAR) || ':' || CAST(v.i AS VARCHAR)), 1, 8) AS BIGINT) AS vh
                  FROM range(0, 9) n(i) CROSS JOIN range(0, 16) v(i)),
      docs AS (SELECT doc_id,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS dh
               FROM documents),
      s8 AS (SELECT d.doc_id, min(vh) AS ovh
             FROM docs d LEFT JOIN vn ON vn.node_id < 8 AND vn.vh >= d.dh
             GROUP BY 1),
      o8 AS (SELECT doc_id,
                    coalesce(ovh, (SELECT min(vh) FROM vn WHERE node_id < 8)) AS ovh
             FROM s8),
      n8 AS (SELECT doc_id, min(node_id) AS node8
             FROM o8 JOIN vn ON vn.vh = o8.ovh AND vn.node_id < 8 GROUP BY 1),
      s9 AS (SELECT d.doc_id, min(vh) AS ovh
             FROM docs d LEFT JOIN vn ON vn.vh >= d.dh
             GROUP BY 1),
      o9 AS (SELECT doc_id,
                    coalesce(ovh, (SELECT min(vh) FROM vn)) AS ovh
             FROM s9),
      n9 AS (SELECT doc_id, min(node_id) AS node9
             FROM o9 JOIN vn ON vn.vh = o9.ovh GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN node8 <> node9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             CAST(sum(CASE WHEN node8 <> node9 THEN 1 ELSE 0 END) * 10000
                  // count(*) AS BIGINT) AS moved_bp
      FROM n8 JOIN n9 USING (doc_id)
    """.trim))

  /** The stats-driven join planner's DECISION TABLE, declared on its
    * own: q131's skew profile joined with the small side's per-key
    * rows and reduced to a remedy per hot key (broadcast_hot when the
    * small side's hot rows fit a broadcast, salted otherwise). The
    * plan choice is data, auditable and driver-verified — not a
    * heuristic buried inside the join operator.
    */
  val q237a = GraftQuery(
    "q237a_join_plan_decisions",
    (s, d) => {
      val events = Tables.events(s, d)
      val dim = events.groupBy(col("event_type"))
        .agg(min(col("user_id")).as("first_user"))
      Skew.joinPlanDecisions(events, dim, "event_type",
        minShareBp = 2000L, broadcastRowLimit = 1000L)
    },
    Some("""
      WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
                 FROM events GROUP BY 1),
      t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c),
      dim AS (SELECT event_type, min(user_id) AS first_user
              FROM events GROUP BY 1),
      sc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_small
             FROM dim GROUP BY 1)
      SELECT c.event_type, c.n_rows,
             CAST(c.n_rows * 10000 // t.total AS BIGINT) AS share_bp,
             coalesce(sc.n_small, 0) AS n_small,
             CASE WHEN coalesce(sc.n_small, 0) <= 1000
                  THEN 'broadcast_hot' ELSE 'salted' END AS strategy
      FROM c CROSS JOIN t LEFT JOIN sc USING (event_type)
      WHERE c.n_rows * 10000 // t.total >= 2000
    """.trim))

  /** Stats-driven join, SALTED hot path: the planner composed
    * end-to-end — keys above 20% share take the salted plan
    * (broadcastRowLimit=0 forces the salt remedy), cold keys the
    * plain shuffle join, and the union is provably the plain join:
    * the oracle runs exactly that. PlanAssertionsSpec proves the hot
    * key's rows actually flow through the salt machinery.
    */
  val q237 = GraftQuery(
    "q237_stats_driven_join",
    (s, d) => {
      val events = Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("value_c"))
      val dim = Tables.events(s, d).groupBy(col("event_type"))
        .agg(min(col("user_id")).as("first_user"))
      Skew.statsDrivenJoin(events, dim, "event_type",
          minShareBp = 2000L, saltFactor = 8, broadcastRowLimit = 0L)
        .groupBy(col("event_type"), col("first_user"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value_c")).as("value_c_sum"))
    },
    statsJoinOracle)

  /** Stats-driven join, BROADCAST hot path: the same planner with a
    * broadcast budget (hot keys' single dim row each fits easily), so
    * the worst keys pay ZERO shuffle — and the result is still the
    * plain join, proven by the identical oracle as q237.
    */
  val q237b = GraftQuery(
    "q237b_stats_join_hot_broadcast",
    (s, d) => {
      val events = Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("value_c"))
      val dim = Tables.events(s, d).groupBy(col("event_type"))
        .agg(min(col("user_id")).as("first_user"))
      Skew.statsDrivenJoin(events, dim, "event_type",
          minShareBp = 2000L, saltFactor = 8, broadcastRowLimit = 1000L)
        .groupBy(col("event_type"), col("first_user"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value_c")).as("value_c_sum"))
    },
    statsJoinOracle)

  /** Stats-driven join, LEFT mode — fact-to-dim with missing dims,
    * where skew hurts most in practice. The dim side drops two event
    * types entirely, and every 10th user's fact row carries a NULL
    * key: unmatched hot keys must null-extend inside their branch
    * (here via an EMPTY broadcast — n_small = 0 fits any budget),
    * matched hot keys ride the salted left join, and the null-key
    * rows survive through the cold branch. The oracle is the plain
    * LEFT JOIN: one dropped null-key row, one double-delivered
    * unmatched row, or a hot row lost between branches breaks the
    * count or the hash.
    */
  val q270 = GraftQuery(
    "q270_stats_driven_left_join",
    (s, d) => {
      val events = Tables.events(s, d)
        .select(when(expr("user_id % 10 = 0"), lit(null).cast("string"))
            .otherwise(col("event_type")).as("event_type"),
          round(col("value") * 100).cast("long").as("value_c"))
      val dim = Tables.events(s, d)
        .filter(col("event_type").isin("click", "error", "purchase"))
        .groupBy(col("event_type"))
        .agg(min(col("user_id")).as("first_user"))
      Skew.statsDrivenJoin(events, dim, "event_type",
          minShareBp = 2000L, saltFactor = 8, broadcastRowLimit = 0L,
          joinType = "left")
        .groupBy(col("event_type"), col("first_user"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value_c")).as("value_c_sum"))
    },
    Some("""
      WITH facts AS (
        SELECT CASE WHEN user_id % 10 = 0 THEN NULL ELSE event_type END AS event_type,
               CAST(round(value * 100) AS BIGINT) AS value_c
        FROM events),
      dim AS (SELECT event_type, min(user_id) AS first_user
              FROM events WHERE event_type IN ('click', 'error', 'purchase')
              GROUP BY 1)
      SELECT f.event_type, d.first_user, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(value_c) AS BIGINT) AS value_c_sum
      FROM facts f LEFT JOIN dim d USING (event_type)
      GROUP BY 1, 2
    """.trim))

  private lazy val statsJoinOracle: Option[String] = Some("""
      WITH dim AS (SELECT event_type, min(user_id) AS first_user
                   FROM events GROUP BY 1)
      SELECT e.event_type, d.first_user, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c_sum
      FROM events e JOIN dim d USING (event_type)
      GROUP BY 1, 2
    """.trim)

  /** Token-budget source mix: per source, the greedy md5-ordered
    * document prefix within an 800-token budget — mixture control in
    * the unit a pretraining run actually budgets (tokens, not
    * documents). The per-source cumulative rides ONE global prefix
    * sum ordered by (source, md5key, id) with |sources|-row offsets
    * broadcast back — never a per-source window (20 sources at
    * 100 TB would put 5 TB in one window partition). The oracle
    * replays tokenization, md5 order, the per-source running sum,
    * and the prefix cut.
    */
  val q247 = GraftQuery(
    "q247_token_budget_mix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Sampling.tokenBudgetMix(docs, "doc_id", "source",
          size(graft.functions.TextFunctions.tokens(col("text"))),
          budgetPerSource = 800L)
        .select(col("id").as("doc_id"), col("source"),
          col("n_tokens"), col("cum_source"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS md5key
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source
                                   ORDER BY md5key, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_source
        FROM tok)
      SELECT doc_id, source, n_tokens, CAST(cum_source AS BIGINT) AS cum_source
      FROM c WHERE cum_source <= 800
    """.trim))

  /** q136's zone-map skipping with the caller-supplied bounds DELETED
    * — `FileSkipping.taggedRead` carries the catalog's per-file
    * min/max on the scan and the plain `.filter` prunes files at
    * optimize time through the same injected rule the versioned
    * table's `readAtAuto` rides (graft.plans.VersionedStatsPruning).
    * Plain parquet directories get Delta-style automatic data
    * skipping with no table format at all: catalog once, then every
    * query's where-clause is its own pruning hint. Same range and
    * rollup as q136, so the two forms must hash identically against
    * one oracle shape; FileSkippingSpec proves files are actually
    * skipped and that a second column's catalog composes.
    */
  val q287 = GraftQuery(
    "q287_file_skipping_auto",
    (s, d) => {
      import graft.operators.FileSkipping
      val path = "/tmp/graft_q287_layout_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.operators.Layout.rangeSortedWrite(Tables.events(s, d), "ts", 16, path)
      val stats = FileSkipping.fileStats(s, path, "ts")
      val lo = 1704240000000000000L  // 2024-01-03 in nanos
      val hi = 1704412800000000000L  // 2024-01-05 (exclusive)
      FileSkipping.taggedRead(s, path, "ts" -> stats)
        .filter(col("ts") >= lo && col("ts") < hi)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        AND ts < TIMESTAMP '2024-01-05 00:00:00'
      GROUP BY event_type
    """.trim))

  def all: Seq[GraftQuery] =
    Seq(q44, q46, q48, q50, q66, q87, q88, q97, q98, q98a, q100, q102, q104,
      q112, q114, q124, q125, q126, q127, q131, q136, q141, q145, q146, q151,
      q169, q173, q197, q201, q237a, q237, q237b, q247, q270, q287)
}
