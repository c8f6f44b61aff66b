package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** S4/S8 sources + the LSH bucketing scale path. */
object SourceQueries extends QueryRegistry {

  /** S4 + S8 (SURVEY §2.1): metadata-only object listing via the
    * binaryFile source — the object-store analog of list_objects_v2 —
    * followed by a per-object HEAD-style probe that reads ONLY the
    * parquet footer (`ParquetFileReader.getRecordCount`: file
    * metadata, zero data pages). Output is (file_name, n_rows), which
    * the static oracle recomputes from the immutable tables
    * themselves — no materialized listing, no shared mutable state
    * (the r10 design kept a fixed /tmp path that a concurrent
    * different-SF sweep could overwrite between this query's Spark
    * phase and its DuckDB check; this form is race-free by
    * construction). A missing, extra, or misnamed file in the listing
    * — or a footer count that disagrees with the table's true
    * cardinality — breaks the row count or hash.
    *
    * The listing is collected driver-side: it is bounded by the
    * TABLE count (one row per parquet file in the data dir), never by
    * data volume, so the hop stays ~10 rows at any corpus scale.
    */
  val q16 = GraftQuery(
    "q16_listing_scan",
    (s, d) => {
      import s.implicits._
      val listed = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(d)
        .select(col("path"),
          element_at(split(col("path"), "/"), -1).as("file_name"))
        .collect()
      val conf = s.sparkContext.hadoopConfiguration
      val rows = listed.toSeq.map { r =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(r.getString(0)), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val n = try reader.getRecordCount finally reader.close()
        (r.getString(1), n)
      }
      rows.toDF("file_name", "n_rows").orderBy(col("file_name"))
    },
    Some {
      Seq("customer", "documents", "embeddings", "events", "lineitem",
        "nation", "orders", "part", "region", "supplier")
        .map(t => s"SELECT '$t.parquet' AS file_name, CAST(count(*) AS BIGINT) AS n_rows FROM $t")
        .mkString("\nUNION ALL\n")
    })

  /** Deterministic random-hyperplane LSH bucket assignment — the
    * approximate scale path for cosine search (bucket-local search
    * replaces all-pairs). Hyperplane constants are pseudo-random but
    * fixed, mirrored literally into the oracle.
    */
  val q27 = GraftQuery(
    "q27_ann_lsh_buckets",
    (s, d) => {
      val emb = graft.Tables.embeddings(s, d)
      Similarity.lshBuckets(emb, "vec_id", "embedding", Hyperplanes)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vectors"), min(col("id")).as("min_vec_id"))
    },
    Some {
      val bitTerms = Hyperplanes.zipWithIndex.map { case (h, j) =>
        val arr = h.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
        s"""(CASE WHEN list_sum(list_transform(range(1, 65),
           |    i -> CAST(embedding[i] AS DOUBLE) * ($arr)[i])) >= 0
           |  THEN ${1L << j} ELSE 0 END)""".stripMargin
      }.mkString(" +\n             ")
      s"""
      WITH bucketed AS (
        SELECT vec_id,
             $bitTerms AS bucket
        FROM embeddings)
      SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
      FROM bucketed GROUP BY bucket
      """.trim
    })

  /** 4 fixed 64-dim hyperplanes; values in [-0.5, 0.5), derived from
    * a Knuth-style multiplicative sequence so both engines share the
    * exact literals.
    */
  lazy val Hyperplanes: Seq[Seq[Double]] =
    (0 until 4).map { j =>
      (0 until 64).map { k =>
        (((j * 64 + k + 1) * 2654435761L) % 2001).toDouble / 2000.0 - 0.5
      }
    }

  /** CSV sink + source round-trip: write lineitem's scalar columns as
    * headered CSV, read back with an explicit schema, aggregate. The
    * oracle aggregates the ORIGINAL parquet — the hash matches only
    * if the text round-trip is value-lossless (Java/DuckDB shortest
    * round-trip double formatting).
    */
  val q85 = GraftQuery(
    "q85_csv_roundtrip",
    (s, d) => {
      val path = "/tmp/graft_q85_csv_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("l_orderkey LONG, l_quantity DOUBLE, l_extendedprice DOUBLE, l_returnflag STRING")
        .csv(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    },
    // integer-cents sums, not round/floor of a double sum: the source
    // values are exact 2dp decimals, so per-row cents are exact and
    // the LONG sum is order-independent in both engines — a double
    // sum at 1e9 magnitude carries enough ulp noise to flip EITHER
    // round (at .005) or floor (at .00, where exact-2dp sums sit)
    Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  /** JSON-lines sink + source round-trip, same invariant as q85. */
  val q86 = GraftQuery(
    "q86_json_roundtrip",
    (s, d) => {
      val path = "/tmp/graft_q86_json_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
          col("l_returnflag"))
        .write.mode("overwrite").json(path)
      s.read
        .schema("l_orderkey LONG, l_quantity DOUBLE, l_discount DOUBLE, l_returnflag STRING")
        .json(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_discount") * 10000).cast("long")).as("sum_disc_bp"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    },
    // integer cents / basis points for order-independent sums — see q85
    Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  /** ORC sink + source round-trip (Spark's second built-in columnar
    * format — the cross-format interchange a lake migration needs),
    * same losslessness invariant as q85/q86: the oracle aggregates the
    * ORIGINAL parquet, so a value changed anywhere in the
    * parquet -> ORC -> read-back chain breaks the hash. DuckDB never
    * reads ORC — that's the point of proving invariance against the
    * source of truth.
    */
  val q115 = GraftQuery(
    "q115_orc_roundtrip",
    (s, d) => {
      val path = "/tmp/graft_q115_orc_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_linestatus"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    },
    // integer cents for order-independent sums — see q85
    Some("""
      SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY l_linestatus
    """.trim))

  /** Schema evolution across ingest batches: an early batch without a
    * column, a later batch that added it, one mergeSchema read over
    * both. The unified frame backfills NULL for pre-evolution rows —
    * the contract every long-lived ingest pipeline depends on (add a
    * column without rewriting history). Aggregation buckets the NULLs
    * explicitly ('pre_evolution'); the oracle replays the evolution
    * as a UNION of the two batch projections over the original table.
    */
  val q140 = GraftQuery(
    "q140_schema_evolution",
    (s, d) => {
      val path = "/tmp/graft_q140_evo_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val orders = graft.Tables.orders(s, d)
      // batch 1: before the o_orderpriority column existed
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$path/batch=1")
      // batch 2: schema evolved, the new column is populated
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$path/batch=2")
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(coalesce(col("o_orderpriority"), lit("pre_evolution"))
          .as("priority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"))
    },
    Some("""
      WITH unified AS (
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1)
      SELECT coalesce(o_orderpriority, 'pre_evolution') AS priority,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
      FROM unified
      GROUP BY priority
    """.trim))

  /** Time-travel read over the versioned table (AS OF version 1):
    * the table is committed in two versions — v1 = orders before the
    * 1997 cutoff, v2 appends the rest — and this query reads v1
    * AFTER v2 exists: the manifest selects exactly v1's batch dirs,
    * so history is a read-time choice with zero data movement. The
    * oracle is the date-filtered base table: one extra or missing
    * row in the time-traveled read breaks the hash. Build-if-absent
    * keyed on the latest version (the q42 pattern).
    */
  private def versionedOrdersPath(d: String): String =
    "/tmp/graft_q259_vt_" + d.replaceAll("[^A-Za-z0-9.]", "_")

  private def ensureVersionedOrders(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import graft.operators.VersionedTable
    val path = versionedOrdersPath(d)
    if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
      val cut = lit("1997-01-01").cast("timestamp")
      val o = Tables.orders(s, d)
      VersionedTable.append(o.filter(col("o_orderdate") < cut), path)
      VersionedTable.append(o.filter(col("o_orderdate") >= cut), path)
    }
    path
  }

  val q259 = GraftQuery(
    "q259_time_travel_read",
    (s, d) => graft.operators.VersionedTable
      .readAt(s, ensureVersionedOrders(s, d), version = 1L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_c")),
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    """.trim))

  /** Latest-version read over the same versioned table: v2 = the
    * append-composed whole, equal to the full base table — proving
    * the append published every row exactly once across the two
    * manifests.
    */
  val q260 = GraftQuery(
    "q260_versioned_latest_read",
    (s, d) => graft.operators.VersionedTable
      .readLatest(s, ensureVersionedOrders(s, d))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_c")),
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      GROUP BY 1
    """.trim))

  /** Incremental read between versions — the consumer primitive
    * versioning exists for: everything committed after v1 up to v2
    * (here: the post-cutoff orders), computed as a manifest set
    * difference over KB-sized control files; a consumer carrying its
    * last-seen version gets exactly-once batch delivery with no log
    * infrastructure. The oracle is the complement of q259's.
    */
  val q261 = GraftQuery(
    "q261_versioned_read_changes",
    (s, d) => graft.operators.VersionedTable
      .readChanges(s, ensureVersionedOrders(s, d),
        fromVersion = 1L, toVersion = 2L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_c")),
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
    """.trim))

  /** Schema evolution across versions: v1 commits (orderkey,
    * total_c), v2 appends rows that ALSO carry o_orderpriority — the
    * add-a-column migration with zero rewrites. The merged-schema
    * read NULL-fills the pre-schema batch, and the aggregate groups
    * those rows under an explicit bucket; the oracle replays the
    * union-with-NULLs, so a pre-schema row that lost its place (or a
    * new row that lost its column) breaks the hash.
    */
  val q263 = GraftQuery(
    "q263_versioned_schema_evolution",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q263_vt_evo_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d)
        VersionedTable.append(o.filter(col("o_orderdate") < cut)
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("total_c")), path)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut)
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("total_c"),
            col("o_orderpriority")), path)
      }
      VersionedTable.readAt(s, path, version = 2L, mergeSchema = true)
        .groupBy(coalesce(col("o_orderpriority"), lit("<pre-schema>"))
          .as("prio"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH u AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
               NULL AS o_orderpriority
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
               o_orderpriority
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
      SELECT coalesce(o_orderpriority, '<pre-schema>') AS prio,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM u GROUP BY 1
    """.trim))

  /** Merge-on-read DELETE: urgent orders are deleted as a tombstone
    * commit (v3) — no data file rewritten, the deletion itself
    * versioned (time travel to v2 still sees them, spec-proven) —
    * and the latest read anti-joins the tombstones. The oracle is
    * the base table minus the deleted keys; one surviving deleted
    * row (or one over-deleted neighbor) breaks the hash.
    */
  val q264 = GraftQuery(
    "q264_versioned_merge_on_read_delete",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q264_vt_del_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        VersionedTable.append(o.filter(col("o_orderdate") < cut), path)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut), path)
        VersionedTable.deleteKeys(
          Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
          "o_orderkey", path)
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderpriority <> '1-URGENT'
      GROUP BY 1
    """.trim))

  /** The versioned table's full maintenance cycle in one declared
    * lifecycle: two appends, a tombstone delete, COMPACT (current
    * content rewritten as one batch — readers stop paying the
    * merge-on-read anti-join), then vacuum to the compacted version
    * only. The read after all of it must still equal the
    * base-minus-deleted oracle — maintenance is never allowed to
    * change content, and the driver hash enforces exactly that.
    */
  val q265 = GraftQuery(
    "q265_versioned_compact_lifecycle",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q265_vt_opt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        VersionedTable.append(o.filter(col("o_orderdate") < cut), path)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut), path)
        VersionedTable.deleteKeys(
          Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
          "o_orderkey", path)
        VersionedTable.compact(s, path)
        VersionedTable.vacuum(path, keep = 1)
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderpriority <> '1-URGENT'
      GROUP BY 1
    """.trim))

  /** MERGE/upsert as ONE atomic commit (the versioned table's J3/J4
    * parity): v1/v2 publish the orders in two appends, v3 upserts a
    * corrections batch — every 1-URGENT order re-published with
    * total_c + 10000 (the "restate urgent totals" correction) PLUS a
    * synthetic insert per urgent order under a fresh key with status
    * 'X' — in a single manifest rename: matched keys replaced,
    * unmatched inserted, and no reader can ever observe the deletion
    * without the corrected rows (same-commit tombstone+data,
    * spec-proven). The oracle replays replace-and-insert over the
    * base table; one stale pre-correction row surviving (or one
    * correction applied twice) breaks the hash.
    */
  val q267 = GraftQuery(
    "q267_versioned_upsert",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q267_vt_up_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        VersionedTable.append(
          o.filter(col("o_orderdate") < cut).drop("o_orderdate"), path)
        VersionedTable.append(
          o.filter(col("o_orderdate") >= cut).drop("o_orderdate"), path)
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("total_c"))
        val corrections = urgent
          .withColumn("total_c", col("total_c") + 10000L)
        val inserts = urgent
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("X").as("o_orderstatus"), col("total_c"))
        VersionedTable.upsert(corrections.unionByName(inserts),
          "o_orderkey", path, txnId = Some("corrections-1"))
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      merged AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN total_c + 10000 ELSE total_c END AS total_c
        FROM base
        UNION ALL
        SELECT 'X' AS o_orderstatus, total_c
        FROM base WHERE o_orderpriority = '1-URGENT')
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM merged GROUP BY 1
    """.trim))

  /** Change feed across compaction (dataChange = false): v1/v2
    * publish two date slices, v3 COMPACTS the table, v4 appends the
    * post-cutoff slice. A consumer checkpointed at v2 catching up to
    * v4 must receive EXACTLY v4's rows — the compaction batch is
    * flagged `=` in the manifest and the change feed skips it, so an
    * OPTIMIZE never re-delivers the whole table to incremental
    * consumers (the Delta dataChange=false contract). The oracle is
    * v4's defining filter alone: one re-delivered compacted row
    * doubles a count and breaks the hash.
    */
  val q268 = GraftQuery(
    "q268_versioned_changefeed_compaction",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q268_vt_cf_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"))
        val c95 = lit("1995-01-01").cast("timestamp")
        val c97 = lit("1997-01-01").cast("timestamp")
        VersionedTable.append(o.filter(col("o_orderdate") < c95), path)
        VersionedTable.append(
          o.filter(col("o_orderdate") >= c95 && col("o_orderdate") < c97), path)
        VersionedTable.compact(s, path)
        VersionedTable.append(o.filter(col("o_orderdate") >= c97), path)
      }
      VersionedTable.readChanges(s, path, fromVersion = 2L, toVersion = 4L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
    """.trim))

  /** The consume side of the versioned publish (q262's missing half):
    * a checkpointed AvailableNow consumer drains the table twice —
    * delivery 1 seeds from the initial snapshot (pre-cutoff orders at
    * v1), then the publisher compacts AND appends, and delivery 2
    * carries ONLY the new batch (the compaction between the two
    * consumptions is dataChange=false and contributes nothing). Each
    * delivery lands in an append-only parquet sink tagged with its
    * kind; the checkpoint advance is atomic, so a re-run of the whole
    * query delivers nothing new and the sink is stable (idempotent
    * re-verification). The oracle replays both deliveries from the
    * base table; a re-delivered or dropped row in either breaks the
    * hash.
    */
  val q269 = GraftQuery(
    "q269_versioned_checkpointed_consume",
    (s, d) => {
      import graft.operators.VersionedTable
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft_q269_vt_src_$suffix"
      val ckpt = s"/tmp/graft_q269_vt_ckpt_$suffix"
      val sink = s"/tmp/graft_q269_vt_sink_$suffix"
      val cut = lit("1997-01-01").cast("timestamp")
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("total_c"))
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(path).exists(_ >= 3L) &&
        exists(ckpt) && exists(sink)
      if (!complete) {
        // partial state from a crashed earlier build would corrupt the
        // sink contract — start from a clean slate
        Seq(path, ckpt, sink).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        VersionedTable.append(o.filter(col("o_orderdate") < cut), path)
        VersionedTable.consumeChanges(s, path, ckpt) { (df, _, _) =>
          df.withColumn("delivery", lit("snapshot"))
            .write.mode("append").parquet(sink)
        }
        VersionedTable.compact(s, path)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut), path)
        VersionedTable.consumeChanges(s, path, ckpt) { (df, _, _) =>
          df.withColumn("delivery", lit("incremental"))
            .write.mode("append").parquet(sink)
        }
      }
      // steady state: nothing new → no delivery, sink unchanged
      VersionedTable.consumeChanges(s, path, ckpt) { (_, _, _) =>
        throw new IllegalStateException("nothing new, yet a delivery fired")
      }
      s.read.parquet(sink)
        .groupBy(col("delivery"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH deliveries AS (
        SELECT 'snapshot' AS delivery, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 'incremental' AS delivery, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
      SELECT delivery, o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM deliveries GROUP BY 1, 2
    """.trim))

  /** Manifest-level data skipping: the table commits three date-keyed
    * batches with per-batch min/max stats on the epoch-seconds order
    * date riding the manifest entries (`statsCols`), and a
    * twelve-month range query reads via `readAtPruned` — batches
    * whose [min,max] misses the range are dropped from KB-sized
    * manifest stats BEFORE any file or footer is opened (the
    * Delta/Iceberg skipping idea at batch grain: at 100 TB a
    * one-month query opens one month's batches). Pruning is a
    * superset guarantee; the query applies its own filter on top,
    * and the oracle is the plain filtered aggregate — an over-pruned
    * batch (lost rows) or an unapplied filter breaks the hash.
    * VersionedTableSpec proves via inputFiles that non-matching
    * batches are never touched.
    */
  val q275 = GraftQuery(
    "q275_versioned_pruned_read",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q275_vt_skip_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        val c95 = lit("1995-01-01").cast("timestamp").cast("long")
        val c97 = lit("1997-01-01").cast("timestamp").cast("long")
        VersionedTable.append(o.filter(col("o_date_s") < c95), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(
          o.filter(col("o_date_s") >= c95 && col("o_date_s") < c97), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(o.filter(col("o_date_s") >= c97), path,
          statsCols = Seq("o_date_s"))
      }
      val lo = 804556800L  // 1995-07-01T00:00:00Z
      val hi = 836179200L  // 1996-07-01T00:00:00Z (exclusive)
      VersionedTable.readAtPruned(s, path, version = 3L, "o_date_s",
          lo, hi - 1)
        .filter(col("o_date_s") >= lo && col("o_date_s") < hi)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY 1
    """.trim))

  /** End-to-end exactly-once incremental pipeline — the versioned
    * primitives COMPOSED: a source table publishes in two commits; a
    * checkpointed consumer ([[graft.operators.VersionedTable.consumeChanges]])
    * drains each delivery, reduces it to per-status PARTIAL aggregates
    * (the incremental-view-maintenance shape: delivery-sized work, not
    * table-sized), and publishes them to a RESULT versioned table with
    * txnId = "agg-<toVersion>" — so a crashed-and-replayed delivery
    * can never double-publish (at-least-once consumer + idempotent
    * txn-guarded sink = exactly once, end to end). The read merges
    * partials by summing. The oracle is the full recompute from the
    * base table: one lost, duplicated, or double-counted delivery
    * anywhere in the chain breaks the hash. Re-running the whole
    * query is a no-op on both tables (steady-state consume returns
    * None; the txn guard holds).
    */
  val q276 = GraftQuery(
    "q276_versioned_incremental_pipeline",
    (s, d) => {
      import graft.operators.VersionedTable
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val src = s"/tmp/graft_q276_vt_src_$suffix"
      val ckpt = s"/tmp/graft_q276_vt_ckpt_$suffix"
      val agg = s"/tmp/graft_q276_vt_agg_$suffix"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(src).exists(_ >= 2L) &&
        exists(ckpt) && VersionedTable.latestVersion(agg).nonEmpty
      if (!complete) {
        Seq(src, ckpt, agg).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        def drain(): Unit = {
          VersionedTable.consumeChanges(s, src, ckpt) { (df, _, to) =>
            VersionedTable.append(
              df.groupBy(col("o_orderstatus"))
                .agg(count(lit(1)).as("n_partial"),
                  sum(col("total_c")).as("total_partial")),
              agg, txnId = Some(s"agg-$to"))
          }
          ()
        }
        VersionedTable.append(o.filter(col("o_orderdate") < cut)
          .drop("o_orderdate"), src)
        drain()
        VersionedTable.append(o.filter(col("o_orderdate") >= cut)
          .drop("o_orderdate"), src)
        drain()
      }
      // steady state: nothing new — no delivery fires, tables stable
      VersionedTable.consumeChanges(s, src, ckpt) { (_, _, _) =>
        throw new IllegalStateException("nothing new, yet a delivery fired")
      }
      VersionedTable.readLatest(s, agg)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("n_partial")).as("n_orders"),
          sum(col("total_partial")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      GROUP BY 1
    """.trim))

  /** Clustering compaction (OPTIMIZE ZORDER-lite): the table arrives
    * in arrival order — three appends each spanning the FULL date
    * range (orderkey-parity slices), so batch-grain stats cannot
    * skip anything — then `compactByRange` rewrites the content
    * range-bucketed on the epoch-seconds date into four
    * exact-quantile buckets, each a manifest entry flagged `=`
    * (dataChange=false) carrying its own tight min/max. The same
    * 12-month range read as q275 then opens a strict subset of the
    * bucket dirs (spec-proven via inputFiles), and the oracle is the
    * plain filtered aggregate — clustering is maintenance and must
    * never change content. This is the loop a 100 TB date-queried
    * table runs: stream in by arrival, periodically recluster, keep
    * range queries ~1/nBuckets-priced.
    */
  val q278 = GraftQuery(
    "q278_versioned_clustering_compaction",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q278_vt_clus_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        (0 until 3).foreach { i =>
          VersionedTable.append(o.filter(col("o_orderkey") % 3 === i), path)
        }
        VersionedTable.compactByRange(s, path, "o_date_s", nBuckets = 4)
      }
      val lo = 804556800L  // 1995-07-01T00:00:00Z
      val hi = 836179200L  // 1996-07-01T00:00:00Z (exclusive)
      VersionedTable.readAtPruned(s, path, version = 4L, "o_date_s",
          lo, hi - 1)
        .filter(col("o_date_s") >= lo && col("o_date_s") < hi)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY 1
    """.trim))

  /** Change data feed with DELETE propagation (Delta CDF shape —
    * readChanges' documented gap closed): v1 publishes the pre-1997
    * orders, v2 tombstones the urgent keys, v3 appends the rest; the
    * feed from v1 to v3 must carry v3's rows tagged `insert` AND the
    * FULL deleted rows tagged `delete` — materialized by semi-joining
    * each tombstone's keys against the position-scoped view just
    * before it, per commit over the retained manifests (an endpoint
    * manifest diff would silently lose changes an intermediate
    * compaction folded — spec-caught, and the spec also proves
    * applying the feed to the v1 view reproduces readAt(v3) exactly).
    * The oracle replays both legs from the base table; one missing
    * or extra change row breaks the hash.
    */
  val q280 = GraftQuery(
    "q280_versioned_change_data_feed",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q280_vt_cdf_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        VersionedTable.append(o.filter(col("o_orderdate") < cut)
          .drop("o_orderdate"), path)
        VersionedTable.deleteKeys(
          Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
          "o_orderkey", path)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut)
          .drop("o_orderdate"), path)
      }
      VersionedTable.readChangeFeed(s, path, fromVersion = 1L, toVersion = 3L)
        .groupBy(col("_change_type"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH feed AS (
        SELECT 'insert' AS _change_type, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 'delete' AS _change_type, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
          AND o_orderpriority = '1-URGENT')
      SELECT _change_type, o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM feed GROUP BY 1, 2
    """.trim))

  /** AUTOMATIC data skipping — q275's manifest-stats pruning with the
    * caller-supplied bounds deleted: the table is committed in three
    * date-ranged batches with `statsCols`, a keyed delete adds a
    * merge-on-read tombstone, and the query is plain declarative
    * Spark — `readAtAuto(...).filter(range)` — with NO pruning hint.
    * The injected [[graft.plans.VersionedStatsPruning]] rule derives
    * the batch pruning from the filter itself at optimize time (the
    * Delta/Iceberg stats-skipping contract, optimizer-integrated);
    * PlanAssertionsSpec proves the final plan scans exactly one of
    * the three data batches, and the oracle proves pruning never
    * changed the answer. At 100 TB: the user's where-clause alone
    * confines the scan to the intersecting commits — no API beyond
    * `.filter` to hold wrong.
    */
  val q281 = GraftQuery(
    "q281_versioned_auto_skipping",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q281_vt_auto_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        // clean-slate rebuild: a partial build (appends without the
        // delete) must not append twice
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        val c95 = lit("1995-01-01").cast("timestamp").cast("long")
        val c97 = lit("1997-01-01").cast("timestamp").cast("long")
        VersionedTable.append(o.filter(col("o_date_s") < c95), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(
          o.filter(col("o_date_s") >= c95 && col("o_date_s") < c97), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(o.filter(col("o_date_s") >= c97), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.deleteKeys(
          Tables.orders(s, d).filter(col("o_orderkey") % 10 === 3)
            .select(col("o_orderkey")),
          "o_orderkey", path)
      }
      val lo = 804556800L  // 1995-07-01T00:00:00Z
      val hi = 820454400L  // 1996-01-01T00:00:00Z (exclusive)
      VersionedTable.readAtAuto(s, path, version = 4L)
        .filter(col("o_date_s") >= lo && col("o_date_s") < hi)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
        AND o_orderkey % 10 <> 3
      GROUP BY 1
    """.trim))

  /** TWO-DIMENSIONAL clustering (OPTIMIZE ZORDER) — q278's
    * maintenance loop extended to the case 1-D clustering cannot
    * serve: a table queried by range on TWO columns. Orders arrive in
    * two arrival-order commits with NO stats (nothing can prune);
    * `compactByZOrder(o_date_s, o_custkey)` rewrites them ordered by
    * the Morton interleave of each column's exact-quantile grid cell
    * (Delta's OPTIMIZE ZORDER shape), each bucket's manifest entry
    * carrying tight min/max for BOTH columns. The query then runs a
    * date-range slice AND a customer-range slice — both plain
    * `readAtAuto(...).filter`, both auto-pruned by the
    * VersionedStatsPruning rule — and aggregates each; the spec
    * measures that either filter opens a strict subset of buckets
    * while 1-D range clustering leaves the second column at zero
    * skipping. Maintenance never changes content: the oracle
    * recomputes both slices from the base table.
    */
  val q282 = GraftQuery(
    "q282_versioned_zorder_compaction",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q282_vt_zorder_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        // arrival order (keyed by orderkey parity), deliberately
        // WITHOUT statsCols: pre-maintenance, nothing prunes
        VersionedTable.append(o.filter(col("o_orderkey") % 2 === 0), path)
        VersionedTable.append(o.filter(col("o_orderkey") % 2 === 1), path)
        VersionedTable.compactByZOrder(s, path, "o_date_s", "o_custkey",
          nBuckets = 16, bits = 2)
      }
      val lo = 804556800L  // 1995-07-01T00:00:00Z
      val hi = 820454400L  // 1996-01-01T00:00:00Z (exclusive)
      val t = VersionedTable.readAtAuto(s, path, version = 3L)
      val byDate = t.filter(col("o_date_s") >= lo && col("o_date_s") < hi)
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
        .withColumn("slice", lit("by_date"))
      val byCust = t.filter(col("o_custkey") <= 40)
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
        .withColumn("slice", lit("by_cust"))
      byDate.unionByName(byCust)
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
             'by_date' AS slice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      UNION ALL
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
             'by_cust' AS slice
      FROM orders WHERE o_custkey <= 40
    """.trim))

  /** Bloom-sidecar POINT LOOKUP — the index for the layout zone maps
    * cannot serve: orders striped by `o_orderkey % 4` across four
    * commits, so every batch's [min, max] spans the whole key domain
    * and q275/q281-style stats pruning degenerates to a full read.
    * Each append writes a `_bloom/` sidecar INSIDE its batch dir
    * (invisible to data scans via the underscore convention,
    * vacuum-reclaimed with its batch, no manifest grammar change);
    * `lookupKeys` probes the sidecars with both xxhash64 lanes and
    * reads only candidate batches, tombstones still applied —
    * PlanAssertionsSpec proves the scan subset, the oracle that
    * pruning never changed a row (Bloom has no false negatives;
    * false positives are removed by the exact key filter). The same
    * probe prunes the insert-if-absent anti-join in `upsert`
    * (VersionedBloomSpec equality proof). At 100 TB: a 10-key lookup
    * or a small MERGE touches KB-sized sidecars plus the one or two
    * batches that matter, not the table.
    */
  val q283 = GraftQuery(
    "q283_versioned_bloom_lookup",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q283_vt_bloom_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"))
        (0 until 4).foreach { stripe =>
          VersionedTable.append(o.filter(col("o_orderkey") % 4 === stripe),
            path, bloomCols = Seq("o_orderkey"))
        }
        VersionedTable.deleteKeys(
          Tables.orders(s, d).filter(col("o_orderkey") % 10 === 7)
            .select(col("o_orderkey")),
          "o_orderkey", path)
      }
      // all probed keys are odd -> stripes 1 and 3 only: the Bloom
      // probe confines the lookup to 2 of the 4 batches
      // (PlanAssertionsSpec proves it); 17 and 1337 are tombstoned
      VersionedTable.lookupKeys(s, path, version = 5L, "o_orderkey",
        Seq(3L, 17L, 555L, 999L, 1001L, 1337L))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderkey IN (3, 17, 555, 999, 1001, 1337)
        AND o_orderkey % 10 <> 7
    """.trim))

  /** The versioned table from PLAIN SQL TEXT — `graft_versioned(path,
    * version)` injected as a table-valued function via
    * SparkSessionExtensions: time travel, merge-on-read tombstones,
    * and automatic stats skipping all reachable from a JDBC/thrift
    * frontend that never touches the Scala API (the library boundary
    * GraftExtensions exists for). The WHERE clause here is an
    * ordinary SQL predicate; the VersionedStatsPruning rule prunes
    * batches from it exactly as for DataFrame filters
    * (VersionedAutoPruneSpec proves the same scan subset through
    * both surfaces). Same table recipe as q281, own path — the gate
    * queries stay independently runnable.
    */
  val q284 = GraftQuery(
    "q284_versioned_sql_tvf",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q284_vt_sql_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        val c95 = lit("1995-01-01").cast("timestamp").cast("long")
        val c97 = lit("1997-01-01").cast("timestamp").cast("long")
        VersionedTable.append(o.filter(col("o_date_s") < c95), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(
          o.filter(col("o_date_s") >= c95 && col("o_date_s") < c97), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(o.filter(col("o_date_s") >= c97), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.deleteKeys(
          Tables.orders(s, d).filter(col("o_orderkey") % 10 === 6)
            .select(col("o_orderkey")),
          "o_orderkey", path)
      }
      s.sql(s"""
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(total_c) AS BIGINT) AS total_c
        FROM graft_versioned('$path', 4)
        WHERE o_date_s >= 815184000 AND o_date_s < 830908800
        GROUP BY o_orderstatus
      """) // [1995-11-01, 1996-05-01) — inside the middle batch
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-11-01'
        AND o_orderdate < TIMESTAMP '1996-05-01'
        AND o_orderkey % 10 <> 6
      GROUP BY 1
    """.trim))

  /** DESCRIBE HISTORY — the commit log as a queryable table, derived
    * entirely from the KB-sized manifests (metadata-only at any
    * table size): per retained version its kind (append / delete /
    * upsert / compact, classified from the commit's NEW entries),
    * entry deltas, and the writer txn id. The build replays one of
    * each commit kind; the oracle is the literal expected log — a
    * misclassified or miscounted commit anywhere breaks the hash.
    */
  val q285 = GraftQuery(
    "q285_versioned_history",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q285_vt_hist_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"))
        VersionedTable.append(o.filter(col("o_orderkey") % 4 === 0), path)
        VersionedTable.append(o.filter(col("o_orderkey") % 4 === 1), path,
          txnId = Some("load-2"))
        VersionedTable.deleteKeys(
          o.filter(col("o_orderkey") % 10 === 4).select(col("o_orderkey")),
          "o_orderkey", path)
        VersionedTable.upsert(
          o.filter(col("o_orderkey") % 4 === 2), "o_orderkey", path)
        VersionedTable.compact(s, path)
      }
      // explicit columns: the round-16 `ts` column is wall-clock and
      // cannot hash against a static oracle
      VersionedTable.history(s, path)
        .select("version", "kind", "n_add", "n_delete", "txn")
    },
    Some("""
      SELECT * FROM (VALUES
        (1, 'append',  1, 0, NULL),
        (2, 'append',  1, 0, 'load-2'),
        (3, 'delete',  0, 1, NULL),
        (4, 'upsert',  1, 1, NULL),
        (5, 'compact', 1, 0, NULL))
        AS t(version, kind, n_add, n_delete, txn)
    """.trim))

  /** Metadata-only COUNT(*) — `countAt` answers cardinality from
    * parquet FOOTER record counts alone (zero data pages; the q16
    * HEAD-probe discipline at table grain, Delta's numRecords
    * answer) whenever the manifest carries no unabsorbed tombstone,
    * and refuses (None) when it does — correctness is never
    * approximated. The query walks the table through its lifecycle:
    * after two appends (metadata count valid), after a delete
    * (refused → merge-on-read recount), after the compaction absorbs
    * the tombstones (metadata count valid again, now net of
    * deletes). One row per stage with the count source labeled; the
    * oracle recomputes every stage from the base table — a footer
    * count that disagrees with true cardinality anywhere (e.g. a
    * Bloom sidecar miscounted as data) breaks the hash.
    */
  val q286 = GraftQuery(
    "q286_versioned_metadata_count",
    (s, d) => {
      import s.implicits._
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q286_vt_count_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"))
        // bloomCols on purpose: the sidecar's parquet files must NOT
        // leak into the footer count
        VersionedTable.append(o.filter(col("o_orderkey") % 2 === 0), path,
          bloomCols = Seq("o_orderkey"))
        VersionedTable.append(o.filter(col("o_orderkey") % 2 === 1), path,
          bloomCols = Seq("o_orderkey"))
        VersionedTable.deleteKeys(
          o.filter(col("o_orderkey") % 5 === 0).select(col("o_orderkey")),
          "o_orderkey", path)
        VersionedTable.compact(s, path)
      }
      def stage(v: Long, label: String): (String, Long, Boolean) =
        VersionedTable.countAt(s, path, v) match {
          case Some(n) => (label, n, true)
          case None => (label, VersionedTable.readAt(s, path, v).count(), false)
        }
      Seq(stage(2L, "appended"), stage(3L, "deleted"), stage(4L, "compacted"))
        .toDF("stage", "n_rows", "from_metadata")
    },
    Some("""
      SELECT 'appended' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
             TRUE AS from_metadata FROM orders
      UNION ALL
      SELECT 'deleted', CAST(count(*) AS BIGINT), FALSE
      FROM orders WHERE o_orderkey % 5 <> 0
      UNION ALL
      SELECT 'compacted', CAST(count(*) AS BIGINT), TRUE
      FROM orders WHERE o_orderkey % 5 <> 0
    """.trim))

  /** Metadata-only MIN/MAX — `statsRange` answers a column's
    * table-wide range from the manifest envelope alone (batch stats
    * are EXACT per-batch aggregates), with [[q286]]'s honesty rules:
    * unabsorbed tombstones refuse (a deleted row may carry the
    * extremum), a stats-less batch is consulted by footer count so a
    * truly EMPTY batch (this build commits one deliberately) never
    * forces the fallback but a non-empty one does. The lifecycle:
    * metadata answer after the stats-carrying appends, merge-on-read
    * recompute after a date-cutoff delete ACTUALLY MOVES the min,
    * metadata again once compaction re-derives stats. The oracle
    * recomputes every stage from the base table.
    */
  val q288 = GraftQuery(
    "q288_versioned_metadata_minmax",
    (s, d) => {
      import s.implicits._
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q288_vt_range_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        val c95 = lit("1995-01-01").cast("timestamp").cast("long")
        VersionedTable.append(o.filter(col("o_date_s") < c95), path,
          statsCols = Seq("o_date_s"))
        VersionedTable.append(o.filter(col("o_date_s") >= c95), path,
          statsCols = Seq("o_date_s"))
        // a deliberately EMPTY stats-less batch: ignorable by footer
        // count, must not force the fallback
        VersionedTable.append(o.filter(lit(false)), path)
        VersionedTable.deleteKeys(
          o.filter(col("o_date_s") < lit("1993-07-01").cast("timestamp")
            .cast("long")).select(col("o_orderkey")),
          "o_orderkey", path)
        VersionedTable.compact(s, path, statsCols = Seq("o_date_s"))
      }
      def stage(v: Long, label: String): (String, Long, Long, Boolean) =
        VersionedTable.statsRange(s, path, v, "o_date_s") match {
          case Some((lo, hi)) => (label, lo, hi, true)
          case None =>
            val r = VersionedTable.readAt(s, path, v)
              .agg(org.apache.spark.sql.functions.min(col("o_date_s")),
                org.apache.spark.sql.functions.max(col("o_date_s"))).head()
            (label, r.getLong(0), r.getLong(1), false)
        }
      Seq(stage(3L, "appended"), stage(4L, "deleted"), stage(5L, "compacted"))
        .toDF("stage", "lo_s", "hi_s", "from_metadata")
    },
    Some("""
      SELECT 'appended' AS stage,
             CAST(epoch(min(o_orderdate)) AS BIGINT) AS lo_s,
             CAST(epoch(max(o_orderdate)) AS BIGINT) AS hi_s,
             TRUE AS from_metadata
      FROM orders
      UNION ALL
      SELECT 'deleted', CAST(epoch(min(o_orderdate)) AS BIGINT),
             CAST(epoch(max(o_orderdate)) AS BIGINT), FALSE
      FROM orders WHERE o_orderdate >= TIMESTAMP '1993-07-01'
      UNION ALL
      SELECT 'compacted', CAST(epoch(min(o_orderdate)) AS BIGINT),
             CAST(epoch(max(o_orderdate)) AS BIGINT), TRUE
      FROM orders WHERE o_orderdate >= TIMESTAMP '1993-07-01'
    """.trim))

  /** COMMIT-TIME CONSTRAINTS with a quarantine DLQ — Delta CHECK /
    * DLT expectations on the versioned table, V-family parity
    * (junk filter + K7 dead-letter) made transactional: the batch is
    * validated BEFORE any manifest references it, valid rows commit,
    * violating rows land in a quarantine table that is itself
    * versioned and auditable. The build injects three deterministic
    * defect classes into orders (a NULL status, a negative amount, a
    * dangling customer FK — each keyed by orderkey residues); the
    * query reports committed/quarantined cardinalities and the
    * quarantined total. The oracle replays the same mutations and
    * split in SQL — one row routed to the wrong side anywhere breaks
    * the hash.
    */
  val q289 = GraftQuery(
    "q289_versioned_checked_ingest",
    (s, d) => {
      import s.implicits._
      import graft.operators.{Expectations, VersionedTable}
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft_q289_vt_chk_$suffix"
      val dlq = s"/tmp/graft_q289_vt_dlq_$suffix"
      val complete = VersionedTable.latestVersion(path).exists(_ >= 1L) &&
        VersionedTable.latestVersion(dlq).exists(_ >= 1L)
      if (!complete) {
        Seq(path, dlq).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (f.exists(p)) f.delete(p, true)
        }
        val incoming = Tables.orders(s, d).select(
          col("o_orderkey"),
          when(col("o_orderkey") % 97 === 3, lit(null))
            .otherwise(col("o_orderstatus")).as("status"),
          when(col("o_orderkey") % 89 === 7, -col("o_custkey"))
            .otherwise(col("o_custkey")).as("custkey"),
          (round(col("o_totalprice") * 100).cast("long") *
            when(col("o_orderkey") % 101 === 5, -1L).otherwise(1L))
            .as("total_c"))
        VersionedTable.appendChecked(incoming, path,
          Seq(Expectations.NotNull("status"),
            Expectations.Check("total_nonneg", col("total_c") >= 0),
            Expectations.InReference("custkey",
              Tables.customer(s, d).select(col("c_custkey")), "c_custkey")),
          quarantine = Some(dlq))
      }
      val committed = VersionedTable.readLatest(s, path)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("total_c")).as("sum_total_c"))
        .withColumn("side", lit("committed"))
      val quarantined = VersionedTable.readLatest(s, dlq)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("total_c")).as("sum_total_c"))
        .withColumn("side", lit("quarantined"))
      committed.unionByName(quarantined)
    },
    Some("""
      WITH inc AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 3 THEN NULL ELSE o_orderstatus END AS status,
               CASE WHEN o_orderkey % 89 = 7 THEN -o_custkey ELSE o_custkey END AS custkey,
               CAST(round(o_totalprice * 100) AS BIGINT)
                 * (CASE WHEN o_orderkey % 101 = 5 THEN -1 ELSE 1 END) AS total_c
        FROM orders),
      v AS (
        SELECT *,
               (status IS NULL) OR (total_c < 0)
                 OR (custkey NOT IN (SELECT c_custkey FROM customer)) AS bad
        FROM inc)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(total_c) AS BIGINT) AS sum_total_c,
             'committed' AS side
      FROM v WHERE NOT bad
      UNION ALL
      SELECT CAST(count(*) AS BIGINT), CAST(sum(total_c) AS BIGINT),
             'quarantined'
      FROM v WHERE bad
    """.trim))

  /** THE LAKEHOUSE LIFECYCLE, COMPOSED (the q279 discipline for the
    * third batch): constraint-checked ingestion with a quarantine
    * DLQ in two commits → a keyed delete → z-order clustering
    * compaction that REBUILDS the index layer (both-column stats +
    * an orderkey Bloom) → analytics over the SQL TVF surface where
    * the WHERE clauses alone drive both pruning regimes (a date
    * range through the stats envelope, a key IN-list through the
    * sidecar probe) → a commit-log audit. One frame, one oracle:
    * a row misrouted at ingest, lost in maintenance, or mis-pruned
    * by either skipping path breaks the hash.
    */
  val q290 = GraftQuery(
    "q290_lakehouse_recipe",
    (s, d) => {
      import graft.operators.{Expectations, VersionedTable}
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft_q290_vt_life_$suffix"
      val dlq = s"/tmp/graft_q290_vt_lifedlq_$suffix"
      val complete = VersionedTable.latestVersion(path).exists(_ >= 4L) &&
        VersionedTable.latestVersion(dlq).nonEmpty
      if (!complete) {
        Seq(path, dlq).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (f.exists(p)) f.delete(p, true)
        }
        val incoming = Tables.orders(s, d).select(
          col("o_orderkey"),
          when(col("o_orderkey") % 93 === 2, lit(null))
            .otherwise(col("o_orderstatus")).as("status"),
          when(col("o_orderkey") % 87 === 6, -col("o_custkey"))
            .otherwise(col("o_custkey")).as("custkey"),
          (round(col("o_totalprice") * 100).cast("long") *
            when(col("o_orderkey") % 91 === 4, -1L).otherwise(1L))
            .as("total_c"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_date_s"))
        val rules = Seq(Expectations.NotNull("status"),
          Expectations.Check("total_nonneg", col("total_c") >= 0),
          Expectations.InReference("custkey",
            Tables.customer(s, d).select(col("c_custkey")), "c_custkey"))
        val c95 = lit("1995-01-01").cast("timestamp").cast("long")
        VersionedTable.appendChecked(incoming.filter(col("o_date_s") < c95),
          path, rules, quarantine = Some(dlq), txnId = Some("life-1"))
        VersionedTable.appendChecked(incoming.filter(col("o_date_s") >= c95),
          path, rules, quarantine = Some(dlq), txnId = Some("life-2"))
        VersionedTable.deleteKeys(
          Tables.orders(s, d).filter(col("o_orderkey") % 10 === 9)
            .select(col("o_orderkey")),
          "o_orderkey", path)
        VersionedTable.compactByZOrder(s, path, "o_date_s", "custkey",
          nBuckets = 8, bits = 2, bloomCols = Seq("o_orderkey"))
      }
      val committed = VersionedTable.readLatest(s, path)
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("total_c"))
        .withColumn("metric", lit("committed"))
      val quarantined = VersionedTable.readLatest(s, dlq)
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("total_c"))
        .withColumn("metric", lit("quarantined"))
      val slice = s.sql(s"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(total_c) AS BIGINT) AS total_c,
               'date_slice' AS metric
        FROM graft_versioned('$path', 4)
        WHERE o_date_s >= 804556800 AND o_date_s < 820454400""")
      val lookup = s.sql(s"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(total_c) AS BIGINT) AS total_c,
               'point_lookup' AS metric
        FROM graft_versioned('$path', 4)
        WHERE o_orderkey IN (3, 41, 555, 997, 1203)""")
      val commits = s.sql(s"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(version) AS BIGINT) AS total_c,
               'commits' AS metric
        FROM graft_history('$path')""")
      committed.unionByName(quarantined).unionByName(slice)
        .unionByName(lookup).unionByName(commits)
    },
    Some("""
      WITH inc AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 93 = 2 THEN NULL ELSE o_orderstatus END AS status,
               CASE WHEN o_orderkey % 87 = 6 THEN -o_custkey ELSE o_custkey END AS custkey,
               CAST(round(o_totalprice * 100) AS BIGINT)
                 * (CASE WHEN o_orderkey % 91 = 4 THEN -1 ELSE 1 END) AS total_c,
               o_orderdate
        FROM orders),
      v AS (
        SELECT *,
               (status IS NULL) OR (total_c < 0)
                 OR (custkey NOT IN (SELECT c_custkey FROM customer)) AS bad
        FROM inc),
      live AS (
        SELECT * FROM v WHERE NOT bad AND o_orderkey % 10 <> 9)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(total_c) AS BIGINT) AS total_c, 'committed' AS metric
      FROM live
      UNION ALL
      SELECT CAST(count(*) AS BIGINT), CAST(sum(total_c) AS BIGINT),
             'quarantined'
      FROM v WHERE bad
      UNION ALL
      SELECT CAST(count(*) AS BIGINT), CAST(sum(total_c) AS BIGINT),
             'date_slice'
      FROM live
      WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      UNION ALL
      SELECT CAST(count(*) AS BIGINT), CAST(sum(total_c) AS BIGINT),
             'point_lookup'
      FROM live WHERE o_orderkey IN (3, 41, 555, 997, 1203)
      UNION ALL
      SELECT 4, 10, 'commits'
    """.trim))

  /** TYPED date skipping — the round-12 completion of q281, closing
    * the #1 real-user gap: before typed stats, a date-range filter
    * pruned nothing unless the caller pre-encoded epoch longs (every
    * skipping query through q290 filtered on a hand-built `o_date_s`
    * long). Here the table commits three date-split batches with
    * stats on a real DateType column (`@d` epoch-day entries on the
    * manifest), and the query is the predicate a user actually
    * writes: a plain `.filter` with DATE literals on the date
    * column, auto-pruned by VersionedStatsPruning's typed envelope
    * compare (VersionedTypedStatsSpec proves via the optimized
    * plan's root paths that only the matching batch opens; the
    * oracle proves pruning never changed a row). At 100 TB with
    * date-keyed commits, THE predicate — a one-month WHERE on a date
    * column — now confines the scan to one month's batch dirs with
    * no API beyond the filter.
    */
  val q291 = GraftQuery(
    "q291_versioned_typed_date_skipping",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q291_vt_date_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("date").as("o_date"))
        val c95 = lit("1995-01-01").cast("date")
        val c97 = lit("1997-01-01").cast("date")
        VersionedTable.append(o.filter(col("o_date") < c95), path,
          statsCols = Seq("o_date"))
        VersionedTable.append(
          o.filter(col("o_date") >= c95 && col("o_date") < c97), path,
          statsCols = Seq("o_date"))
        VersionedTable.append(o.filter(col("o_date") >= c97), path,
          statsCols = Seq("o_date"))
      }
      VersionedTable.readAtAuto(s, path, version = 3L)
        .filter(col("o_date") >= lit(java.sql.Date.valueOf("1995-07-01")) &&
          col("o_date") < lit(java.sql.Date.valueOf("1996-01-01")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1995-07-01'
        AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
      GROUP BY 1
    """.trim))

  /** N-DIMENSIONAL typed z-order — q282's two-column layout extended
    * to the three-axis case a real lakehouse runs (date x customer x
    * order key) with the date axis a REAL DateType column: the
    * round-robin Morton interleave (`compactByZOrderN`, bit-identical
    * to the 2-D code for n=2) buckets all three rank grids, every
    * bucket's manifest entry carries tight TYPED stats for all three
    * columns, and three independent plain-filter slices — a DATE
    * range, a customer range, a key range — each auto-prune to a
    * strict subset of buckets (VersionedTypedStatsSpec measures the
    * subsets; the n-D trade of weaker per-axis skipping is stated on
    * compactByZOrderN's contract). Maintenance never changes
    * content: the oracle recomputes all three slices from the base
    * table.
    */
  val q292 = GraftQuery(
    "q292_versioned_zorder3_typed",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q292_vt_z3_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("date").as("o_date"))
        // arrival order, no stats: pre-maintenance nothing prunes
        VersionedTable.append(o.filter(col("o_orderkey") % 2 === 0), path)
        VersionedTable.append(o.filter(col("o_orderkey") % 2 === 1), path)
        VersionedTable.compactByZOrderN(s, path,
          Seq("o_date", "o_custkey", "o_orderkey"), nBuckets = 16, bits = 4)
      }
      val t = VersionedTable.readAtAuto(s, path, version = 3L)
      val byDate = t.filter(
        col("o_date") >= lit(java.sql.Date.valueOf("1995-07-01")) &&
          col("o_date") < lit(java.sql.Date.valueOf("1996-01-01")))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
        .withColumn("slice", lit("by_date"))
      val byCust = t.filter(col("o_custkey") <= 40)
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
        .withColumn("slice", lit("by_cust"))
      val byKey = t.filter(col("o_orderkey") > 55000)
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
        .withColumn("slice", lit("by_key"))
      byDate.unionByName(byCust).unionByName(byKey)
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
             'by_date' AS slice
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1995-07-01'
        AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
      UNION ALL
      SELECT CAST(count(*) AS BIGINT),
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
             'by_cust'
      FROM orders WHERE o_custkey <= 40
      UNION ALL
      SELECT CAST(count(*) AS BIGINT),
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
             'by_key'
      FROM orders WHERE o_orderkey > 55000
    """.trim))

  /** STRING-PREFIX skipping — the typed-stats family's third domain:
    * documents commit in three language-split batches with stats on
    * the `lang` string column (`@s` UTF-8 hex prefixes on the
    * manifest; maxes longer than 64 chars record `*` = no upper
    * claim, proven in VersionedTypedStatsSpec). An equality filter
    * (`lang = 'en'`) and a range filter (`lang >= 'p'`) each open
    * only the intersecting batches — Delta's truncated string stats,
    * at manifest grain. The oracle recomputes both slices from the
    * immutable documents table: over-pruning (a lost row) or a
    * misordered prefix compare breaks the hash. String min/max
    * follow Spark's binary UTF8 ordering on both build and probe
    * sides, so non-ASCII keys cannot drift between them.
    */
  val q293 = GraftQuery(
    "q293_versioned_string_skipping",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q293_vt_str_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val doc = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        VersionedTable.append(doc.filter(col("lang") < "f"), path,
          statsCols = Seq("lang"))
        VersionedTable.append(
          doc.filter(col("lang") >= "f" && col("lang") < "p"), path,
          statsCols = Seq("lang"))
        VersionedTable.append(doc.filter(col("lang") >= "p"), path,
          statsCols = Seq("lang"))
      }
      val t = VersionedTable.readAtAuto(s, path, version = 3L)
      val en = t.filter(col("lang") === "en")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .withColumn("slice", lit("eq_en"))
      val tail = t.filter(col("lang") >= "p")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .withColumn("slice", lit("ge_p"))
      en.unionByName(tail)
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars, 'eq_en' AS slice
      FROM documents WHERE lang = 'en'
      UNION ALL
      SELECT CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT), 'ge_p'
      FROM documents WHERE lang >= 'p'
    """.trim))

  /** STREAMING SOURCE, offsets-are-versions — q276's exactly-once
    * incremental pipeline rebuilt on the FIRST-CLASS surface:
    * `spark.readStream.format("graft").load(src)` replaces the
    * hand-rolled consumeChanges composition. The V1 Source's offsets
    * are table versions (initial snapshot at the first micro-batch,
    * per-commit walk after, compactions never delivered); progress
    * lives in Spark's own offset WAL under the checkpoint, so the
    * second AvailableNow run resumes the exact version range across
    * a process boundary, and the foreachBatch sink appends partial
    * aggregates under txnId = "fmtagg-<batchId>" — Spark's
    * deterministic batch ids + the table's txn guard give end-to-end
    * exactly-once (a replayed micro-batch no-ops, spec-proven in
    * GraftDataSourceSpec's restart case). Oracle = full recompute
    * from the base table: one lost, duplicated, or re-delivered
    * version anywhere breaks the hash. A mid-stream compaction of
    * the source between the two runs proves dataChange=false
    * batches stay silent through the format surface too.
    */
  val q294 = GraftQuery(
    "q294_versioned_stream_source",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val src = s"/tmp/graft_q294_vt_src_$suffix"
      val ckpt = s"/tmp/graft_q294_vt_ckpt_$suffix"
      val agg = s"/tmp/graft_q294_vt_agg_$suffix"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(src).exists(_ >= 3L) &&
        exists(ckpt) && VersionedTable.latestVersion(agg).nonEmpty
      if (!complete) {
        Seq(src, ckpt, agg).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        def drain(): Unit = {
          val q = s.readStream.format("graft").load(src)
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
              if (!df.isEmpty)
                VersionedTable.append(
                  df.groupBy(col("o_orderstatus"))
                    .agg(count(lit(1)).as("n_partial"),
                      sum(col("total_c")).as("total_partial")),
                  agg, txnId = Some(s"fmtagg-$id"))
              ()
            }.start()
          q.awaitTermination(120000)
          ()
        }
        // run 1: snapshot of the first commit
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
          .filter(col("o_orderdate") < cut).drop("o_orderdate")
          .write.format("graft").mode("append").save(src)
        drain()
        // between runs: a compaction (must stay silent) + fresh rows
        VersionedTable.compact(s, src)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut)
          .drop("o_orderdate"), src)
        drain() // run 2 resumes from the WAL across the "restart"
      }
      VersionedTable.readLatest(s, agg)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("n_partial")).as("n_orders"),
          sum(col("total_partial")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      GROUP BY 1
    """.trim))

  /** The format("graft") BATCH round-trip: the table is BUILT through
    * `df.write.format("graft").mode("append")` (three date-split
    * commits, typed date stats via the `statsCols` write option) and
    * READ through `spark.read.format("graft").load` — no graft Scala
    * API anywhere in the data path. The batch relation handed to
    * Spark is the SAME pruned parquet relation `readAtAuto` plans
    * (GraftDataSourceSpec proves root-path parity), so the plain
    * DATE-literal filter here auto-prunes to one batch dir exactly
    * like q291. The oracle recomputes from the immutable orders
    * table: a write-path commit error, a version mixup, or
    * over-pruning through the connector breaks the hash.
    */
  val q295 = GraftQuery(
    "q295_versioned_format_roundtrip",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q295_vt_fmt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate").cast("date").as("o_date"))
        val c95 = lit("1995-01-01").cast("date")
        val c97 = lit("1997-01-01").cast("date")
        Seq(o.filter(col("o_date") < c95),
          o.filter(col("o_date") >= c95 && col("o_date") < c97),
          o.filter(col("o_date") >= c97)).foreach {
          _.write.format("graft").mode("append")
            .option("statsCols", "o_date").save(path)
        }
      }
      s.read.format("graft").load(path)
        .filter(col("o_date") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("o_date") < lit(java.sql.Date.valueOf("1996-07-01")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      GROUP BY 1
    """.trim))

  /** SQL DML end to end — the write half of the SQL surface, closing
    * the q284 read-only gap: the table is built, corrected, and
    * trimmed ENTIRELY from SQL text over a
    * [[graft.sql.GraftSql.register]]ed name, through the injected
    * parser ([[graft.sql.GraftDmlParser]]):
    *
    *   1. two `INSERT INTO` commits (by-position append, OCC path);
    *   2. a `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
    *      MATCHED THEN INSERT *` applying q267's corrections —
    *      last-writer-wins upsert through `upsertWithRetry`, the SAME
    *      OCC machinery as the Scala API;
    *   3. a `DELETE FROM ... WHERE` on mixed columns — one
    *      merge-on-read tombstone commit, no data rewritten.
    *
    * The oracle recomputes the insert+merge+delete pipeline
    * relationally from the immutable orders table: a mis-mapped
    * positional insert, a lost/duplicated merge row, or an
    * over/under-deleted key breaks the hash. GraftSqlDmlSpec
    * additionally proves SQL-MERGE equals Scala-upsert value-for-
    * value and covers the refusal matrix (partial SET lists, non-key
    * conditions, NOT MATCHED BY SOURCE all refuse loudly).
    */
  val q296 = GraftQuery(
    "q296_versioned_sql_dml",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q296_vt_dml_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.sql.GraftSql.register("q296_orders", path, "o_orderkey")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        Tables.orders(s, d).createOrReplaceTempView("q296_base")
        s.sql("""
          INSERT INTO q296_orders
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) AS total_c
          FROM q296_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql("""
          INSERT INTO q296_orders
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) AS total_c
          FROM q296_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
        s.sql("""
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) + 10000 AS total_c
          FROM q296_base WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_orderkey + 100000000, 'X' AS o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) AS total_c
          FROM q296_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q296_corrections")
        s.sql("""
          MERGE INTO q296_orders USING q296_corrections
          ON q296_orders.o_orderkey = q296_corrections.o_orderkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
        s.sql("""
          DELETE FROM q296_orders
          WHERE o_orderstatus = 'X' AND o_orderkey % 2 = 1""")
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      merged AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN total_c + 10000 ELSE total_c END AS total_c
        FROM base
        UNION ALL
        SELECT o_orderkey + 100000000, 'X' AS o_orderstatus,
               total_c
        FROM base WHERE o_orderpriority = '1-URGENT'),
      live AS (
        SELECT * FROM merged
        WHERE NOT (o_orderstatus = 'X' AND o_orderkey % 2 = 1))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** COMMIT HARDENING composed under one oracle — the two round-12
    * commit-layer upgrades exercised end to end:
    *
    *  - every commit in this query publishes under
    *    `spark.graft.versioned.commit = put-if-absent` — the
    *    object-store mode where the manifest lands via EXCLUSIVE
    *    create (the conditional-PUT `If-None-Match: *` contract)
    *    with no check-then-rename window (VersionedCommitModeSpec
    *    demonstrates rename mode losing a commit on a simulated S3
    *    and this mode refusing it);
    *  - the OPTIMIZE commit goes through maintenance OCC: a
    *    competing append lands between the rewrite and the commit
    *    (injected deterministically through the commit seam), and
    *    the retry merges `=`-entries ++ interleaved entries instead
    *    of failing terminally — stronger than Delta's append-only
    *    conflict rule, content-exact for deletes/upserts too
    *    (spec-proven per kind).
    *
    * The oracle recomputes the final content relationally: a lost
    * interleaved append, a doubled rewrite, or a torn commit breaks
    * the hash; a delete after the merged compaction proves the
    * merged manifest still anti-joins correctly.
    */
  val q297 = GraftQuery(
    "q297_versioned_commit_hardening",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q297_vt_occ_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      s.conf.set(VersionedTable.CommitModeConf, "put-if-absent")
      try {
        // guard includes the terminator probe: a table persisted by a
        // pre-terminator build reads as torn under put-if-absent's
        // required-terminator rule, so it must REBUILD, not be trusted
        if (!VersionedTable.latestVersion(path)
            .exists(v => v >= 5L && VersionedTable.terminated(path, v))) {
          val p = new org.apache.hadoop.fs.Path(path)
          val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (f.exists(p)) f.delete(p, true)
          val o = Tables.orders(s, d).select(col("o_orderkey"),
            col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("total_c"))
          VersionedTable.append(o.filter(col("o_orderkey") % 3 === 0), path)
          VersionedTable.append(o.filter(col("o_orderkey") % 3 === 1), path)
          // stage the OPTIMIZE rewrite of v2's content, then inject a
          // competing append before its commit: the maintenance OCC
          // retry merges rather than orphaning the rewrite
          val snap = 2L
          val batch = s"b3_q297rewrite"
          VersionedTable.readAt(s, path, snap)
            .write.mode("overwrite").parquet(s"$path/data/$batch")
          var injected = false
          VersionedTable.commitMaintenance(path, snap, Seq("=" + batch),
            maxRetries = 3, beforeCommit = { _ =>
              if (!injected) {
                injected = true
                VersionedTable.append(o.filter(col("o_orderkey") % 3 === 2),
                  path)
              }
            })
          // post-merge delete: the merged manifest must anti-join right
          VersionedTable.deleteKeys(
            Tables.orders(s, d).filter(col("o_orderkey") % 10 === 7)
              .select(col("o_orderkey")), "o_orderkey", path)
        }
        VersionedTable.readLatest(s, path)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
      } finally s.conf.unset(VersionedTable.CommitModeConf)
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      WHERE o_orderkey % 10 <> 7
      GROUP BY 1
    """.trim))

  /** TYPE WIDENING as a zero-rewrite migration — q263's add-a-column
    * evolution completed with the other migration users expect: an
    * epoch-1 batch commits `l_linenumber` as INT and `qty` as FLOAT;
    * the epoch-2 batch arrives post-migration with LONG / DOUBLE and
    * a brand-new `tax_c` column. `readAtWidened` reads BOTH epochs
    * under the widened schema (int->long, float->double — Spark's
    * vectorized reader promotes on scan, no data rewritten; the new
    * column null-fills backwards), and the refusal matrix for lossy
    * pairs (long->double, narrowings, type changes) is spec-proven
    * in VersionedWideningSpec. The oracle recomputes the mixed-epoch
    * aggregate relationally: a mis-promoted value, a lost row, or a
    * wrongly-backfilled column breaks the hash. TPC-H quantities are
    * small integers, so the float epoch is value-exact by
    * construction — the widened double sum is an equality, not an
    * approximation.
    */
  val q298 = GraftQuery(
    "q298_versioned_type_widening",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q298_vt_widen_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val li = Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_returnflag"), col("l_linenumber"), col("l_quantity"))
        // epoch 1: narrow types
        VersionedTable.append(
          li.filter(col("l_orderkey") % 2 === 0)
            .select(col("l_returnflag"),
              col("l_linenumber").cast("int").as("line_no"),
              col("l_quantity").cast("float").as("qty")), path)
        // epoch 2: widened types + a new column
        VersionedTable.append(
          li.filter(col("l_orderkey") % 2 === 1)
            .select(col("l_returnflag"),
              col("l_linenumber").cast("long").as("line_no"),
              col("l_quantity").cast("double").as("qty"))
            .withColumn("tax_c",
              (col("line_no") * 7L).cast("long")), path)
      }
      VersionedTable.readAtWidened(s, path, 2L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("line_no")).as("sum_line_no"),
          sum(col("qty")).cast("long").as("sum_qty"),
          sum(col("tax_c")).as("sum_tax_c"))
    },
    Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_line_no,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             CAST(sum(CASE WHEN l_orderkey % 2 = 1
                           THEN l_linenumber * 7 END) AS BIGINT) AS sum_tax_c
      FROM lineitem
      GROUP BY 1
    """.trim))

  /** STREAMING SINK — the connector closed on the write side: a
    * table-to-table incremental pipeline with NO foreachBatch
    * plumbing at all. `readStream.format("graft")` (offsets are
    * versions) feeds a row-level transform into
    * `writeStream.format("graft")`, whose sink commits each
    * micro-batch atomically under txnId = "<checkpoint>-<batchId>" —
    * source WAL + sink txn guard give exactly-once end to end across
    * the mid-pipeline restart this build performs (run 1 drains the
    * snapshot; a compaction and fresh commits land; run 2 resumes
    * from the WAL). A third idle run proves steady state commits
    * nothing. The oracle recomputes the transform over the base
    * table: one lost, duplicated, or re-delivered micro-batch —
    * or a re-delivered compaction — breaks the hash.
    */
  val q299 = GraftQuery(
    "q299_versioned_stream_sink",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val src = s"/tmp/graft_q299_vt_src_$suffix"
      val ckpt = s"/tmp/graft_q299_vt_ckpt_$suffix"
      val dst = s"/tmp/graft_q299_vt_dst_$suffix"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(src).exists(_ >= 3L) &&
        exists(ckpt) && VersionedTable.latestVersion(dst).nonEmpty
      if (!complete) {
        Seq(src, ckpt, dst).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        def drain(): Unit = {
          val q = s.readStream.format("graft").load(src)
            .withColumn("half_c", floor(col("total_c") / lit(2L)).cast("long"))
            .writeStream.format("graft")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start(dst)
          q.awaitTermination(120000)
          ()
        }
        VersionedTable.append(o.filter(col("o_orderdate") < cut)
          .drop("o_orderdate"), src)
        drain()
        VersionedTable.compact(s, src) // must stay silent downstream
        VersionedTable.append(o.filter(col("o_orderdate") >= cut)
          .drop("o_orderdate"), src)
        drain() // resumes from the WAL across the "restart"
        drain() // steady state: commits nothing
      }
      VersionedTable.readLatest(s, dst)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total_c")).as("total_c"),
          sum(col("half_c")).as("half_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) // 2) AS BIGINT) AS half_c
      FROM orders
      GROUP BY 1
    """.trim))

  /** STREAMING CDC REPLICATION — the change-data-capture loop closed
    * end to end: `readStream.format("graft").option("readChangeFeed",
    * true)` delivers the FULL feed — `_change_type`-tagged inserts
    * AND the deleted rows, an upsert as its preimage/postimage pair —
    * and a foreachBatch applier maintains an exact REPLICA versioned
    * table (deletes leg then inserts leg, each txn-guarded per
    * batchId, so replays no-op on both). `maxVersionsPerTrigger = 1`
    * keeps each micro-batch one source commit — the clean CDC unit.
    * The source lifecycle covers every change kind: append, keyed
    * delete, an upsert that also RESURRECTS deleted urgent keys with
    * corrected totals, a compaction (must stay silent through CDC
    * mode too), and a late append — split across two AvailableNow
    * runs so the WAL restart is exercised. The oracle recomputes the
    * final replica relationally: one lost delete, one double-applied
    * preimage, or one re-delivered compaction breaks the hash.
    */
  val q300 = GraftQuery(
    "q300_versioned_cdc_replication",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val src = s"/tmp/graft_q300_vt_src_$suffix"
      val ckpt = s"/tmp/graft_q300_vt_ckpt_$suffix"
      val rep = s"/tmp/graft_q300_vt_rep_$suffix"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(src).exists(_ >= 5L) &&
        exists(ckpt) && VersionedTable.latestVersion(rep).nonEmpty
      if (!complete) {
        Seq(src, ckpt, rep).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        val cut = lit("1997-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderdate"))
        def drain(): Unit = {
          val q = s.readStream.format("graft")
            .option("readChangeFeed", "true")
            .option("maxVersionsPerTrigger", "1").load(src)
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
              val dels = df.filter(col("_change_type") === "delete")
                .select(col("o_orderkey"))
              if (!dels.isEmpty)
                VersionedTable.deleteKeys(dels, "o_orderkey", rep,
                  txnId = Some(s"cdcd-$id"))
              val ins = df.filter(col("_change_type") === "insert")
                .drop("_change_type")
              if (!ins.isEmpty)
                VersionedTable.append(ins, rep, txnId = Some(s"cdci-$id"))
              ()
            }.start()
          q.awaitTermination(120000)
          ()
        }
        // v1 snapshot + v2 keyed delete
        VersionedTable.append(o.filter(col("o_orderdate") < cut)
          .drop("o_orderdate"), src)
        VersionedTable.deleteKeys(
          Tables.orders(s, d).filter(col("o_orderdate") < cut &&
            col("o_orderkey") % 10 === 3).select(col("o_orderkey")),
          "o_orderkey", src)
        drain()
        // v3 upsert: urgent pre-cut corrections (+10000), resurrecting
        // deleted urgent keys; v4 compaction (silent); v5 late append
        val corrections = Tables.orders(s, d)
          .filter(col("o_orderdate") < cut &&
            col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"),
            (round(col("o_totalprice") * 100).cast("long") + 10000L)
              .as("total_c"))
        VersionedTable.upsert(corrections, "o_orderkey", src)
        VersionedTable.compact(s, src)
        VersionedTable.append(o.filter(col("o_orderdate") >= cut)
          .drop("o_orderdate"), src)
        drain()
      }
      VersionedTable.readLatest(s, rep)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
               o_orderdate
        FROM orders),
      kept_pre AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN total_c + 10000 ELSE total_c END AS total_c
        FROM base
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
          AND (o_orderpriority = '1-URGENT' OR o_orderkey % 10 <> 3)),
      final AS (
        SELECT * FROM kept_pre
        UNION ALL
        SELECT o_orderstatus, total_c FROM base
        WHERE o_orderdate >= TIMESTAMP '1997-01-01')
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM final GROUP BY 1
    """.trim))

  /** SQL UPDATE — the fourth DML verb, completing
    * INSERT/MERGE/DELETE (q296): `UPDATE ... SET c = expr WHERE p`
    * re-projects the matched rows of the CURRENT auto-pruned view
    * with the assignments (resolved at run time, so `SET total_c =
    * total_c + 10000` reads the pre-update value) and commits ONE
    * last-writer-wins upsert — matched keys replaced atomically,
    * unmatched rows untouched, history time-travelable, key-column
    * updates refused (spec). Two sequential UPDATEs compose (the
    * second reads the first's result — a second commit), and the
    * oracle replays both as nested CASEs: a double-applied
    * assignment, a lost unmatched row, or an update leaking outside
    * its WHERE breaks the hash.
    */
  val q301 = GraftQuery(
    "q301_versioned_sql_update",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q301_vt_upd_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.sql.GraftSql.register("q301_orders", path, "o_orderkey")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        VersionedTable.append(
          Tables.orders(s, d).select(col("o_orderkey"),
            col("o_orderstatus"), col("o_orderpriority"),
            round(col("o_totalprice") * 100).cast("long").as("total_c")),
          path)
        s.sql("""
          UPDATE q301_orders SET total_c = total_c + 10000
          WHERE o_orderpriority = '1-URGENT'""")
        s.sql("""
          UPDATE q301_orders
          SET total_c = total_c * 2, o_orderstatus = lower(o_orderstatus)
          WHERE o_orderkey % 100 = 7""")
        // the maintenance loop after heavy updates: OPTIMIZE folds the
        // two upserts' tombstones so the steady-state read stops
        // paying the merge-on-read anti-join (content-neutral — the
        // oracle hash is unchanged by construction, and q300 keeps
        // the unfolded form as the measured merge-on-read price)
        VersionedTable.compact(s, path)
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH u1 AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) + 10000
                    ELSE CAST(round(o_totalprice * 100) AS BIGINT)
               END AS total_c
        FROM orders),
      u2 AS (
        SELECT CASE WHEN o_orderkey % 100 = 7 THEN lower(o_orderstatus)
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 100 = 7 THEN total_c * 2
                    ELSE total_c END AS total_c
        FROM u1)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM u2 GROUP BY 1
    """.trim))

  private def graftCatalog(s: org.apache.spark.sql.SparkSession): graft.catalog.GraftCatalog =
    s.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]

  /** THE CATALOG LIFECYCLE, entirely from SQL text with ZERO
    * `register()` calls — the round-13 headline: the DSv2
    * `TableCatalog` (`spark.sql.catalog.graft`) makes versioned
    * tables first-class NAMES. Every statement here is what a
    * JDBC-only user types:
    *
    *   1. `CREATE TABLE graft.t (...) TBLPROPERTIES('key'=...)` —
    *      the catalog persists schema + merge key as KB-sized file
    *      metadata next to the manifests (no metastore);
    *   2. two `INSERT INTO graft.t SELECT ...` — Spark's NATIVE V2
    *      write resolution conforms the query to the declared
    *      columns, then the V1Write fallback commits atomically
    *      (vectorized write path kept — the documented Delta trade);
    *   3. a CONDITIONAL `MERGE INTO graft.t` with a partial `UPDATE
    *      SET`, a fallthrough `DELETE`, and a conditional explicit
    *      column-list `INSERT` — first-match-wins clause order, one
    *      atomic tombstone+data commit, key resolved from
    *      TBLPROPERTIES. This is exactly the statement the two-star
    *      restriction used to refuse;
    *   4. the final `SELECT ... FROM graft.t` resolves through the
    *      catalog and swaps to the V1 readAtAuto plan at analysis
    *      (GraftV2Resolution) — vectorized scan + stats pruning.
    *
    * The oracle recomputes the whole lifecycle relationally: a
    * mis-conformed insert, a clause applied out of order, an
    * under-deleted key, or a null-filled column gone wrong breaks
    * the hash.
    */
  val q302 = GraftQuery(
    "q302_catalog_sql_lifecycle",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q302_orders_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, o_orderstatus STRING, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q302_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q302_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q302_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
        s.sql("""
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) AS total_c
          FROM q302_base WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_orderkey + 100000000, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) AS total_c
          FROM q302_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q302_src")
        s.sql(s"""
          MERGE INTO graft.$table AS t USING q302_src AS s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.total_c > 15000000
            THEN UPDATE SET total_c = s.total_c + 10000
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED AND s.total_c % 2 = 0
            THEN INSERT (o_orderkey, o_orderstatus, total_c)
                 VALUES (s.o_orderkey, 'N', s.total_c)""")
      }
      s.sql(s"""
        SELECT o_orderstatus, CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(total_c) AS LONG) AS total_c
        FROM graft.$table GROUP BY 1""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      live AS (
        SELECT o_orderstatus, total_c + 10000 AS total_c
        FROM base
        WHERE o_orderpriority = '1-URGENT' AND total_c > 15000000
        UNION ALL
        SELECT o_orderstatus, total_c FROM base
        WHERE o_orderpriority <> '1-URGENT'
        UNION ALL
        SELECT 'N' AS o_orderstatus, total_c FROM base
        WHERE o_orderpriority = '1-URGENT' AND total_c % 2 = 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** THE SQL MAINTENANCE LOOP — q300 measured merge-on-read CDC debt
    * at a 3× read slope and q301 retired it FROM SCALA; this closes
    * the operational gap the round-12 verdict ranked #2: the same
    * loop, every statement SQL text over a catalog name. UPDATE and
    * DELETE accumulate tombstone debt (merge-on-read, no rewrite);
    * `OPTIMIZE graft.t` folds it through maintenance OCC; `VACUUM
    * graft.t RETAIN 2 VERSIONS` drops expired history (retention is
    * EXPLICIT — refusing a bare VACUUM is spec'd). Maintenance never
    * changes content: the oracle replays only the logical
    * UPDATE/DELETE — an OPTIMIZE or VACUUM that altered one row
    * would break the hash, and reading AFTER the vacuum proves the
    * kept window serves the full content.
    */
  val q303 = GraftQuery(
    "q303_catalog_sql_maintenance",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q303_orders_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, o_orderpriority STRING, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q303_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderpriority,
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q303_base""")
        s.sql(s"""UPDATE graft.$table SET total_c = total_c + 5000
          WHERE o_orderpriority = '2-HIGH'""")
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 50 = 13")
        // debt is now 2 tombstone entries; retire and trim from SQL
        s.sql(s"OPTIMIZE graft.$table")
        s.sql(s"VACUUM graft.$table RETAIN 2 VERSIONS")
      }
      s.sql(s"""
        SELECT o_orderpriority, CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(total_c) AS LONG) AS total_c
        FROM graft.$table GROUP BY 1""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      u AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderpriority = '2-HIGH' THEN total_c + 5000
                    ELSE total_c END AS total_c
        FROM base),
      live AS (SELECT * FROM u WHERE o_orderkey % 50 <> 13)
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** STRING-TYPED CLUSTERING — the last typed-layout refusal lifted
    * (round-12 verdict #3): `compactByRange` on a STRING column. The
    * rank space strings lack is built with the `Layout.globalRank`
    * discipline — distinct values globally ranked under binary UTF8
    * order (a distributed range-sort, never a one-partition window),
    * boundary VALUES at ranks i·n/k, only k-1 strings on the driver.
    * Customers arrive in two arrival-order commits with no stats
    * (nothing prunes); clustering on `c_name` rewrites them into 4
    * name-ranges, each bucket's manifest entry carrying `@s` hex
    * prefix stats — so the plain string-range filter here prunes
    * batch dirs from literals (StringClusteringSpec proves the
    * strict inputFiles subset, the q282 measured-asymmetry
    * discipline). Content-identical by construction: the oracle
    * recomputes both slices from the immutable customer table.
    */
  val q304 = GraftQuery(
    "q304_versioned_string_clustering",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q304_vt_strcluster_" +
        d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("nat"),
          round(col("c_acctbal") * 100).cast("long").as("bal_c"))
        // arrival order by key parity, deliberately stats-less
        VersionedTable.append(c.filter(col("c_custkey") % 2 === 0), path)
        VersionedTable.append(c.filter(col("c_custkey") % 2 === 1), path)
        VersionedTable.compactByRange(s, path, "c_name", nBuckets = 4)
      }
      val t = VersionedTable.readAtAuto(s, path, version = 3L)
      val slice = t.filter(col("c_name") >= lit("Customer#000000050") &&
          col("c_name") < lit("Customer#000000120"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_c"))
        .withColumn("slice", lit("name_range"))
      val full = t
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_c"))
        .withColumn("slice", lit("full"))
      slice.unionByName(full)
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c,
             'name_range' AS slice
      FROM customer
      WHERE c_name >= 'Customer#000000050' AND c_name < 'Customer#000000120'
      UNION ALL
      SELECT CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c,
             'full' AS slice
      FROM customer
    """.trim))

  /** CTAS THROUGH THE CATALOG — `CREATE TABLE graft.t AS SELECT`
    * (round-12 verdict #6): Spark plans the create + write natively
    * (catalog createTable, then the V1Write fallback commits the
    * query result as version 1), a follow-up `INSERT INTO` appends
    * as version 2, and the read-back resolves by name through the
    * V1 plan swap. The oracle recomputes the CTAS predicate plus the
    * appended complement — a dropped CTAS row or a double-committed
    * append breaks the hash.
    */
  val q305 = GraftQuery(
    "q305_catalog_ctas",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q305_cust_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        Tables.customer(s, d).createOrReplaceTempView("q305_base")
        s.sql(s"""
          CREATE TABLE graft.$table AS
          SELECT c_custkey, CAST(c_nationkey AS LONG) AS nat,
                 CAST(round(c_acctbal * 100) AS LONG) AS bal_c
          FROM q305_base WHERE c_acctbal >= 0""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT c_custkey, CAST(c_nationkey AS LONG),
                 CAST(round(c_acctbal * 100) AS LONG)
          FROM q305_base WHERE c_acctbal < 0""")
      }
      s.sql(s"""
        SELECT nat, CAST(count(*) AS LONG) AS n_cust,
               CAST(sum(bal_c) AS LONG) AS bal_c
        FROM graft.$table GROUP BY 1""")
    },
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nat,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
      FROM customer GROUP BY 1
    """.trim))

  /** CONDITIONAL MERGE ARITHMETIC over a REGISTERED name — the
    * generalized read-modify-write exercised where it is easiest to
    * get subtly wrong: a partial `UPDATE SET` whose expression reads
    * BOTH sides (`t.total_c + s.delta` — the pre-update target value
    * joined to the source), a fallthrough `DELETE`, and
    * first-match-wins precedence between them. Untouched rows are
    * never rewritten (the new data batch carries only matched rows —
    * GraftMergeFormsSpec proves the batch size), and the whole
    * statement is ONE tombstone+data commit. The oracle replays the
    * clause logic as a CASE over the join.
    */
  val q306 = GraftQuery(
    "q306_versioned_merge_conditional",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q306_vt_mergecond_" +
        d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.sql.GraftSql.register("q306_orders", path, "o_orderkey")
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        VersionedTable.append(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("total_c")),
          path)
        Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"),
            (col("o_orderkey") % 1000).cast("long").as("delta"))
          .createOrReplaceTempView("q306_src")
        s.sql("""
          MERGE INTO q306_orders AS t USING q306_src AS s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND t.total_c < 10000000
            THEN UPDATE SET total_c = t.total_c + s.delta
          WHEN MATCHED THEN DELETE""")
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      live AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 AND total_c < 10000000
                    THEN total_c + (o_orderkey % 1000) ELSE total_c
               END AS total_c
        FROM base
        WHERE NOT (o_orderkey % 7 = 0 AND total_c >= 10000000))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** AUTO-OPTIMIZE POLICY — the q300/q301 teaching pair turned into a
    * KNOB (round-12 verdict #7): six sequential upserts each leave a
    * tombstone entry (merge-on-read debt), and after each commit the
    * writer consults `maybeCompact(threshold = 3)` — a METADATA-ONLY
    * gate (one KB-sized manifest read) that compacts exactly when the
    * latest manifest carries 3 tombstones. Debt therefore cycles
    * 1→2→3→fold→1→2→3→fold and the query emits the FINAL DEBT as a
    * hash-checked column: the oracle pins it at ZERO — a measured
    * zero, not a prose claim. Content is recomputed relationally
    * (each upsert rewrites total_c from the base, so a lost or
    * double-applied correction breaks the hash); AutoOptimizeSpec
    * proves the read plan stays a single-relation scan (~1× slope)
    * and that the streaming sink's `autoCompactTombstones` option
    * drives the same hook.
    */
  val q307 = GraftQuery(
    "q307_versioned_auto_optimize",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q307_vt_autoopt_" +
        d.replaceAll("[^A-Za-z0-9.]", "_")
      if (!VersionedTable.latestVersion(path).exists(_ >= 9L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"))
        VersionedTable.append(o, path)
        (0 until 6).foreach { i =>
          VersionedTable.upsert(
            o.filter(col("o_orderkey") % 6 === i)
              .withColumn("total_c", col("total_c") + lit(1000L * (i + 1))),
            "o_orderkey", path)
          VersionedTable.maybeCompact(s, path, tombstoneThreshold = 3)
        }
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
        .withColumn("final_debt",
          lit(VersionedTable.tombstoneDebt(path).toLong))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                      + 1000 * ((o_orderkey % 6) + 1)) AS BIGINT) AS total_c,
             CAST(0 AS BIGINT) AS final_debt
      FROM orders GROUP BY 1
    """.trim))

  /** STREAMING SCHEMA EVOLUTION — the `widen` option on the SOURCE
    * (round-12 verdict #5; the batch connector gained it in r12): a
    * stream declared under the WIDENED schema delivers mixed-epoch
    * batches — int/float epochs promote natively on scan
    * (SPARK-40876), the post-migration column null-fills backwards —
    * across an initial snapshot AND a post-start narrow append
    * (second AvailableNow run, resuming from the WAL). Every
    * delivered batch is footer-checked BEFORE the scan: a batch that
    * does not widen INTO the declared schema refuses loudly naming
    * the restart contract (both refusal legs spec'd in
    * StreamingWidenSpec — previously this was UNDEFINED: new columns
    * silently dropped, type changes crashed mid-scan). The oracle
    * recomputes the mixed-epoch aggregate from lineitem; quantities
    * are small integers, so the float epoch is value-exact and the
    * widened double sum is an equality.
    */
  val q308 = GraftQuery(
    "q308_versioned_stream_widen",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val suffix = d.replaceAll("[^A-Za-z0-9.]", "_")
      val src = s"/tmp/graft_q308_vt_src_$suffix"
      val ckpt = s"/tmp/graft_q308_vt_ckpt_$suffix"
      val dst = s"/tmp/graft_q308_vt_dst_$suffix"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(src).exists(_ >= 3L) &&
        exists(ckpt) && VersionedTable.latestVersion(dst).nonEmpty
      if (!complete) {
        Seq(src, ckpt, dst).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        val li = Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_returnflag"), col("l_linenumber"), col("l_quantity"))
        def drain(): Unit = {
          val q = s.readStream.format("graft").option("widen", "true")
            .load(src)
            .writeStream.format("graft")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start(dst)
          q.awaitTermination(120000)
          ()
        }
        // epoch 1: narrow types (int/float), pre-migration
        VersionedTable.append(
          li.filter(col("l_orderkey") % 2 === 0)
            .select(col("l_returnflag"),
              col("l_linenumber").cast("int").as("line_no"),
              col("l_quantity").cast("float").as("qty")), src)
        // epoch 2: the migration — long/double plus a new column
        VersionedTable.append(
          li.filter(col("l_orderkey") % 4 === 1)
            .select(col("l_returnflag"),
              col("l_linenumber").cast("long").as("line_no"),
              col("l_quantity").cast("double").as("qty"))
            .withColumn("tax_c", (col("line_no") * 7L).cast("long")), src)
        drain() // initial snapshot: BOTH epochs under the widened schema
        // a post-start NARROW append: the running declaration widens it
        VersionedTable.append(
          li.filter(col("l_orderkey") % 4 === 3)
            .select(col("l_returnflag"),
              col("l_linenumber").cast("int").as("line_no"),
              col("l_quantity").cast("float").as("qty")), src)
        drain() // resumes from the WAL, promotes on scan
      }
      VersionedTable.readLatest(s, dst)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("line_no")).as("sum_line_no"),
          sum(col("qty")).cast("long").as("sum_qty"),
          sum(col("tax_c")).as("sum_tax_c"))
    },
    Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_line_no,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             CAST(sum(CASE WHEN l_orderkey % 4 = 1
                           THEN l_linenumber * 7 END) AS BIGINT) AS sum_tax_c
      FROM lineitem
      GROUP BY 1
    """.trim))

  /** `DESCRIBE HISTORY` ORACLE-GATED — the SQL verb's OUTPUT is the
    * hash-checked result, not just a spec assertion: a deterministic
    * commit sequence (two appends, a delete, an update-upsert, an
    * OPTIMIZE) is built entirely from SQL over a catalog name, and
    * the commit log's (version, kind, n_add, n_delete) classification
    * must equal a literal oracle row-for-row. The kinds derive purely
    * from manifest entry deltas (metadata-only at any table size):
    * a misclassified commit — an upsert read as delete, a compaction
    * leaking into the adds — breaks the hash. Complements q285 (the
    * Scala `history` over a path) with the catalog-name SQL verb.
    */
  val q309 = GraftQuery(
    "q309_catalog_describe_history",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q309_orders_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q309_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q309_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q309_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 3 = 0")
        s.sql(s"""UPDATE graft.$table SET total_c = total_c + 1
          WHERE o_orderkey % 2 = 0""")
        s.sql(s"OPTIMIZE graft.$table")
      }
      s.sql(s"DESCRIBE HISTORY graft.$table")
        .select(col("version"), col("kind"), col("n_add"), col("n_delete"))
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'append',  CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(2 AS BIGINT), 'append',  CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(3 AS BIGINT), 'delete',  CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        (CAST(4 AS BIGINT), 'upsert',  CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        (CAST(5 AS BIGINT), 'compact', CAST(1 AS BIGINT), CAST(0 AS BIGINT))
      ) AS t(version, kind, n_add, n_delete)
    """.trim))

  /** THE ROUND-13 COMPOSITION (the q279/q290 discipline): every
    * component this round shipped, chained under ONE oracle, with a
    * NAME as the only handle — no path, no register(), no Scala API:
    *
    *   1. CTAS with TBLPROPERTIES (key declared at creation);
    *   2. a second native INSERT commit;
    *   3. a conditional MERGE: partial SET reading both sides
    *      (`t.price_c - s.disc_c`) with a fallthrough DELETE;
    *   4. `OPTIMIZE ... ZORDER BY (ship_d, o_orderkey) BUCKETS 8`
    *      from SQL text — typed DATE stats re-recorded per
    *      bucket through the maintenance verb;
    *   5. the final read by name takes a DATE range slice that
    *      the z-clustered layout prunes via the catalog read's V1
    *      swap + the stats rule (the same machinery q282/q291 prove
    *      measurably; here it carries the composition's answer).
    *
    * One wrong row anywhere in the chain — a mis-keyed CTAS, a
    * clause out of order, a correction applied to the wrong priority, an
    * OPTIMIZE that altered content — breaks the hash.
    */
  val q310 = GraftQuery(
    "q310_catalog_lakehouse_recipe",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q310_ord_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        Tables.orders(s, d).createOrReplaceTempView("q310_base")
        s.sql(s"""
          CREATE TABLE graft.$table TBLPROPERTIES('key'='o_orderkey') AS
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG) AS price_c,
                 CAST(o_orderdate AS DATE) AS ship_d
          FROM q310_base WHERE o_orderkey % 2 = 0""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG),
                 CAST(o_orderdate AS DATE)
          FROM q310_base WHERE o_orderkey % 2 = 1""")
        s.sql("""
          SELECT o_orderkey, CAST(o_orderkey % 1000 AS LONG) AS disc_c
          FROM q310_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q310_src")
        s.sql(s"""
          MERGE INTO graft.$table AS t USING q310_src AS s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.disc_c > 0
            THEN UPDATE SET price_c = t.price_c - s.disc_c
          WHEN MATCHED THEN DELETE""")
        s.sql(s"OPTIMIZE graft.$table ZORDER BY (ship_d, o_orderkey) " +
          "BUCKETS 8")
      }
      s.sql(s"""
        SELECT o_orderstatus, CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(price_c) AS LONG) AS price_c
        FROM graft.$table
        WHERE ship_d >= DATE '1995-01-01' AND ship_d < DATE '1996-01-01'
        GROUP BY 1""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
               CAST(o_orderdate AS DATE) AS ship_d
        FROM orders),
      live AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 1000 > 0
                    THEN price_c - (o_orderkey % 1000) ELSE price_c
               END AS price_c,
               ship_d
        FROM base
        WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 1000 = 0))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(price_c) AS BIGINT) AS price_c
      FROM live
      WHERE ship_d >= DATE '1995-01-01' AND ship_d < DATE '1996-01-01'
      GROUP BY 1
    """.trim))

  /** COMPOSITE MERGE KEYS — the round-14 headline, run on the
    * REFERENCE'S OWN DATA MODEL: file_inventory keys on
    * (experiment_id, file_path) (`agf_ingestion_lambda.py:337`'s
    * conditional write), and until this round the catalog surface
    * could not declare a 2-column primary key. The inventory is
    * derived bijectively from orders (experiment_id = o_orderkey DIV
    * 97, file_path = 'part-' || o_orderkey % 97), so every
    * experiment holds many paths AND every path string recurs across
    * experiments — data where a single-component tombstone or
    * anti-join would corrupt neighbours the full key leaves alone.
    * The chain is names-only SQL: CREATE TABLE with
    * TBLPROPERTIES('key'='experiment_id,file_path'), INSERT, a
    * conditional MERGE whose ON conjoins both key equalities
    * (partial SET reading both sides, fallthrough DELETE, INSERT
    * column list assigning both keys), then a composite-predicate
    * DELETE. One wrong row anywhere — a tombstone keyed on one
    * column would delete ~1/97th of the table — breaks the hash.
    */
  val q311 = GraftQuery(
    "q311_catalog_composite_key_inventory",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q311_inv2_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (experiment_id BIGINT, file_path STRING, size_c BIGINT,
           status STRING)
          TBLPROPERTIES('key'='experiment_id,file_path')""")
        Tables.orders(s, d).createOrReplaceTempView("q311_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey DIV 97,
                 concat('part-', o_orderkey % 97),
                 CAST(round(o_totalprice * 100) AS LONG),
                 o_orderstatus
          FROM q311_base""")
        // "new" pairs shift the experiment id past the LIVE max id —
        // derived from the data, not a fixed offset, so no scale
        // factor can collide synthesized keys with live ones
        s.sql("""
          SELECT o_orderkey DIV 97 AS experiment_id,
                 concat('part-', o_orderkey % 97) AS file_path,
                 o_orderkey DIV 97
                   + (SELECT 1 + max(o_orderkey) DIV 97 FROM q311_base)
                   AS new_eid,
                 concat('part-', o_orderkey % 97) AS new_fp,
                 CAST(o_orderkey % 1000 AS LONG) AS delta
          FROM q311_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q311_src")
        // matched on BOTH keys; updates read both sides; the
        // fallthrough DELETE tombstones (eid, fp) pairs; inserts are
        // genuinely new pairs (shifted eids) assigned via column list
        s.sql(s"""
          MERGE INTO graft.$table AS t USING q311_src AS s
          ON t.experiment_id = s.experiment_id AND t.file_path = s.file_path
          WHEN MATCHED AND s.delta > 500
            THEN UPDATE SET size_c = t.size_c + s.delta
          WHEN MATCHED THEN DELETE""")
        s.sql(s"""
          MERGE INTO graft.$table AS t
          USING (SELECT new_eid AS experiment_id, new_fp AS file_path,
                        delta
                 FROM q311_src WHERE delta % 2 = 0) AS s
          ON t.experiment_id = s.experiment_id
             AND t.file_path = s.file_path
          WHEN NOT MATCHED THEN INSERT (experiment_id, file_path, size_c,
            status) VALUES (s.experiment_id, s.file_path, s.delta, 'NEW')""")
      }
      s.sql(s"""
        SELECT status, CAST(count(*) AS LONG) AS n_files,
               CAST(sum(size_c) AS LONG) AS size_c
        FROM graft.$table GROUP BY 1""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderkey // 97 AS eid,
               'part-' || CAST(o_orderkey % 97 AS VARCHAR) AS fp,
               CAST(round(o_totalprice * 100) AS BIGINT) AS size_c,
               o_orderstatus AS status, o_orderpriority
        FROM orders),
      kept AS (
        SELECT eid, fp,
               CASE WHEN o_orderpriority = '1-URGENT' AND k % 1000 > 500
                    THEN size_c + (k % 1000) ELSE size_c END AS size_c,
               status
        FROM base
        WHERE NOT (o_orderpriority = '1-URGENT' AND k % 1000 <= 500)),
      ins AS (
        SELECT eid + (SELECT 1 + max(k) // 97 FROM base) AS eid, fp,
               k % 1000 AS size_c, 'NEW' AS status
        FROM base
        WHERE o_orderpriority = '1-URGENT' AND (k % 1000) % 2 = 0),
      live AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT status, CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(size_c) AS BIGINT) AS size_c
      FROM live GROUP BY 1
    """.trim))

  /** NATIVE ROW-LEVEL MERGE — the refusal matrix the round-13 verdict
    * listed, lifted in one statement and hash-gated: catalog DML now
    * resolves through Spark's OWN analyzer (SupportsRowLevelOperations
    * / SupportsDelta; `catalog/GraftRowLevel.scala`), so this MERGE
    * carries everything the command route refused —
    *
    *   - a NON-KEY conjunct in ON (`t.total_c < 30000000`): urgent
    *     orders with large totals are deliberately NOT matched;
    *   - `WHEN NOT MATCHED BY SOURCE` clauses (UPDATE and DELETE),
    *     first-match-wins between them;
    *   - an INSERT with an explicit column list over shifted keys
    *     (the unmatched-because-of-the-conjunct source rows backfill
    *     under NEW keys — inserting their own key would duplicate a
    *     live row, which is exactly why the conjunct form matters);
    *
    * committed as ONE tombstone+data manifest by the distributed
    * delta write (executor-side parquet, driver commit pinned at the
    * snapshot). The oracle replays all five clauses relationally; a
    * clause misordered, a tombstone too wide, or an absorbed
    * interleave breaks the hash.
    */
  val q312 = GraftQuery(
    "q312_catalog_native_rowlevel_merge",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q312_sync2_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, st STRING, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q312_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q312_base""")
        // backfill keys shift past the live max key (derived, not a
        // fixed offset — collision-free at any scale factor)
        s.sql("""
          SELECT o_orderkey,
                 o_orderkey + (SELECT 1 + max(o_orderkey) FROM q312_base)
                   AS new_k,
                 CAST(o_orderkey % 1000 AS LONG) AS delta
          FROM q312_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q312_src")
        s.sql(s"""
          MERGE INTO graft.$table AS t USING q312_src AS s
          ON t.o_orderkey = s.o_orderkey AND t.total_c < 30000000
          WHEN MATCHED AND s.delta % 3 = 0
            THEN UPDATE SET total_c = t.total_c + s.delta
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED AND s.delta % 5 = 0
            THEN INSERT (o_orderkey, st, total_c)
                 VALUES (s.new_k, 'BACKFILL', s.delta)
          WHEN NOT MATCHED BY SOURCE AND t.st = 'O' AND t.o_orderkey % 100 = 7
            THEN UPDATE SET total_c = t.total_c + 1
          WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 100 = 13
            THEN DELETE""")
      }
      s.sql(s"""
        SELECT st, CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(total_c) AS LONG) AS total_c
        FROM graft.$table GROUP BY 1""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               o_orderpriority = '1-URGENT' AS urg,
               o_orderkey % 1000 AS delta
        FROM orders),
      m AS (SELECT *, urg AND v < 30000000 AS matched FROM base),
      kept AS (
        SELECT k, st,
               CASE WHEN matched AND delta % 3 = 0 THEN v + delta
                    WHEN NOT matched AND st = 'O' AND k % 100 = 7 THEN v + 1
                    ELSE v END AS v
        FROM m
        WHERE NOT (matched AND delta % 3 <> 0)
          AND NOT (NOT matched AND NOT (st = 'O' AND k % 100 = 7)
                   AND k % 100 = 13)),
      ins AS (
        SELECT k + (SELECT 1 + max(k) FROM base) AS k, 'BACKFILL' AS st,
               delta AS v
        FROM m WHERE urg AND NOT matched AND delta % 5 = 0),
      live AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT st, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(v) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** `ALTER TABLE ADD COLUMNS` — DDL-FIRST schema evolution (declare,
    * then backfill), the round-13 verdict's #3: the column lands in
    * `_table.meta` with ZERO data rewritten; reads immediately serve
    * it NULL-filled for pre-migration batches (the explicit-schema
    * catalog read — deterministic across mixed-width batches, where
    * plain inference would be file-pick-order-dependent). The chain:
    * create + load (2 cols) → ALTER ADD priority → full-width
    * backfill INSERT under shifted keys → a native UPDATE that fills
    * the NULL column on exactly the pre-migration rows (reading the
    * NULL-filled view and writing full-width rows through the delta
    * route). Oracle: the union-with-NULLs recompute — a dropped
    * legacy row, a mis-filled NULL, or a backfill leaking into the
    * legacy slice breaks the hash.
    */
  val q313 = GraftQuery(
    "q313_catalog_alter_add_columns",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q313_mig2_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q313_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q313_base""")
        // declare the column: zero rewrites, reads NULL-fill it
        s.sql(s"ALTER TABLE graft.$table ADD COLUMNS (priority STRING)")
        // backfill NEW full-width rows under shifted keys — shifted
        // past the live max key (derived, collision-free at any SF)
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey + (SELECT 1 + max(o_orderkey) FROM q313_base),
                 CAST(round(o_totalprice * 100) AS LONG), o_orderpriority
          FROM q313_base WHERE o_orderpriority = '1-URGENT'""")
        // fill the declared column on the legacy rows — reads the
        // NULL-filled view, writes full-width through the delta route
        s.sql(s"""UPDATE graft.$table SET priority = 'LEGACY'
          WHERE priority IS NULL""")
      }
      s.sql(s"""
        SELECT priority, CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(total_c) AS LONG) AS total_c
        FROM graft.$table GROUP BY 1""")
    },
    Some("""
      WITH legacy AS (
        SELECT 'LEGACY' AS priority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      backfill AS (
        SELECT o_orderpriority AS priority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders WHERE o_orderpriority = '1-URGENT'),
      live AS (SELECT * FROM legacy UNION ALL SELECT * FROM backfill)
      SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** SQL TIME TRAVEL THROUGH THE CATALOG, oracle-gated end-to-end
    * (round-13 verdict #4; only a spec covered it before): a
    * deterministic SQL-built lifecycle — two INSERTs, a DELETE, a
    * native UPDATE — then ONE result reading every retained version
    * via `VERSION AS OF n` plus the current view via `TIMESTAMP AS
    * OF` a far-future literal (resolving through the manifest-mtime
    * clock to the latest version). The oracle recomputes each
    * version's state relationally: a version resolving to the wrong
    * manifest, a tombstone leaking across versions, or timestamp
    * resolution drifting off latest breaks the hash.
    */
  val q314 = GraftQuery(
    "q314_catalog_sql_time_travel",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q314_tt_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q314_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q314_base WHERE o_orderdate < TIMESTAMP '1996-01-01'""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q314_base WHERE o_orderdate >= TIMESTAMP '1996-01-01'""")
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 7 = 2")
        s.sql(s"""UPDATE graft.$table SET total_c = total_c + 100
          WHERE o_orderkey % 5 = 0""")
      }
      (1 to 4).map { v =>
        s.sql(s"""
          SELECT CAST($v AS LONG) AS at, CAST(count(*) AS LONG) AS n_orders,
                 CAST(sum(total_c) AS LONG) AS total_c
          FROM graft.$table VERSION AS OF $v""")
      }.reduce(_ unionByName _).unionByName(
        s.sql(s"""
          SELECT CAST(5 AS LONG) AS at, CAST(count(*) AS LONG) AS n_orders,
                 CAST(sum(total_c) AS LONG) AS total_c
          FROM graft.$table TIMESTAMP AS OF '2100-01-01'"""))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderdate,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v
        FROM orders),
      v1 AS (SELECT k, v FROM base WHERE o_orderdate < TIMESTAMP '1996-01-01'),
      v2 AS (SELECT k, v FROM base),
      v3 AS (SELECT k, v FROM v2 WHERE k % 7 <> 2),
      v4 AS (SELECT k, CASE WHEN k % 5 = 0 THEN v + 100 ELSE v END AS v
             FROM v3)
      SELECT CAST(1 AS BIGINT) AS at, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(v) AS BIGINT) AS total_c FROM v1
      UNION ALL SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(v) AS BIGINT) FROM v2
      UNION ALL SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(v) AS BIGINT) FROM v3
      UNION ALL SELECT CAST(4 AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(v) AS BIGINT) FROM v4
      UNION ALL SELECT CAST(5 AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(v) AS BIGINT) FROM v4
    """.trim))

  /** HIVE-LAYOUT EXPORT INTEROP (round-13 verdict #5): the versioned
    * table refuses PARTITIONED BY (clustering subsumes it for
    * pruning), but external readers expecting `col=value` dirs — the
    * reference's own S3 layout contract (SURVEY §1.1,
    * `agf_ingestion_lambda.py:76,183,261`) — get an explicit export:
    * the RESOLVED view (a delete and an upsert are applied first, so
    * the export proves merge-on-read resolution, not file copying)
    * lands as Hive-partitioned parquet, and the final aggregate reads
    * ONLY the exported tree through plain `spark.read.parquet` —
    * exactly what a foreign engine would do. The oracle recomputes
    * relationally: a tombstoned row leaking into the export, a lost
    * correction, or a partition landing under the wrong dir breaks
    * the hash (the q50 content-invariance discipline).
    */
  val q315 = GraftQuery(
    "q315_versioned_hive_export",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft_q315_vt_hive_$sfx"
      val exportDir = s"/tmp/graft_q315_export_$sfx"
      val conf = s.sparkContext.hadoopConfiguration
      def ok(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir + "/_SUCCESS")
        p.getFileSystem(conf).exists(p)
      }
      if (!(VersionedTable.latestVersion(path).exists(_ >= 3L) &&
          ok(exportDir))) {
        Seq(path, exportDir).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"))
        VersionedTable.append(o, path)
        VersionedTable.deleteKeys(
          o.filter(col("o_orderkey") % 11 === 3).select(col("o_orderkey")),
          "o_orderkey", path)
        // corrections exclude the deleted slice: an upsert would
        // re-insert those keys (position-scoped tombstones only
        // retire PRIOR rows), which is upsert semantics, not this
        // query's intent
        VersionedTable.upsert(
          o.filter(col("o_orderkey") % 9 === 0 &&
              col("o_orderkey") % 11 =!= 3)
            .withColumn("total_c", col("total_c") + 7L),
          "o_orderkey", path)
        VersionedTable.exportHiveLayout(s, path,
          VersionedTable.latestVersion(path).get,
          Seq("o_orderstatus"), exportDir)
      }
      // the foreign-engine read: plain parquet over the exported tree
      s.read.parquet(exportDir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders),
      live AS (
        SELECT o_orderstatus,
               CASE WHEN k % 9 = 0 THEN total_c + 7 ELSE total_c END AS total_c
        FROM base WHERE k % 11 <> 3)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(total_c) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** THE ROUND-14 COMPOSITION (the q310 discipline): every component
    * this round shipped, chained under ONE oracle with a NAME as the
    * only handle:
    *
    *   1. CTAS declaring a COMPOSITE key ('experiment_id,file_path');
    *   2. a second native INSERT commit;
    *   3. `ALTER TABLE ADD COLUMNS (status)` — DDL-first migration;
    *   4. a native UPDATE backfilling the declared column on a
    *      SUBSET (reads the NULL-filled view, merge-on-read delta);
    *   5. a native five-clause MERGE on the composite key with a
    *      NON-KEY ON conjunct, partial SET reading both sides,
    *      fallthrough DELETE, column-list INSERT under shifted keys,
    *      and a NOT MATCHED BY SOURCE update;
    *   6. `OPTIMIZE ... RANGE BY experiment_id` from SQL — the
    *      maintenance rewrite reads the WIDENED union schema, so the
    *      mixed-width batches (pre/post-ALTER) keep every column;
    *   7. the answer: two range-pruned slices of the clustered
    *      layout plus a VERSION AS OF leg reading the pre-migration
    *      state through the catalog.
    *
    * One wrong row anywhere — a single-component tombstone, a stale
    * clause evaluation, a dropped column in the rewrite, a version
    * resolving wrong — breaks the hash.
    */
  val q316 = GraftQuery(
    "q316_catalog_round14_recipe",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      // _inv2: the round-15 derived-offset recipe changes the stored
      // ids, so the name changes too — an old-recipe table must never
      // satisfy the build guard against the new oracle
      val table = s"q316_inv2_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      // the base view feeds the final slicing too (the derived
      // backfill-id floor), so it registers outside the build guard
      Tables.orders(s, d).createOrReplaceTempView("q316_base")
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""
          CREATE TABLE graft.$table
          TBLPROPERTIES('key'='experiment_id,file_path') AS
          SELECT o_orderkey DIV 97 AS experiment_id,
                 concat('part-', o_orderkey % 97) AS file_path,
                 CAST(round(o_totalprice * 100) AS LONG) AS size_c
          FROM q316_base WHERE o_orderkey % 2 = 0""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey DIV 97, concat('part-', o_orderkey % 97),
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q316_base WHERE o_orderkey % 2 = 1""")
        s.sql(s"ALTER TABLE graft.$table ADD COLUMNS (status STRING)")
        s.sql(s"""UPDATE graft.$table SET status = 'BIG'
          WHERE size_c >= 20000000""")
        // backfill ids shift past the live max experiment id —
        // derived, so no scale factor collides them with live pairs
        s.sql("""
          SELECT o_orderkey DIV 97 AS experiment_id,
                 concat('part-', o_orderkey % 97) AS file_path,
                 o_orderkey DIV 97
                   + (SELECT 1 + max(o_orderkey) DIV 97 FROM q316_base)
                   AS new_eid,
                 CAST(o_orderkey % 1000 AS LONG) AS delta
          FROM q316_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q316_src")
        s.sql(s"""
          MERGE INTO graft.$table AS t USING q316_src AS s
          ON t.experiment_id = s.experiment_id
             AND t.file_path = s.file_path AND t.size_c < 30000000
          WHEN MATCHED AND s.delta % 3 = 0
            THEN UPDATE SET size_c = t.size_c + s.delta
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED AND s.delta % 4 = 0
            THEN INSERT (experiment_id, file_path, size_c, status)
                 VALUES (s.new_eid, s.file_path, s.delta, 'NEW')
          WHEN NOT MATCHED BY SOURCE AND t.status = 'BIG'
               AND t.experiment_id % 10 = 4
            THEN UPDATE SET size_c = t.size_c + 5""")
        s.sql(s"OPTIMIZE graft.$table RANGE BY experiment_id BUCKETS 8")
      }
      // two range-pruned slices of the clustered layout, plus time
      // travel to the pre-migration state (v2: both inserts, no
      // status column yet, original sizes)
      s.sql(s"""
        SELECT 'live' AS leg, coalesce(status, 'SMALL') AS grp,
               CAST(count(*) AS LONG) AS n_files,
               CAST(sum(size_c) AS LONG) AS size_c
        FROM graft.$table WHERE experiment_id < 1000 GROUP BY 2
        UNION ALL
        SELECT 'backfill', coalesce(status, 'SMALL'),
               CAST(count(*) AS LONG), CAST(sum(size_c) AS LONG)
        FROM graft.$table
        WHERE experiment_id >=
              (SELECT 1 + max(o_orderkey) DIV 97 FROM q316_base)
        GROUP BY 2""")
        .unionByName(s.sql(s"""
          SELECT 'v2' AS leg, 'all' AS grp,
                 CAST(count(*) AS LONG) AS n_files,
                 CAST(sum(size_c) AS LONG) AS size_c
          FROM graft.$table VERSION AS OF 2"""))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderkey // 97 AS eid,
               'part-' || CAST(o_orderkey % 97 AS VARCHAR) AS fp,
               CAST(round(o_totalprice * 100) AS BIGINT) AS size0,
               o_orderpriority = '1-URGENT' AS urg,
               o_orderkey % 1000 AS delta
        FROM orders),
      stA AS (
        SELECT *, CASE WHEN size0 >= 20000000 THEN 'BIG' END AS status
        FROM base),
      m AS (SELECT *, urg AND size0 < 30000000 AS matched FROM stA),
      kept AS (
        SELECT eid, fp,
               CASE WHEN matched AND delta % 3 = 0 THEN size0 + delta
                    WHEN NOT matched AND status = 'BIG' AND eid % 10 = 4
                      THEN size0 + 5
                    ELSE size0 END AS size_c,
               status
        FROM m WHERE NOT (matched AND delta % 3 <> 0)),
      ins AS (
        SELECT eid + (SELECT 1 + max(eid) FROM base) AS eid, fp,
               delta AS size_c, 'NEW' AS status
        FROM m WHERE urg AND NOT matched AND delta % 4 = 0),
      live AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT 'live' AS leg, coalesce(status, 'SMALL') AS grp,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(size_c) AS BIGINT) AS size_c
      FROM live WHERE eid < 1000 GROUP BY 2
      UNION ALL
      SELECT 'backfill', coalesce(status, 'SMALL'),
             CAST(count(*) AS BIGINT), CAST(sum(size_c) AS BIGINT)
      FROM live WHERE eid >= (SELECT 1 + max(eid) FROM base) GROUP BY 2
      UNION ALL
      SELECT 'v2', 'all', CAST(count(*) AS BIGINT),
             CAST(sum(size0) AS BIGINT)
      FROM base
    """.trim))

  /** `RESTORE TABLE ... TO VERSION AS OF` — the rollback verb
    * (Delta's RESTORE), METADATA-ONLY on this format: the restored
    * manifest's entries re-publish as the next version (KB-sized at
    * any table scale — batch dirs referenced by retained manifests
    * are still on disk), history preserved, the rewind itself a
    * commit. The lifecycle: insert → corrupting UPDATE → corrupting
    * DELETE → RESTORE to the pre-corruption version → one
    * post-restore correction INSERT proves the table lives on. The
    * result reads the restored state (== version 2's, so both
    * corruptions provably vanished), the PRE-restore corrupted state
    * via VERSION AS OF (time travel across the rewind — history is
    * never erased), and the commit-log classification where the
    * restore commit must read `restore`. All relational against
    * orders; a rewind that lost a row, resurrected a deleted one
    * too few times, or erased history breaks the hash.
    */
  val q317 = GraftQuery(
    "q317_catalog_restore",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q317_rst_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q317_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q317_base""")
        // the incident: a bad correction pass, then a bad delete
        s.sql(s"UPDATE graft.$table SET total_c = 0 WHERE o_orderkey % 3 = 1")
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 4 = 2")
        // the rollback — metadata-only, one KB-sized commit
        s.sql(s"RESTORE TABLE graft.$table TO VERSION AS OF 1")
        // life goes on after the rewind
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey + 40000000, CAST(1 AS LONG)
          FROM q317_base WHERE o_orderkey % 100 = 0""")
      }
      s.sql(s"""
        SELECT 'restored' AS leg, CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(total_c) AS LONG) AS total_c
        FROM graft.$table""")
        .unionByName(s.sql(s"""
          SELECT 'corrupted' AS leg, CAST(count(*) AS LONG) AS n_orders,
                 CAST(sum(total_c) AS LONG) AS total_c
          FROM graft.$table VERSION AS OF 3"""))
        .unionByName(s.sql(s"DESCRIBE HISTORY graft.$table")
          .selectExpr("concat('v', version, ':', kind) AS leg",
            "CAST(n_add AS LONG) AS n_orders",
            "CAST(n_delete AS LONG) AS total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v
        FROM orders),
      corrupted AS (
        SELECT k, CASE WHEN k % 3 = 1 THEN 0 ELSE v END AS v
        FROM base WHERE k % 4 <> 2),
      post AS (
        SELECT v FROM base
        UNION ALL
        SELECT CAST(1 AS BIGINT) FROM base WHERE k % 100 = 0)
      SELECT 'restored' AS leg, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(v) AS BIGINT) AS total_c FROM post
      UNION ALL
      SELECT 'corrupted', CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
      FROM corrupted
      UNION ALL
      SELECT * FROM (VALUES
        ('v1:append',  CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        ('v2:upsert',  CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        ('v3:delete',  CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        ('v4:restore', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        ('v5:append',  CAST(1 AS BIGINT), CAST(0 AS BIGINT))
      ) AS h(leg, n_orders, total_c)
    """.trim))

  /** COLUMN-MAPPING LIFECYCLE (round-15 verdict #1) — the last
    * schema-evolution refusals lifted and hash-gated in one chain:
    * ADD → RENAME → native UPDATE under the new name → DROP → INSERT
    * at the narrowed width, then reads at EVERY epoch. RENAME and
    * DROP are METADATA-ONLY (logical names over stable physical
    * parquet names, `catalog/GraftTableMeta.scala`); each
    * shape-changing ALTER fences a metadata-only manifest version so
    * `VERSION AS OF` resolves the names the table had THEN. The
    * result carries each slice's actual column list as a value — a
    * wrong epoch (new names at an old version, a dropped column
    * resurfacing, NULLs where the rename should have preserved data)
    * breaks the hash, not just a schema check. Synthesized keys are
    * derived from the live max key (no fixed-offset collision at any
    * SF — the round-14 ADVICE hazard, fixed at birth here). The
    * reference's experiments records carry drifting free-form
    * parameters (`agf_ingestion_lambda.py:296-298`) — this is the
    * migration path their long-lived table eventually needs.
    */
  val q318 = GraftQuery(
    "q318_catalog_column_mapping_lifecycle",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.DataFrame
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q318_lc_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 6L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (o_orderkey BIGINT, total_c BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q318_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q318_base""")                                       // v1
        s.sql(s"ALTER TABLE graft.$table ADD COLUMNS (pri STRING)")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey + (SELECT 1 + max(o_orderkey) FROM q318_base),
                 CAST(round(o_totalprice * 100) AS LONG), o_orderpriority
          FROM q318_base WHERE o_orderpriority = '1-URGENT'""")    // v2
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN total_c TO price_c")
        // ^ fences v3
        s.sql(s"""UPDATE graft.$table SET price_c = price_c + 7
          WHERE o_orderkey % 10 = 3""")                            // v4
        s.sql(s"ALTER TABLE graft.$table DROP COLUMN pri")         // fences v5
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey + 2 * (SELECT 1 + max(o_orderkey) FROM q318_base),
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q318_base WHERE o_orderpriority = '2-HIGH'""")      // v6
      }
      import org.apache.spark.sql.functions.{col, count, lit, sum}
      // each slice reports its ACTUAL columns as data, so the epoch
      // resolution itself is under the hash
      def slice(ver: String, df: DataFrame, sumCol: String,
          pri: Boolean): DataFrame =
        df.agg(count(lit(1)).cast("long").as("n_rows"),
            sum(col(sumCol)).cast("long").as("sum_c"),
            (if (pri) count(col("pri")) else lit(-1L)).cast("long")
              .as("pri_n"))
          .select(lit(ver).as("ver"),
            lit(df.columns.mkString(",")).as("cols"),
            col("n_rows"), col("sum_c"), col("pri_n"))
      slice("v1", s.sql(s"SELECT * FROM graft.$table VERSION AS OF 1"),
          "total_c", pri = true)
        .unionAll(slice("v2",
          s.sql(s"SELECT * FROM graft.$table VERSION AS OF 2"),
          "total_c", pri = true))
        .unionAll(slice("v4",
          s.sql(s"SELECT * FROM graft.$table VERSION AS OF 4"),
          "price_c", pri = true))
        .unionAll(slice("cur", s.table(s"graft.$table"), "price_c",
          pri = false))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS tc,
               o_orderpriority AS p
        FROM orders),
      off AS (SELECT 1 + max(k) AS o FROM base),
      v2 AS (
        SELECT k, tc, CAST(NULL AS VARCHAR) AS pri FROM base
        UNION ALL
        SELECT k + (SELECT o FROM off), tc, p FROM base
        WHERE p = '1-URGENT'),
      v4 AS (
        SELECT k, CASE WHEN k % 10 = 3 THEN tc + 7 ELSE tc END AS tc, pri
        FROM v2),
      cur AS (
        SELECT k, tc FROM v4
        UNION ALL
        SELECT k + 2 * (SELECT o FROM off), tc FROM base
        WHERE p = '2-HIGH')
      SELECT 'v1' AS ver, 'o_orderkey,total_c,pri' AS cols,
             count(*) AS n_rows, CAST(sum(tc) AS BIGINT) AS sum_c,
             CAST(0 AS BIGINT) AS pri_n
      FROM base
      UNION ALL
      SELECT 'v2', 'o_orderkey,total_c,pri', count(*),
             CAST(sum(tc) AS BIGINT), count(pri)
      FROM v2
      UNION ALL
      SELECT 'v4', 'o_orderkey,price_c,pri', count(*),
             CAST(sum(tc) AS BIGINT), count(pri)
      FROM v4
      UNION ALL
      SELECT 'cur', 'o_orderkey,price_c', count(*),
             CAST(sum(tc) AS BIGINT), CAST(-1 AS BIGINT)
      FROM cur
    """.trim))

  /** `ALTER COLUMN ... TYPE` AS DECLARED DDL (round-15 verdict #2):
    * q298 proved the zero-rewrite widened READ; this runs the
    * DDL-first direction — declare `INT → BIGINT`, then natively
    * INSERT values only the widened type can hold (the analyzer
    * conforms to the DECLARED type, so before the ALTER this INSERT
    * refuses). Old INT batches promote on scan (SPARK-40876, no
    * rewrite); `VERSION AS OF` the pre-ALTER version still types the
    * column INT (epoch fencing) — both facts carried as DATA (the
    * slice's type name) under the hash.
    */
  val q319 = GraftQuery(
    "q319_catalog_alter_column_type",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.DataFrame
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q319_wd_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (o_orderkey BIGINT, qty INT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q319_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(o_orderkey % 100000 AS INT)
          FROM q319_base""")                                       // v1
        s.sql(s"ALTER TABLE graft.$table ALTER COLUMN qty TYPE BIGINT")
        // ^ fences v2
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey + (SELECT 1 + max(o_orderkey) FROM q319_base),
                 (o_orderkey % 100000) + 5000000000
          FROM q319_base WHERE o_orderpriority = '1-URGENT'""")    // v3
      }
      import org.apache.spark.sql.functions.{col, count, lit, sum}
      def slice(ver: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).cast("long").as("n_rows"),
            sum(col("qty")).cast("long").as("sum_qty"))
          .select(lit(ver).as("ver"),
            lit(df.schema("qty").dataType.simpleString).as("qty_type"),
            col("n_rows"), col("sum_qty"))
      slice("v1", s.sql(s"SELECT * FROM graft.$table VERSION AS OF 1"))
        .unionAll(slice("cur", s.table(s"graft.$table")))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, k % 100000 AS q, o_orderpriority AS p
        FROM orders),
      cur AS (
        SELECT q FROM base
        UNION ALL
        SELECT q + 5000000000 FROM base WHERE p = '1-URGENT')
      SELECT 'v1' AS ver, 'int' AS qty_type, count(*) AS n_rows,
             CAST(sum(q) AS BIGINT) AS sum_qty
      FROM base
      UNION ALL
      SELECT 'cur', 'bigint', count(*), CAST(sum(q) AS BIGINT)
      FROM cur
    """.trim))

  /** INCREMENTAL HIVE-LAYOUT SYNC (round-15 verdict #4) — q315's
    * one-shot export made maintained: a CHECKPOINTED change-feed
    * consumer (the reference's weekly-reconcile cadence,
    * `agf-reconciliation-stack.yaml:142-151`) rewrites only the
    * `col=value` partitions the commits since the last sync touched,
    * delete-aware through the CDF delete leg — a fully-deleted
    * partition's dir is REMOVED, untouched dirs are byte-identical
    * (HiveExportSpec proves that leg; this query hash-gates the
    * content). The chain: base export at v1 → delete one whole
    * partition + targeted upsert + new-partition append → incremental
    * sync → the ORACLE reads what a FOREIGN engine reads: plain
    * parquet over the exported tree. A stale dir, a lost delete, or a
    * partition rewritten from the wrong snapshot breaks the hash.
    */
  val q320 = GraftQuery(
    "q320_versioned_hive_incremental_sync",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft_q320_src_$sfx"
      val out = s"/tmp/graft_q320_out_$sfx"
      val ckpt = s"/tmp/graft_q320_ckpt_$sfx"
      val done = VersionedTable.latestVersion(path).contains(4L) &&
        new java.io.File(s"$ckpt/_version.4").exists()
      if (!done) {
        Seq(path, out, ckpt).foreach { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val f = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (f.exists(hp)) f.delete(hp, true)
        }
        val base = Tables.orders(s, d).select(
          col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"),
          col("o_orderpriority").as("pri"))
        VersionedTable.append(base.drop("pri"), path)              // v1
        VersionedTable.syncHiveLayout(s, path, Seq("st"), out, ckpt)
        // delete EVERY row of one partition (its dir must vanish),
        // correct a slice of the others, append a NEW partition under
        // keys shifted past the live max (derived, SF-safe)
        VersionedTable.deleteKeys(
          base.filter(col("st") === "P").select("k"), "k", path)   // v2
        VersionedTable.upsert(
          base.filter(col("k") % 10 === 1 && col("st") =!= "P")
            .withColumn("total_c", col("total_c") + 7).drop("pri"),
          "k", path)                                               // v3
        val off = base.agg(max(col("k"))).head().getLong(0) + 1L
        VersionedTable.append(
          base.filter(col("pri") === "1-URGENT")
            .select((col("k") + off).as("k"), lit("N").as("st"),
              col("total_c")), path)                               // v4
        VersionedTable.syncHiveLayout(s, path, Seq("st"), out, ckpt)
      }
      // what a FOREIGN engine reads: plain parquet over the tree
      s.read.parquet(out)
        .groupBy(col("st"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(col("total_c")).cast("long").as("total_c"))
        .select(col("st"), col("n_orders"), col("total_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT) AS tc,
               o_orderpriority AS pri
        FROM orders),
      kept AS (
        SELECT k, st, CASE WHEN k % 10 = 1 THEN tc + 7 ELSE tc END AS tc
        FROM base WHERE st <> 'P'),
      ins AS (
        SELECT k + (SELECT 1 + max(k) FROM base) AS k, 'N' AS st, tc
        FROM base WHERE pri = '1-URGENT'),
      live AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT st, count(*) AS n_orders, CAST(sum(tc) AS BIGINT) AS total_c
      FROM live GROUP BY 1
    """.trim))

  /** CATALOG-NAME TVFs + LOGICAL CHANGE FEED over a RENAMED table:
    * `graft_changes('graft.t', from, to)` and
    * `graft_history('graft.t')` now resolve catalog identifiers, and
    * under an active column mapping the feed speaks the table's
    * CURRENT LOGICAL names (the Delta CDF convention) — without the
    * projection, a consumer of a renamed table's feed would see raw
    * physical parquet names and silently mis-wire downstream. The
    * chain: INSERT → RENAME v→amount (a `ddl` fence in the history,
    * round-15 observability) → native UPDATE → DELETE; the result
    * aggregates the feed's insert and delete legs BY THE NEW NAME and
    * carries the full history kind sequence as data. A feed leg under
    * the wrong name errors; a missing delete-leg row, a phantom from
    * the fence, or a mis-kinded history row breaks the hash.
    */
  val q321 = GraftQuery(
    "q321_catalog_logical_change_feed",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q321_cdf_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (o_orderkey BIGINT, v BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q321_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q321_base""")                                       // v1
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN v TO amount")
        // ^ fences v2 (kind 'ddl' in the history)
        s.sql(s"""UPDATE graft.$table SET amount = amount + 5
          WHERE o_orderkey % 10 = 3""")                            // v3
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 7 = 2") // v4
      }
      val changes = s.sql(
        s"SELECT * FROM graft_changes('graft.$table', 1, 4)")
      val legs = changes.groupBy(col("_change_type").as("leg"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("amount")).cast("long").as("amount"))
      val kinds = s.sql(s"SELECT * FROM graft_history('graft.$table')")
        .agg(concat(lit("hist:"), array_join(transform(
          array_sort(collect_list(struct(col("version"), col("kind")))),
          x => x.getField("kind")), ",")).as("leg"),
          count(lit(1)).cast("long").as("n_rows"),
          lit(-1L).as("amount"))
      legs.unionByName(kinds)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS a
        FROM orders),
      upd_pre AS (SELECT * FROM base WHERE k % 10 = 3),
      upd_post AS (SELECT k, a + 5 AS a FROM upd_pre),
      afterupd AS (
        SELECT k, CASE WHEN k % 10 = 3 THEN a + 5 ELSE a END AS a
        FROM base),
      del AS (SELECT * FROM afterupd WHERE k % 7 = 2),
      -- the feed range is (1, 4]: v1's initial load is the snapshot,
      -- not a change — inserts are the UPDATE's postimages only
      ins_leg AS (SELECT a FROM upd_post),
      del_leg AS (SELECT a FROM upd_pre UNION ALL SELECT a FROM del)
      SELECT 'insert' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(a) AS BIGINT) AS amount
      FROM ins_leg
      UNION ALL
      SELECT 'delete', CAST(count(*) AS BIGINT), CAST(sum(a) AS BIGINT)
      FROM del_leg
      UNION ALL
      SELECT 'hist:append,ddl,upsert,delete', CAST(4 AS BIGINT),
             CAST(-1 AS BIGINT)
    """.trim))

  /** MAINTENANCE OBSERVABILITY (round 15): `DESCRIBE DETAIL` (the
    * Delta verb — one metadata-only row: merge-on-read debt at a
    * glance, the declared key, the metadata generation) and
    * `VACUUM ... DRY RUN` (what a retention change WOULD reclaim,
    * touching nothing — the look-before-you-destroy step). The chain
    * builds deterministic state (two inserts → delete → OPTIMIZE →
    * RENAME fence) so every reported count is an exact claim: a
    * tombstone not folded by the compact, a reclaimable dir
    * miscounted, or a dry run that mutated anything breaks the hash
    * (the dry-run legs re-read the table afterwards).
    */
  val q322 = GraftQuery(
    "q322_catalog_describe_detail_dryrun",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q322_det_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 5L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (o_orderkey BIGINT, v BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q322_base")
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q322_base WHERE o_orderkey % 2 = 0""")               // v1
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q322_base WHERE o_orderkey % 2 = 1""")               // v2
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 7 = 2")  // v3
        s.sql(s"OPTIMIZE graft.$table")                              // v4
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN v TO amount") // v5
      }
      val det = s.sql(s"DESCRIBE DETAIL graft.$table").collect().head
      val dry = s.sql(s"VACUUM graft.$table RETAIN 1 VERSIONS DRY RUN")
        .collect()
      // the dry run must have touched NOTHING: the full history still
      // reads, and the content equals the live view
      val still = s.sql(
        s"SELECT CAST(count(*) AS LONG) FROM graft.$table VERSION AS OF 1")
        .collect().head.getLong(0)
      import s.implicits._
      Seq(
        ("detail_version", det.getLong(0)),
        ("detail_data_batches", det.getLong(1)),
        ("detail_tombstones", det.getLong(2)),
        ("detail_retained", det.getLong(3)),
        ("detail_key_is_k", if (det.getString(4) == "o_orderkey") 1L else 0L),
        ("detail_mapped", if (det.getBoolean(6)) 1L else 0L),
        ("dry_manifests", dry.count(_.getString(0) == "manifest").toLong),
        ("dry_batch_dirs", dry.count(_.getString(0) == "batch-dir").toLong),
        ("dry_floor_v5", dry.count(r =>
          r.getString(0) == "floor" && r.getString(1) == "v5").toLong),
        ("v1_still_reads", if (still > 0) 1L else 0L)
      ).toDF("leg", "n")
    },
    Some("""
      SELECT * FROM (VALUES
        ('detail_version',      CAST(5 AS BIGINT)),
        ('detail_data_batches', CAST(1 AS BIGINT)),
        ('detail_tombstones',   CAST(0 AS BIGINT)),
        ('detail_retained',     CAST(5 AS BIGINT)),
        ('detail_key_is_k',     CAST(1 AS BIGINT)),
        ('detail_mapped',       CAST(1 AS BIGINT)),
        ('dry_manifests',       CAST(4 AS BIGINT)),
        ('dry_batch_dirs',      CAST(3 AS BIGINT)),
        ('dry_floor_v5',        CAST(1 AS BIGINT)),
        ('v1_still_reads',      CAST(1 AS BIGINT))
      ) AS t(leg, n)
    """.trim))

  /** MANIFEST-RECORDED COMMIT TIMESTAMPS (round-16 verdict #3):
    * `TIMESTAMP AS OF` previously trusted manifest file mtime (the
    * Delta convention) — a table COPIED or RESTORED between
    * filesystems loses its commit clock. Every commit now records its
    * wall-time in the manifest itself (`#ts=` header), and
    * `versionAtTime` prefers it, falling back to mtime only for
    * pre-header manifests. The chain: three commits, capture each
    * recorded commit time, then CLOBBER every manifest's mtime to
    * epoch+1s (the simulated copy) — resolution at each captured
    * instant must still land on the right version, below the first
    * commit must refuse, and the same clock must serve the CATALOG's
    * `TIMESTAMP AS OF` SQL over an identically-clobbered table. Any
    * leg riding mtime (pre-round-16 behavior) resolves everything to
    * the 1970 clobber time and breaks the hash.
    */
  val q323 = GraftQuery(
    "q323_versioned_commit_timestamps",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft_q323_ts_$sfx"
      val table = s"q323_ts_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      val cpath = graftCatalog(s).tablePath(Seq(table))
      val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("tc"),
        pmod(col("o_orderkey"), lit(3)).as("m"))
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        VersionedTable.append(base.filter(col("m") === 0).drop("m"), path)
        VersionedTable.append(base.filter(col("m") === 1).drop("m"), path)
        VersionedTable.append(base.filter(col("m") === 2).drop("m"), path)
      }
      if (!VersionedTable.latestVersion(cpath).exists(_ >= 2L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"CREATE TABLE graft.$table (k BIGINT, tc BIGINT)")
        base.filter(col("m") === 0).drop("m")
          .createOrReplaceTempView("q323_w1")
        base.filter(col("m") =!= 0).drop("m")
          .createOrReplaceTempView("q323_w2")
        s.sql(s"INSERT INTO graft.$table SELECT * FROM q323_w1")
        s.sql(s"INSERT INTO graft.$table SELECT * FROM q323_w2")
      }
      // the simulated copy: clobber EVERY manifest's mtime (both
      // tables) to epoch+1s — idempotent, re-applied every run
      Seq(path, cpath).foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        f.listStatus(p).map(_.getPath)
          .filter(_.getName.matches("_v\\d+\\.manifest"))
          .foreach(m => f.setTimes(m, 1000L, 1000L))
      }
      val ts = (1L to 3L).map(v =>
        v -> VersionedTable.commitTimeMillis(path, v).get).toMap
      def vAt(millis: Long): Long =
        VersionedTable.versionAtTime(path, millis * 1000L).getOrElse(-1L)
      val cts1 = VersionedTable.commitTimeMillis(cpath, 1L).get
      // a SESSION-TIMEZONE timestamp literal at millisecond grain —
      // the SQL face of the same recorded commit clock
      val lit1 = java.time.Instant.ofEpochMilli(cts1)
        .atZone(java.time.ZoneId.of(s.sessionState.conf.sessionLocalTimeZone))
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val catRows = s.sql(
        s"SELECT CAST(count(*) AS LONG) FROM graft.$table " +
          s"TIMESTAMP AS OF '$lit1'")
        .collect().head.getLong(0)
      val rowsAtV2 = VersionedTable
        .readAt(s, path, vAt(ts(2L))).count()
      import s.implicits._
      Seq(
        ("v_at_ts1", vAt(ts(1L))),
        ("v_at_ts2", vAt(ts(2L))),
        ("v_at_ts3_plus_1min", vAt(ts(3L) + 60000L)),
        ("before_first_refuses", if (vAt(ts(1L) - 1L) == -1L) 1L else 0L),
        ("rows_at_ts2", rowsAtV2),
        ("catalog_rows_at_ts1", catRows)
      ).toDF("leg", "n")
    },
    Some("""
      WITH base AS (SELECT o_orderkey % 3 AS m FROM orders)
      SELECT * FROM (VALUES
        ('v_at_ts1', CAST(1 AS BIGINT)),
        ('v_at_ts2', CAST(2 AS BIGINT)),
        ('v_at_ts3_plus_1min', CAST(3 AS BIGINT)),
        ('before_first_refuses', CAST(1 AS BIGINT))
      ) AS t(leg, n)
      UNION ALL
      SELECT 'rows_at_ts2', CAST(count(*) AS BIGINT) FROM base WHERE m < 2
      UNION ALL
      SELECT 'catalog_rows_at_ts1', CAST(count(*) AS BIGINT)
      FROM base WHERE m = 0
    """.trim))

  /** MAPPING-AWARE PATH READS + PROTOCOL GATE (round-16 verdict #1):
    * a raw `VersionedTable.readAt(path)` over a column-mapped table
    * previously leaked PHYSICAL parquet names and a `__dropped`
    * column's stale data (the mapping lived only at the catalog/TVF
    * layer). Path reads now resolve the schema EPOCH: the chain
    * renames a column, DROPS one, re-ADDS the same logical name (a
    * FRESH physical column — old values must never resurface), and a
    * second wave lands through a PATH-LEVEL logical-named append
    * (the write-side translation). The result reads the SAME table
    * through BOTH surfaces — catalog SQL and raw path readAt — and
    * through path time travel at the pre-DDL epoch (old names). The
    * oracle computes each leg once: a physical name leaking, retired
    * `junk` values resurfacing under the re-added column (wave-1
    * rows must read NULL there), or the two surfaces diverging
    * breaks the hash.
    */
  val q324 = GraftQuery(
    "q324_mapped_dual_surface_read",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q324_map_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (k BIGINT, v BIGINT, junk BIGINT)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q324_base")
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG),
                 o_orderkey % 100
          FROM q324_base""")                                       // v1
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN v TO amount")
        // ^ v2: ddl fence (carries #protocol=column-mapping)
        s.sql(s"ALTER TABLE graft.$table DROP COLUMN junk")         // v3
        s.sql(s"ALTER TABLE graft.$table ADD COLUMNS (junk BIGINT)")
        // wave 2 lands through the PATH API under LOGICAL names —
        // the write-side mapping translation stores physical
        val off = s.sql(
          "SELECT 1 + max(o_orderkey) FROM q324_base")
          .collect().head.getLong(0)
        VersionedTable.appendWithRetry(
          s.sql(s"""SELECT o_orderkey + $off AS k,
                   CAST(round(o_totalprice * 100) AS LONG) AS amount,
                   o_orderkey % 7 AS junk
            FROM q324_base WHERE o_orderpriority = '1-URGENT'"""),
          path)                                                    // v4
      }
      def slice(leg: String,
          df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.agg(count(lit(1)).cast("long").as("n_rows"),
            sum(col("amount")).cast("long").as("sum_amount"),
            coalesce(sum(col("junk")), lit(0L)).cast("long")
              .as("sum_junk"))
          .select(lit(leg).as("leg"), col("n_rows"), col("sum_amount"),
            col("sum_junk"))
      val latest = VersionedTable.latestVersion(path).get
      val cur = s.table(s"graft.$table").select("k", "amount", "junk")
      // widened: the table holds mixed-width batches (pre-drop and
      // re-add epochs) — the footer-union read is the deterministic
      // path-level form, exactly what the catalog reads
      val viaPath = VersionedTable.readAtWidened(s, path, latest)
        .select("k", "amount", "junk")
      // the pre-DDL epoch through the PATH api: old names, old width
      val epoch1 = VersionedTable.readAt(s, path, 1L)
        .select(col("k"), col("v").as("amount"), col("junk"))
      slice("catalog", cur)
        .unionAll(slice("path", viaPath))
        .unionAll(slice("epoch1_old_names", epoch1))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS a,
               o_orderkey % 100 AS j0, o_orderkey % 7 AS j1,
               o_orderpriority AS pri
        FROM orders),
      -- wave 1 reads junk NULL after the drop/re-add; wave 2 carries j1
      cur AS (
        SELECT k, a, CAST(NULL AS BIGINT) AS junk FROM base
        UNION ALL
        SELECT k + (SELECT 1 + max(k) FROM base), a, j1
        FROM base WHERE pri = '1-URGENT')
      SELECT 'catalog' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(a) AS BIGINT) AS sum_amount,
             CAST(coalesce(sum(junk), 0) AS BIGINT) AS sum_junk
      FROM cur
      UNION ALL
      SELECT 'path', CAST(count(*) AS BIGINT), CAST(sum(a) AS BIGINT),
             CAST(coalesce(sum(junk), 0) AS BIGINT)
      FROM cur
      UNION ALL
      SELECT 'epoch1_old_names', CAST(count(*) AS BIGINT),
             CAST(sum(a) AS BIGINT), CAST(sum(j0) AS BIGINT)
      FROM base
    """.trim))

  /** STREAMING-BY-NAME OVER A MAPPED TABLE (round-16 verdict #2) —
    * the stated q318 refusal lifted: `readStream.table("graft.t")`
    * previously went dark the moment a table renamed a column. The
    * V1 versions-as-offsets source now freezes the column mapping at
    * query (re)start and aliases every delivered batch to the
    * frozen LOGICAL names (the CDF already spoke them, q321). The
    * chain: stream wave 1 under the original names → RENAME v TO
    * amount lands (a mid-flight DDL on a RUNNING stream refuses —
    * spec leg) → RESTART from the same checkpoint → wave 2 arrives
    * under the NEW name with no re-delivery of wave 1. Phase sums
    * land in separate sinks; re-delivered rows, a stale name, or
    * physical-name leakage breaks the hash.
    */
  val q325 = GraftQuery(
    "q325_mapped_stream_by_name",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q325_str_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      val ckpt = s"/tmp/graft_q325_ckpt_$sfx"
      val sink1 = s"/tmp/graft_q325_p1_$sfx"
      val sink2 = s"/tmp/graft_q325_p2_$sfx"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(path).exists(_ >= 3L) &&
        VersionedTable.latestVersion(sink1).nonEmpty &&
        VersionedTable.latestVersion(sink2).nonEmpty
      if (!complete) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        Seq(ckpt, sink1, sink2).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        s.sql(s"""CREATE TABLE graft.$table (k BIGINT, v BIGINT)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q325_base")
        def drain(valueCol: String, sink: String): Unit = {
          val q = s.readStream.table(s"graft.$table")
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
              if (!df.isEmpty)
                VersionedTable.append(
                  df.agg(count(lit(1)).cast("long").as("n_partial"),
                    sum(col(valueCol)).cast("long").as("sum_partial")),
                  sink, txnId = Some(s"q325-$valueCol-$id"))
              ()
            }.start()
          q.awaitTermination(120000)
          ()
        }
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q325_base""")                                       // v1
        drain("v", sink1) // wave 1 under the original name
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN v TO amount")
        // ^ v2: the ddl fence; the RESTART below re-freezes the
        // mapping — rows arrive under the CURRENT logical names
        val off = s.sql("SELECT 1 + max(o_orderkey) FROM q325_base")
          .collect().head.getLong(0)
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey + $off,
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q325_base WHERE o_orderpriority = '1-URGENT'""")    // v3
        drain("amount", sink2) // wave 2 only, under the new name
      }
      def leg(name: String,
          sink: String): org.apache.spark.sql.DataFrame =
        VersionedTable.readLatest(s, sink)
          .agg(sum(col("n_partial")).cast("long").as("n_rows"),
            sum(col("sum_partial")).cast("long").as("sum_value"))
          .select(lit(name).as("leg"), col("n_rows"), col("sum_value"))
      leg("wave1_old_name", sink1).unionAll(leg("wave2_new_name", sink2))
    },
    Some("""
      WITH base AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS a,
               o_orderpriority AS pri
        FROM orders)
      SELECT 'wave1_old_name' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(a) AS BIGINT) AS sum_value
      FROM base
      UNION ALL
      SELECT 'wave2_new_name', CAST(count(*) AS BIGINT),
             CAST(sum(a) AS BIGINT)
      FROM base WHERE pri = '1-URGENT'
    """.trim))

  /** FULL-TUPLE BLOOM LANES (round-16 verdict #4): composite-key
    * point lookups previously Bloom-probed only the FIRST key
    * component — sound, but on a first-component-hot table (the
    * reference's (experiment_id, file_path) shape, where one
    * experiment spans every batch) it prunes nothing. A `bloomcols`
    * spec `a+b` now writes a lane hashing the WHOLE tuple, and
    * `lookupKeysMulti` / upsert anti-joins probe it. The fixture
    * makes every batch hot on experiment_id (each INSERT carries all
    * experiments, file_paths disjoint per batch), so the
    * first-component probe keeps all 4 batches while the composite
    * lane opens only the batch(es) holding the probe tuples — the
    * strictly-fewer leg. Result legs are the exact lookup rows; a
    * false negative (a wrongly pruned batch) loses rows and breaks
    * the hash.
    */
  val q326 = GraftQuery(
    "q326_composite_bloom_tuple_lanes",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q326_cbl_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      Tables.orders(s, d).createOrReplaceTempView("q326_base")
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (experiment_id BIGINT, file_path STRING, size_c BIGINT)
          TBLPROPERTIES('key'='experiment_id,file_path',
                        'bloomcols'='experiment_id+file_path')""")
        // 4 commits; EVERY batch holds every experiment (hot first
        // component), file_paths disjoint per batch
        (0 until 4).foreach { b =>
          s.sql(s"""INSERT INTO graft.$table
            SELECT o_orderkey % 5,
                   concat('part-', o_orderkey),
                   CAST(round(o_totalprice * 100) AS LONG)
            FROM q326_base WHERE o_orderkey % 4 = $b""")
        }
      }
      // deterministic probe tuples: the 3 smallest orderkeys with
      // o_orderkey % 5 = 1 (same derivation in the oracle)
      val probeKeys = s.sql("""SELECT o_orderkey FROM q326_base
        WHERE o_orderkey % 5 = 1 ORDER BY o_orderkey LIMIT 3""")
        .collect().map(_.getLong(0)).toSeq
      import s.implicits._
      val probe = probeKeys.map(k => (k % 5, s"part-$k"))
        .toDF("experiment_id", "file_path")
      val dirs = {
        val f = new java.io.File(s"$path/data")
        Option(f.listFiles()).toSeq.flatten.filter(_.isDirectory)
          .map(_.getName).toSeq
      }
      val firstOnly = VersionedTable.bloomCandidateDirsMulti(s, path,
        dirs, Seq("experiment_id"), probe.select("experiment_id"))
      val fullTuple = VersionedTable.bloomCandidateDirsMulti(s, path,
        dirs, Seq("experiment_id", "file_path"), probe)
      val latest = VersionedTable.latestVersion(path).get
      val rows = VersionedTable.lookupKeysMulti(s, path, latest,
        Seq("experiment_id", "file_path"), probe)
      rows.agg(count(lit(1)).cast("long").as("n"),
          sum(col("size_c")).cast("long").as("v"))
        .select(lit("lookup_rows").as("leg"), col("n"), col("v"))
        .unionAll(Seq(
          ("first_component_keeps_all",
            if (firstOnly.size == dirs.size) 1L else 0L, 4L),
          ("composite_strictly_fewer",
            if (fullTuple.size < firstOnly.size) 1L else 0L, 1L)
        ).toDF("leg", "n", "v"))
    },
    Some("""
      WITH probe AS (
        SELECT o_orderkey AS k FROM orders
        WHERE o_orderkey % 5 = 1 ORDER BY o_orderkey LIMIT 3)
      SELECT 'lookup_rows' AS leg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      FROM orders JOIN probe ON o_orderkey = probe.k
      UNION ALL
      SELECT 'first_component_keeps_all', CAST(1 AS BIGINT),
             CAST(4 AS BIGINT)
      UNION ALL
      SELECT 'composite_strictly_fewer', CAST(1 AS BIGINT),
             CAST(1 AS BIGINT)
    """.trim))

  /** CDC REPLICATION BY NAME ACROSS A RENAME — q300's loop composed
    * with round 16's mapped streaming: the replica is maintained from
    * `readStream.option("readChangeFeed", true).table("graft.t")`
    * (options ride the by-name fallback), and a RENAME COLUMN lands
    * between the two AvailableNow runs — the restarted feed delivers
    * the UPDATE's preimage/postimage pair and the late delete under
    * the NEW logical name, with no re-delivery of run 1. The applier
    * normalizes the value column per phase into a fixed replica
    * schema, so a feed leg arriving under the wrong name errors
    * loudly and a lost/doubled change breaks the replica hash.
    */
  val q327 = GraftQuery(
    "q327_mapped_cdc_replication_by_name",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q327_cdc_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      val ckpt = s"/tmp/graft_q327_ckpt_$sfx"
      val rep = s"/tmp/graft_q327_rep_$sfx"
      val conf = s.sparkContext.hadoopConfiguration
      def exists(dir: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).exists(p)
      }
      val complete = VersionedTable.latestVersion(path).exists(_ >= 5L) &&
        exists(ckpt) && VersionedTable.latestVersion(rep).nonEmpty
      if (!complete) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        Seq(ckpt, rep).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        s.sql(s"""CREATE TABLE graft.$table (o_orderkey BIGINT, v BIGINT)
          TBLPROPERTIES('key'='o_orderkey')""")
        Tables.orders(s, d).createOrReplaceTempView("q327_base")
        def drain(valueCol: String): Unit = {
          val q = s.readStream
            .option("readChangeFeed", "true")
            .option("maxVersionsPerTrigger", "1")
            .table(s"graft.$table")
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
              // the feed speaks the CURRENT logical names; the replica
              // keeps one fixed schema
              val norm = df.withColumnRenamed(valueCol, "val")
              val dels = norm.filter(col("_change_type") === "delete")
                .select(col("o_orderkey"))
              if (!dels.isEmpty)
                VersionedTable.deleteKeys(dels, "o_orderkey", rep,
                  txnId = Some(s"q327d-$id"))
              val ins = norm.filter(col("_change_type") === "insert")
                .drop("_change_type")
              if (!ins.isEmpty)
                VersionedTable.append(ins, rep, txnId = Some(s"q327i-$id"))
              ()
            }.start()
          q.awaitTermination(120000)
          ()
        }
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q327_base""")                                       // v1
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 10 = 3") // v2
        drain("v") // run 1: snapshot + delete under the old name
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN v TO amount")
        // ^ v3: the ddl fence (empty CDC unit)
        s.sql(s"""UPDATE graft.$table SET amount = amount + 7
          WHERE o_orderkey % 10 = 4""")                            // v4
        s.sql(s"DELETE FROM graft.$table WHERE o_orderkey % 10 = 5") // v5
        drain("amount") // run 2 resumes the WAL under the NEW name
      }
      VersionedTable.readLatest(s, rep)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("val")).cast("long").as("sum_val"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS a
        FROM orders),
      live AS (
        SELECT k, CASE WHEN k % 10 = 4 THEN a + 7 ELSE a END AS a
        FROM base WHERE k % 10 <> 3 AND k % 10 <> 5)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(a) AS BIGINT) AS sum_val
      FROM live
    """.trim))


  /** CHECK CONSTRAINTS, ORACLE-GATED (round 16, beyond-verdict): the
    * Delta CHECK surface on the catalog table — `check.<name>`
    * TBLPROPERTIES enforced on the written batch BEFORE the manifest
    * commit, on EVERY write path (SQL INSERT, the native row-level
    * route, the raw path API share one choke point). The chain: a
    * gated INSERT of the corpus passes; a violating INSERT and a
    * violating native UPDATE both REFUSE with nothing published
    * (content legs prove the table unchanged); a clean UPDATE lands;
    * declaring a second constraint over the existing data validates
    * and passes. A refusal that half-published, a gate that let a
    * violating row through, or adoption skipping validation breaks
    * the hash.
    */
  val q328 = GraftQuery(
    "q328_catalog_check_constraints",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q328_chk_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      def chain(t: Throwable): String = {
        var c: Throwable = t; val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
        sb.toString
      }
      var refusedInsert = 0L
      var refusedUpdate = 0L
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table
          (k BIGINT, amount BIGINT)
          TBLPROPERTIES('key'='k', 'check.non_negative'='amount >= 0')""")
        Tables.orders(s, d).createOrReplaceTempView("q328_base")
        s.sql(s"""INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q328_base""")                                       // v1
        // a violating INSERT refuses; NOTHING lands
        try {
          s.sql(s"""INSERT INTO graft.$table
            SELECT o_orderkey + (SELECT 1 + max(o_orderkey) FROM q328_base),
                   -CAST(round(o_totalprice * 100) AS LONG) - 1
            FROM q328_base WHERE o_orderpriority = '1-URGENT'""")
        } catch { case e: Exception =>
          if (chain(e).contains("non_negative")) refusedInsert = 1L }
        // a violating NATIVE UPDATE refuses; content intact
        try s.sql(s"UPDATE graft.$table SET amount = -1 WHERE k % 10 = 6")
        catch { case e: Exception =>
          if (chain(e).contains("non_negative")) refusedUpdate = 1L }
        // a clean native UPDATE lands
        s.sql(s"UPDATE graft.$table SET amount = amount + 3 WHERE k % 10 = 7")
        // adopting a second constraint validates the existing data
        // (orderkeys start at 0 in the corpus, so the bound is >= 0)
        s.sql(s"""ALTER TABLE graft.$table
          SET TBLPROPERTIES('check.key_pos'='k >= 0')""")
      } else { refusedInsert = 1L; refusedUpdate = 1L }
      import s.implicits._
      s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("amount")).cast("long").as("v"))
        .select(lit("content").as("leg"), col("n"), col("v"))
        .unionAll(Seq(
          ("refused_insert", refusedInsert, 1L),
          ("refused_update", refusedUpdate, 1L)).toDF("leg", "n", "v"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS a
        FROM orders)
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN k % 10 = 7 THEN a + 3 ELSE a END) AS BIGINT) AS v
      FROM base
      UNION ALL
      SELECT 'refused_insert', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT 'refused_update', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    """.trim))

  /** MERGE `NOT MATCHED BY SOURCE` on the SQL path (round-17 verdict
    * #4): the reference's WHOLE reconciliation (J1, insert-if-absent
    * + delete-absent, `agf_reconciliation_lambda.py:64-66`) as ONE
    * atomic MERGE instead of anti-join + separate delete. The
    * statement composes all three clause families: unmatched source
    * rows INSERT, matched rows stay untouched (no MATCHED clause),
    * and target rows absent from the source take the FIRST BY SOURCE
    * clause that holds — UPDATE (sign-flip) for even keys, DELETE
    * otherwise. The oracle recomputes the reconciliation
    * relationally: a lost insert, an over-deleted key, a clause
    * mis-ordered, or a matched row rewritten breaks the hash.
    */
  val q329 = GraftQuery(
    "q329_merge_not_matched_by_source",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q329_nmbs_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.sql.GraftSql.register("q329_inv", path, "k")
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        Tables.orders(s, d).createOrReplaceTempView("q329_base")
        s.sql("""
          INSERT INTO q329_inv
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS LONG) AS v
          FROM q329_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql("""
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS LONG) + 7 AS v
          FROM q329_base WHERE o_orderpriority = '1-URGENT'""")
          .createOrReplaceTempView("q329_src")
        s.sql("""
          MERGE INTO q329_inv USING q329_src ON q329_inv.k = q329_src.k
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND q329_inv.k % 2 = 0
            THEN UPDATE SET v = -q329_inv.v
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      }
      VersionedTable.readLatest(s, path)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("v")).cast("long").as("sum_v"),
          sum(col("k")).cast("long").as("sum_k"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               o_orderdate AS dt, o_orderpriority AS pri
        FROM orders),
      seed AS (SELECT k, v FROM base WHERE dt < TIMESTAMP '1997-01-01'),
      src AS (SELECT k, v + 7 AS v FROM base WHERE pri = '1-URGENT'),
      fin AS (
        SELECT s.k, s.v FROM seed s
        WHERE EXISTS (SELECT 1 FROM src WHERE src.k = s.k)
        UNION ALL
        SELECT s.k, s.v FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM seed WHERE seed.k = s.k)
        UNION ALL
        SELECT s.k, -s.v FROM seed s
        WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.k = s.k)
          AND s.k % 2 = 0)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(v) AS BIGINT) AS sum_v,
             CAST(sum(k) AS BIGINT) AS sum_k
      FROM fin
    """.trim))

  /** EXPLICIT COLUMN LISTS on INSERT (round-17 verdict #3): `INSERT
    * INTO t (c1, c2) SELECT ...` — previously a loud refusal. The
    * list fixes the positional meaning of the query's columns;
    * omitted columns null-fill TYPED in table order (the reference's
    * optional-field defaults, P15 — `agf_ingestion_lambda.py:296`
    * writes records whose optional fields are absent). The oracle
    * checks the null-filled rows agg-separately from the full rows;
    * an unknown-column INSERT refuses (GraftMergeFormsSpec).
    */
  val q330 = GraftQuery(
    "q330_insert_column_list",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q330_collist_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.sql.GraftSql.register("q330_files", path, "k")
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        Tables.orders(s, d).createOrReplaceTempView("q330_base")
        s.sql("""
          INSERT INTO q330_files
          SELECT o_orderkey AS k, o_orderstatus AS status,
                 CAST(round(o_totalprice * 100) AS LONG) AS total,
                 o_orderpriority AS note
          FROM q330_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        // the partial-column commit: total and note null-fill
        s.sql("""
          INSERT INTO q330_files (k, status)
          SELECT o_orderkey, o_orderstatus
          FROM q330_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
      }
      VersionedTable.readLatest(s, path)
        .groupBy(col("status"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          count(col("total")).cast("long").as("n_total"),
          sum(coalesce(col("total"), lit(0L))).cast("long").as("sum_total"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total,
               o_orderdate AS dt
        FROM orders),
      fin AS (
        SELECT k, status, total FROM base WHERE dt < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT k, status, CAST(NULL AS BIGINT) AS total
        FROM base WHERE dt >= TIMESTAMP '1997-01-01')
      SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(total) AS BIGINT) AS n_total,
             CAST(sum(coalesce(total, 0)) AS BIGINT) AS sum_total
      FROM fin GROUP BY 1
    """.trim))

  /** KEY-MOVING UPDATE (round-17 verdict #6): `UPDATE t SET k = ...`
    * routes through delete(old key) + insert(new row) in ONE
    * pinned-snapshot commit — the shape the native row-level route
    * declares (representUpdateAsDeleteAndInsert,
    * `catalog/GraftRowLevel.scala`). Legs: final content (urgent
    * keys moved past the corpus, values untouched) and the commit's
    * OWN change feed — the move is CDC-visible as preimage
    * (delete) / postimage (insert) pairs, equal in count.
    */
  val q331 = GraftQuery(
    "q331_update_moves_key",
    (s, d) => {
      import graft.operators.VersionedTable
      val path = "/tmp/graft_q331_keymove_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      graft.sql.GraftSql.register("q331_docs", path, "k")
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
        Tables.orders(s, d).createOrReplaceTempView("q331_base")
        s.sql("""
          INSERT INTO q331_docs
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS LONG) AS v,
                 o_orderpriority AS pri
          FROM q331_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        val off = s.sql("SELECT 1 + max(o_orderkey) FROM q331_base")
          .collect().head.getLong(0)
        s.sql(s"UPDATE q331_docs SET k = k + $off WHERE pri = '1-URGENT'")
      }
      val latest = VersionedTable.latestVersion(path).get
      val content = VersionedTable.readLatest(s, path)
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          sum(col("v")).cast("long").as("sum_v"))
        .select(lit("content").as("leg"), col("n"), col("sum_k"),
          col("sum_v"))
      // the move's own commit, through the change feed: preimage
      // deletes and postimage inserts, equal in count
      val cdc = VersionedTable.readChangeFeed(s, path, latest - 1, latest)
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(concat(lit("cdc_"), col("_change_type")).as("leg"),
          col("n"), lit(0L).as("sum_k"), lit(0L).as("sum_v"))
      content.unionAll(cdc)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               o_orderpriority AS pri, o_orderdate AS dt
        FROM orders),
      off AS (SELECT 1 + max(k) AS off FROM base),
      seed AS (SELECT k, v, pri FROM base WHERE dt < TIMESTAMP '1997-01-01'),
      fin AS (
        SELECT CASE WHEN pri = '1-URGENT' THEN k + (SELECT off FROM off)
                    ELSE k END AS k, v
        FROM seed),
      moved AS (SELECT count(*) AS n FROM seed WHERE pri = '1-URGENT')
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS sum_k,
             CAST(sum(v) AS BIGINT) AS sum_v
      FROM fin
      UNION ALL
      SELECT 'cdc_delete', CAST(n AS BIGINT), 0, 0 FROM moved
      UNION ALL
      SELECT 'cdc_insert', CAST(n AS BIGINT), 0, 0 FROM moved
    """.trim))

  /** NESTED-FIELD SCHEMA EVOLUTION (round-17 verdict #2): the
    * reference's documents are NESTED (`agf_ingestion_lambda.py:207,
    * 296-298` — record metadata rides a struct), and the first DDL a
    * real user issues against that model is a rename or drop INSIDE
    * the struct. Both are now metadata-only under column mapping:
    * the inner field keeps its physical parquet name (reads rename
    * via one positional cast; retired inner fields project away),
    * and time travel is epoch-correct — VERSION AS OF 1 speaks the
    * ORIGINAL inner names and still sees the dropped field's values.
    * Legs: catalog current view, catalog VERSION AS OF 1, and the
    * path surface (readAt) — a mis-mapped inner field, a leaked
    * dropped value, or an epoch-blind read breaks the hash.
    */
  val q332 = GraftQuery(
    "q332_nested_field_evolution",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q332_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT, junk: BIGINT>)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q332_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'sz', CAST(round(o_totalprice * 100) AS LONG),
                   'junk', o_orderkey % 97)
          FROM q332_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN meta.sz TO bytes")
        s.sql(s"ALTER TABLE graft.$table DROP COLUMN meta.junk")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'bytes', CAST(round(o_totalprice * 100) AS LONG))
          FROM q332_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
      }
      val latest = VersionedTable.latestVersion(path).get
      val cur = s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.bytes")).cast("long").as("sum_a"),
          lit(0L).as("sum_b"))
        .select(lit("current").as("leg"), col("n_rows"), col("sum_a"),
          col("sum_b"))
      val epoch1 = s.sql(s"""
        SELECT 'epoch1' AS leg, CAST(count(*) AS LONG) AS n_rows,
               CAST(sum(meta.sz) AS LONG) AS sum_a,
               CAST(sum(meta.junk) AS LONG) AS sum_b
        FROM graft.$table VERSION AS OF 1""")
      val pathLeg = VersionedTable.readAt(s, path, latest)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.bytes")).cast("long").as("sum_a"),
          lit(0L).as("sum_b"))
        .select(lit("path").as("leg"), col("n_rows"), col("sum_a"),
          col("sum_b"))
      cur.unionAll(epoch1).unionAll(pathLeg)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS fmt,
               CAST(round(o_totalprice * 100) AS BIGINT) AS sz,
               o_orderkey % 97 AS junk, o_orderdate AS dt
        FROM orders),
      pre AS (SELECT * FROM base WHERE dt < TIMESTAMP '1997-01-01')
      SELECT 'current' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(sz) AS BIGINT) AS sum_a, CAST(0 AS BIGINT) AS sum_b
      FROM base
      UNION ALL
      SELECT 'epoch1', CAST(count(*) AS BIGINT), CAST(sum(sz) AS BIGINT),
             CAST(sum(junk) AS BIGINT)
      FROM pre
      UNION ALL
      SELECT 'path', CAST(count(*) AS BIGINT), CAST(sum(sz) AS BIGINT),
             CAST(0 AS BIGINT)
      FROM base
    """.trim))

  /** NESTED ADD COLUMNS (round-18 verdict #2): the reference's
    * free-form `parameters` struct is kept "for future ML use"
    * (`agf_ingestion_lambda.py:296-298`) — exactly a struct that
    * GROWS fields. ADD now reaches struct fields metadata-only:
    * existing batches NULL-fill the new inner field on read, and a
    * RE-ADDED inner name (dropped earlier, the fence in this build)
    * maps to a FRESH physical column — the retired parquet values
    * (k % 97) can never resurface under the re-added name (k % 11
    * from the new batch is the only non-null content). Legs: catalog
    * current view, `VERSION AS OF 1` (the pre-drop epoch serving the
    * ORIGINAL values), and the path surface under the widened read.
    * A resurfaced stale value, a mis-pinned re-add, or an
    * epoch-blind time travel breaks the hash.
    */
  val q333 = GraftQuery(
    "q333_nested_add_column",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q333_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<fmt: STRING, junk: BIGINT>)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q333_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus, 'junk', o_orderkey % 97)
          FROM q333_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"ALTER TABLE graft.$table DROP COLUMN meta.junk")
        s.sql(s"""ALTER TABLE graft.$table
          ADD COLUMNS (meta.junk BIGINT, meta.lang STRING)""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'junk', o_orderkey % 11, 'lang', 'en')
          FROM q333_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
      }
      val latest = VersionedTable.latestVersion(path).get
      val cur = s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.junk")).cast("long").as("sum_junk"),
          count(col("meta.lang")).cast("long").as("n_lang"))
        .select(lit("current").as("leg"), col("n_rows"), col("sum_junk"),
          col("n_lang"))
      val epoch1 = s.sql(s"""
        SELECT 'epoch1' AS leg, CAST(count(*) AS LONG) AS n_rows,
               CAST(sum(meta.junk) AS LONG) AS sum_junk,
               CAST(0 AS LONG) AS n_lang
        FROM graft.$table VERSION AS OF 1""")
      val pathLeg = VersionedTable.readAtWidened(s, path, latest)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.junk")).cast("long").as("sum_junk"),
          count(col("meta.lang")).cast("long").as("n_lang"))
        .select(lit("path").as("leg"), col("n_rows"), col("sum_junk"),
          col("n_lang"))
      cur.unionAll(epoch1).unionAll(pathLeg)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderdate AS dt FROM orders),
      pre AS (SELECT k, k % 97 AS junk FROM base
              WHERE dt < TIMESTAMP '1997-01-01'),
      post AS (SELECT k, k % 11 AS junk FROM base
               WHERE dt >= TIMESTAMP '1997-01-01')
      SELECT 'current' AS leg,
             CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
             CAST((SELECT sum(junk) FROM post) AS BIGINT) AS sum_junk,
             CAST((SELECT count(*) FROM post) AS BIGINT) AS n_lang
      UNION ALL
      SELECT 'epoch1', CAST(count(*) AS BIGINT),
             CAST(sum(junk) AS BIGINT), CAST(0 AS BIGINT)
      FROM pre
      UNION ALL
      SELECT 'path',
             CAST((SELECT count(*) FROM base) AS BIGINT),
             CAST((SELECT sum(junk) FROM post) AS BIGINT),
             CAST((SELECT count(*) FROM post) AS BIGINT)
    """.trim))

  /** NESTED TYPE WIDENING (round-18 verdict #3): the q319 lossless
    * matrix applied one level down — an inner `sz: INT` grows to
    * BIGINT with ZERO rewrites (the first migration a nested data
    * model needs): old batches promote natively on the scan
    * (SPARK-40876), new batches commit values beyond int range, and
    * `VERSION AS OF` the pre-DDL version reads NARROW (the epoch
    * boundary). The refusal legs pin the matrix's other directions:
    * a narrowing and a lossy change both refuse loudly (Spark's
    * analyzer or the catalog — either way, never silently).
    */
  val q334 = GraftQuery(
    "q334_nested_type_widening",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q334_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      var refusedNarrow = 0L
      var refusedLossy = 0L
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<sz: INT, fmt: STRING>)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q334_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('sz', CAST(o_orderkey % 100000 AS INT),
                   'fmt', o_orderstatus)
          FROM q334_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"ALTER TABLE graft.$table ALTER COLUMN meta.sz TYPE BIGINT")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct(
                   'sz', CAST(round(o_totalprice * 100) AS LONG) + 3000000000L,
                   'fmt', o_orderstatus)
          FROM q334_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
        try s.sql(s"ALTER TABLE graft.$table ALTER COLUMN meta.sz TYPE INT")
        catch { case _: Exception => refusedNarrow = 1L }
        try s.sql(s"ALTER TABLE graft.$table ALTER COLUMN meta.fmt TYPE BIGINT")
        catch { case _: Exception => refusedLossy = 1L }
      } else { refusedNarrow = 1L; refusedLossy = 1L }
      val latest = VersionedTable.latestVersion(path).get
      import s.implicits._
      val cur = s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.sz")).cast("long").as("sum_sz"))
        .select(lit("current").as("leg"), col("n_rows"), col("sum_sz"))
      val epoch1 = s.sql(s"""
        SELECT 'epoch1' AS leg, CAST(count(*) AS LONG) AS n_rows,
               CAST(sum(CAST(meta.sz AS LONG)) AS LONG) AS sum_sz
        FROM graft.$table VERSION AS OF 1""")
      val pathLeg = VersionedTable.readAtWidened(s, path, latest)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.sz")).cast("long").as("sum_sz"))
        .select(lit("path").as("leg"), col("n_rows"), col("sum_sz"))
      cur.unionAll(epoch1).unionAll(pathLeg)
        .unionAll(Seq(("refused_narrowing", refusedNarrow, 0L),
          ("refused_lossy", refusedLossy, 0L))
          .toDF("leg", "n_rows", "sum_sz"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate AS dt
        FROM orders),
      pre AS (SELECT k % 100000 AS sz FROM base
              WHERE dt < TIMESTAMP '1997-01-01'),
      post AS (SELECT cents + 3000000000 AS sz FROM base
               WHERE dt >= TIMESTAMP '1997-01-01')
      SELECT 'current' AS leg,
             CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
             CAST((SELECT sum(sz) FROM pre) +
                  (SELECT sum(sz) FROM post) AS BIGINT) AS sum_sz
      UNION ALL
      SELECT 'epoch1', CAST(count(*) AS BIGINT), CAST(sum(sz) AS BIGINT)
      FROM pre
      UNION ALL
      SELECT 'path',
             CAST((SELECT count(*) FROM base) AS BIGINT),
             CAST((SELECT sum(sz) FROM pre) +
                  (SELECT sum(sz) FROM post) AS BIGINT)
      UNION ALL
      SELECT 'refused_narrowing', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT 'refused_lossy', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
    """.trim))

  /** WIDEN + NESTED MAPPING STREAM (round-18 verdict #4, previously a
    * construction-time refusal): a `widen = true` stream over a
    * nested-RENAMED table — the widened explicit-schema scan now
    * speaks nested PHYSICAL names — delivers the LOGICAL view of
    * both epochs (the pre-rename batch reads through the stable
    * physical inner name), and a second drain from the SAME
    * checkpoint after another commit delivers exactly the fresh
    * rows: the restart contract composed with both features. A
    * mis-mapped inner field, a dropped delivery, or a replayed batch
    * breaks the hash.
    */
  val q335 = GraftQuery(
    "q335_widen_nested_mapped_stream",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q335_str_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      val ckpt = s"/tmp/graft_q335_ckpt_$sfx"
      val sink1 = s"/tmp/graft_q335_w1_$sfx"
      val sink2 = s"/tmp/graft_q335_w2_$sfx"
      val conf = s.sparkContext.hadoopConfiguration
      val complete = VersionedTable.latestVersion(path).exists(_ >= 4L) &&
        VersionedTable.latestVersion(sink1).nonEmpty &&
        VersionedTable.latestVersion(sink2).nonEmpty
      if (!complete) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        Seq(ckpt, sink1, sink2).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q335_base")
        def drain(sink: String, wave: String): Unit = {
          val q = s.readStream.format("graft").option("widen", "true")
            .load(path)
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
              if (!df.isEmpty)
                VersionedTable.append(
                  df.agg(count(lit(1)).cast("long").as("n_partial"),
                    sum(col("meta.bytes")).cast("long").as("sum_partial")),
                  sink, txnId = Some(s"q335-$wave-$id"))
              ()
            }.start()
          q.awaitTermination(120000)
          ()
        }
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'sz', CAST(round(o_totalprice * 100) AS LONG))
          FROM q335_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN meta.sz TO bytes")
        // ^ v2 fence: the stream below constructs OVER the nested
        // mapping with widen — the exact composition r17 refused
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'bytes', CAST(round(o_totalprice * 100) AS LONG))
          FROM q335_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
        drain(sink1, "w1") // both epochs, logical nested names
        val off = s.sql("SELECT 1 + max(o_orderkey) FROM q335_base")
          .collect().head.getLong(0)
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey + $off,
                 named_struct('fmt', o_orderstatus,
                   'bytes', CAST(round(o_totalprice * 100) AS LONG))
          FROM q335_base WHERE o_orderpriority = '1-URGENT'""")
        drain(sink2, "w2") // the restart: exactly the fresh commit
      }
      def leg(name: String, sink: String): org.apache.spark.sql.DataFrame =
        VersionedTable.readLatest(s, sink)
          .agg(sum(col("n_partial")).cast("long").as("n_rows"),
            sum(col("sum_partial")).cast("long").as("sum_bytes"))
          .select(lit(name).as("leg"), col("n_rows"), col("sum_bytes"))
      leg("wave1_both_epochs", sink1).unionAll(leg("wave2_restart", sink2))
    },
    Some("""
      WITH base AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS b,
               o_orderpriority AS pri
        FROM orders)
      SELECT 'wave1_both_epochs' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(b) AS BIGINT) AS sum_bytes
      FROM base
      UNION ALL
      SELECT 'wave2_restart', CAST(count(*) AS BIGINT),
             CAST(sum(b) AS BIGINT)
      FROM base WHERE pri = '1-URGENT'
    """.trim))

  /** NESTED CHECK CONSTRAINTS (round-18 verdict #7): a `check.<name>`
    * over a struct field enforces at the write choke point (the
    * violating batch is refused BEFORE any manifest references it),
    * FOLLOWS a nested RENAME inside the same metadata CAS (the
    * stored SQL is rewritten to the new inner name and keeps
    * enforcing), and the refusals are part of the result: a silently
    * landed violation changes the content sums; a silently dropped
    * refusal flips the counter legs.
    */
  val q336 = GraftQuery(
    "q336_nested_check_constraint",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q336_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      var refusedOld = 0L
      var refusedNew = 0L
      var followed = 0L
      if (!VersionedTable.latestVersion(path).exists(_ >= 3L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
          TBLPROPERTIES('key'='k', 'check.sz_nonneg'='meta.sz >= 0')""")
        Tables.orders(s, d).createOrReplaceTempView("q336_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'sz', CAST(round(o_totalprice * 100) AS LONG))
          FROM q336_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        try s.sql(s"""INSERT INTO graft.$table
          VALUES (-1, named_struct('fmt', 'x', 'sz', CAST(-5 AS LONG)))""")
        catch { case _: Exception => refusedOld = 1L }
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN meta.sz TO bytes")
        try s.sql(s"""INSERT INTO graft.$table
          VALUES (-2, named_struct('fmt', 'y', 'bytes', CAST(-7 AS LONG)))""")
        catch { case _: Exception => refusedNew = 1L }
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 named_struct('fmt', o_orderstatus,
                   'bytes', CAST(round(o_totalprice * 100) AS LONG))
          FROM q336_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
      } else { refusedOld = 1L; refusedNew = 1L }
      import s.implicits._
      followed =
        if (graft.catalog.GraftTableMeta.readLatest(path)
          .exists(_.props.get("check.sz_nonneg")
            .exists(_.toLowerCase(java.util.Locale.ROOT)
              .contains("bytes")))) 1L
        else 0L
      s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("meta.bytes")).cast("long").as("sum_bytes"))
        .select(lit("content").as("leg"), col("n_rows"), col("sum_bytes"))
        .unionAll(Seq(
          ("refused_old_name", refusedOld, 0L),
          ("refused_new_name", refusedNew, 0L),
          ("constraint_follows_rename", followed, 0L))
          .toDF("leg", "n_rows", "sum_bytes"))
    },
    Some("""
      WITH base AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS b FROM orders)
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(b) AS BIGINT) AS sum_bytes
      FROM base
      UNION ALL
      SELECT 'refused_old_name', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT 'refused_new_name', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT 'constraint_follows_rename', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
    """.trim))

  /** NESTED DATA SKIPPING (round 18): `statscols` reaches struct
    * fields — the manifest records `meta.bytes`' typed min/max per
    * batch and a plain `WHERE meta.bytes >= x` prunes batch dirs at
    * optimize time, exactly like a flat column (the GetStructField
    * chain maps to the dotted stats path; after a nested RENAME the
    * cast-stripping rewrite re-binds it to the physical inner name
    * the stats live under). The reference's nested documents
    * (`agf_ingestion_lambda.py:207`) get manifest-level skipping with
    * no flattening. The `pruned_dirs` leg is the PLAN-level claim:
    * the optimized scan must open exactly 2 of the 4 range-disjoint
    * batches — a silently un-pruned plan flips it to 4 and breaks
    * the hash, while the content leg pins the answer unchanged.
    */
  val q337 = GraftQuery(
    "q337_nested_stats_skipping",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q337_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      Tables.orders(s, d).createOrReplaceTempView("q337_base")
      val m = s.sql("SELECT max(o_orderkey) FROM q337_base")
        .collect().head.getLong(0)
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<fmt: STRING, bytes: BIGINT>)
          TBLPROPERTIES('key'='k', 'statscols'='meta.bytes')""")
        // 4 commits over DISJOINT o_orderkey quartile ranges, so each
        // batch's recorded meta.bytes envelope is disjoint too
        (0 until 4).foreach { b =>
          val lo = m / 4 * b
          val hiCond =
            if (b == 3) "" else s"AND o_orderkey < ${m / 4 * (b + 1)}"
          s.sql(s"""
            INSERT INTO graft.$table
            SELECT o_orderkey,
                   named_struct('fmt', o_orderstatus, 'bytes', o_orderkey)
            FROM q337_base WHERE o_orderkey >= $lo $hiCond""")
        }
      }
      val half = m / 4 * 2
      val q = s.table(s"graft.$table").filter(col("meta.bytes") >= half)
      val dirs = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.size
            case _ => 0
          }
      }.sum
      q.agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("meta.bytes")).cast("long").as("sum_bytes"))
        .select(lit("content").as("leg"), col("n_rows"), col("sum_bytes"))
        .unionAll(s.range(1).select(lit("pruned_dirs").as("leg"),
          lit(dirs.toLong).as("n_rows"), lit(0L).as("sum_bytes")))
    },
    Some("""
      WITH m AS (SELECT max(o_orderkey) AS mx FROM orders),
      half AS (SELECT (mx // 4) * 2 AS h FROM m)
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_bytes
      FROM orders WHERE o_orderkey >= (SELECT h FROM half)
      UNION ALL
      SELECT 'pruned_dirs', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    """.trim))

  /** ARRAY-ELEMENT DDL (round-19 verdict #1): the reference's DOMINANT
    * nested shape is a LIST of file entries — `file_manifest`
    * (`agf_ingestion_lambda.py:207,239-245,361-416`) and experiment
    * `files` (`:314-326`) — so the first real schema evolution that
    * data model meets is a manifest ENTRY gaining/renaming/widening a
    * field. This composes all three one level inside
    * `array<struct<...>>` via Spark's collection addressing
    * (`m.element.<field>`), all metadata-only (zero rewrites): ADD
    * `m.element.mime` (old batches NULL-fill per element), RENAME
    * `m.element.sz TO bytes` (stable physical name inside the
    * element), WIDEN `m.element.bytes INT→BIGINT` (old batches
    * promote natively inside repeated groups — pinned by
    * ArrayScanProbeSpec). Legs: catalog current view (HOF aggregate
    * over elements — no explode shuffle), `VERSION AS OF 1` speaking
    * the ORIGINAL narrow name, the path surface under the widened
    * mapped read, and a refused narrowing. A mis-mapped element
    * field, a lost per-element NULL-fill, or an epoch-blind time
    * travel breaks the hash.
    */
  val q338 = GraftQuery(
    "q338_array_element_ddl",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q338_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      var refusedNarrow = 0L
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, m ARRAY<STRUCT<fmt: STRING, sz: INT>>)
          TBLPROPERTIES('key'='k')""")
        Tables.orders(s, d).createOrReplaceTempView("q338_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 array(named_struct('fmt', o_orderstatus,
                         'sz', CAST(o_orderkey % 100000 AS INT)),
                       named_struct('fmt', 'aux',
                         'sz', CAST(o_orderkey % 89 AS INT)))
          FROM q338_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"ALTER TABLE graft.$table ADD COLUMNS (m.element.mime STRING)")
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN m.element.sz TO bytes")
        s.sql(s"ALTER TABLE graft.$table ALTER COLUMN m.element.bytes TYPE BIGINT")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey,
                 array(named_struct('fmt', o_orderstatus,
                   'bytes', CAST(round(o_totalprice * 100) AS LONG)
                     + 3000000000L,
                   'mime', 'text/plain'))
          FROM q338_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
        try s.sql(s"ALTER TABLE graft.$table ALTER COLUMN m.element.bytes TYPE INT")
        catch { case _: Exception => refusedNarrow = 1L }
      } else refusedNarrow = 1L
      val latest = VersionedTable.latestVersion(path).get
      import s.implicits._
      def legAgg(df: org.apache.spark.sql.DataFrame, leg: String) = df
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(expr(
            "aggregate(m, CAST(0 AS BIGINT), (acc, x) -> acc + x.bytes)"))
            .cast("long").as("sum_bytes"),
          sum(expr("size(filter(m, x -> x.mime IS NOT NULL))"))
            .cast("long").as("n_mime"))
        .select(lit(leg).as("leg"), col("n_rows"), col("sum_bytes"),
          col("n_mime"))
      val cur = legAgg(s.table(s"graft.$table"), "current")
      // the pre-DDL epoch speaks the ORIGINAL element field name (sz,
      // INT) and has no mime — the schema-epoch fence one level inside
      // the array
      val epoch1 = s.sql(s"""
        SELECT 'epoch1' AS leg, CAST(count(*) AS LONG) AS n_rows,
               CAST(sum(aggregate(m, CAST(0 AS BIGINT),
                 (acc, x) -> acc + CAST(x.sz AS BIGINT))) AS LONG)
                 AS sum_bytes,
               CAST(0 AS LONG) AS n_mime
        FROM graft.$table VERSION AS OF 1""")
      val pathLeg = legAgg(VersionedTable.readAtWidened(s, path, latest), "path")
      cur.unionAll(epoch1).unionAll(pathLeg)
        .unionAll(Seq(("refused_narrowing", refusedNarrow, 0L, 0L))
          .toDF("leg", "n_rows", "sum_bytes", "n_mime"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate AS dt
        FROM orders),
      pre AS (SELECT (k % 100000) + (k % 89) AS s FROM base
              WHERE dt < TIMESTAMP '1997-01-01'),
      post AS (SELECT cents + 3000000000 AS s FROM base
               WHERE dt >= TIMESTAMP '1997-01-01')
      SELECT 'current' AS leg,
             CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
             CAST((SELECT sum(s) FROM pre) +
                  (SELECT sum(s) FROM post) AS BIGINT) AS sum_bytes,
             CAST((SELECT count(*) FROM post) AS BIGINT) AS n_mime
      UNION ALL
      SELECT 'epoch1', CAST(count(*) AS BIGINT), CAST(sum(s) AS BIGINT),
             CAST(0 AS BIGINT)
      FROM pre
      UNION ALL
      SELECT 'path',
             CAST((SELECT count(*) FROM base) AS BIGINT),
             CAST((SELECT sum(s) FROM pre) +
                  (SELECT sum(s) FROM post) AS BIGINT),
             CAST((SELECT count(*) FROM post) AS BIGINT)
      UNION ALL
      SELECT 'refused_narrowing', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
    """.trim))

  /** NESTED BLOOMCOLS (round-19 verdict #2): the q337 stats/bloom
    * asymmetry closed — point-lookup skipping reaches struct fields.
    * Keys are STRIPED mod 4 across the four commits, so every batch's
    * min/max envelope spans the whole domain and range stats are
    * BLIND (the layout Bloom sidecars exist for); each batch's
    * `meta.fmt` is unique to it. A `meta.<f> IN` probe — through a
    * nested RENAME, like q337 — opens only the admitting batch dirs:
    * the sidecar builder hashed the extracted inner value under the
    * dotted PHYSICAL key, and the pruning rule's point probe derives
    * the same key from the re-bound GetStructField chain. Legs:
    * the probed content and the `pruned_dirs` plan count (2 of 4).
    * A mis-keyed sidecar, a false negative, or a rename-blind probe
    * breaks the hash.
    */
  val q339 = GraftQuery(
    "q339_nested_bloom_skip",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q339_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, meta STRUCT<fmt: STRING, bytes: BIGINT>)
          TBLPROPERTIES('key'='k', 'bloomcols'='meta.fmt')""")
        Tables.orders(s, d).createOrReplaceTempView("q339_base")
        (0 until 4).foreach { b =>
          s.sql(s"""
            INSERT INTO graft.$table
            SELECT o_orderkey,
                   named_struct('fmt', 'f$b', 'bytes', o_orderkey)
            FROM q339_base WHERE o_orderkey % 4 = $b""")
        }
        s.sql(s"ALTER TABLE graft.$table RENAME COLUMN meta.fmt TO kind")
      }
      val q = s.table(s"graft.$table")
        .filter(col("meta.kind").isin("f1", "f3"))
      val dirs = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.size
            case _ => 0
          }
      }.sum
      q.agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("meta.bytes")).cast("long").as("sum_bytes"))
        .select(lit("content").as("leg"), col("n_rows"), col("sum_bytes"))
        .unionAll(s.range(1).select(lit("pruned_dirs").as("leg"),
          lit(dirs.toLong).as("n_rows"), lit(0L).as("sum_bytes")))
    },
    Some("""
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_bytes
      FROM orders WHERE o_orderkey % 4 IN (1, 3)
      UNION ALL
      SELECT 'pruned_dirs', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    """.trim))

  /** COLUMN POSITIONS (round-19 verdict #4 — the last ALTER refusal
    * that was neither a contract nor a capability gap, LIFTED):
    * declared order is pure presentation in a columnar layout
    * (parquet resolves by physical name), so `ALTER COLUMN ... AFTER`
    * and `ADD COLUMNS (... AFTER ...)` are metadata-only reorders,
    * fenced like renames. Legs: the current declared order, the
    * pre-move epoch's order (`VERSION AS OF 1` presents the ORIGINAL
    * column sequence), and the content under both batches — the
    * post-move INSERT binds by the NEW positional order, so a
    * mis-ordered write or a position-blind epoch read breaks the
    * hash.
    */
  val q340 = GraftQuery(
    "q340_column_positions",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q340_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (a BIGINT, b STRING, c BIGINT)
          TBLPROPERTIES('key'='a')""")
        Tables.orders(s, d).createOrReplaceTempView("q340_base")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS LONG)
          FROM q340_base WHERE o_orderdate < TIMESTAMP '1997-01-01'""")
        s.sql(s"ALTER TABLE graft.$table ALTER COLUMN c AFTER a")
        s.sql(s"ALTER TABLE graft.$table ADD COLUMNS (n BIGINT AFTER a)")
        // binds by the NEW declared order: (a, n, c, b)
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, o_orderkey % 7,
                 CAST(round(o_totalprice * 100) AS LONG), o_orderstatus
          FROM q340_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'""")
      }
      import s.implicits._
      val curOrder = s.table(s"graft.$table").schema.fieldNames.mkString(",")
      val epochOrder = s.sql(s"SELECT * FROM graft.$table VERSION AS OF 1")
        .schema.fieldNames.mkString(",")
      val content = s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          (sum(col("c")) + sum(coalesce(col("n"), lit(0L))))
            .cast("long").as("sum_c"))
        .select(lit("content").as("leg"), col("n_rows"), lit("").as("info"),
          col("sum_c"))
      content.unionAll(Seq(
        ("current_order", 0L, curOrder, 0L),
        ("epoch_order", 0L, epochOrder, 0L))
        .toDF("leg", "n_rows", "info", "sum_c"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate AS dt
        FROM orders)
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             '' AS info,
             CAST(sum(cents) + sum(CASE WHEN dt >= TIMESTAMP '1997-01-01'
               THEN k % 7 ELSE 0 END) AS BIGINT) AS sum_c
      FROM base
      UNION ALL
      SELECT 'current_order', CAST(0 AS BIGINT), 'a,n,c,b', CAST(0 AS BIGINT)
      UNION ALL
      SELECT 'epoch_order', CAST(0 AS BIGINT), 'a,b,c', CAST(0 AS BIGINT)
    """.trim))

  /** KEY-MOVING UPDATE on the NATIVE row-level route (round 19): the
    * refusal-inventory walk surfaced two hazards the registered-name
    * SQL route guarded but the V2 delta route did not — a collision
    * (two rows moving onto ONE key) silently committed duplicates,
    * and a moved key landing on an existing UNTOUCHED row duplicated
    * instead of replacing. Both now enforced at the delta commit
    * choke point (dup refusal; tombstone carries all data-batch keys
    * = V1 upsert parity). Legs: the refused collision (publishing
    * NOTHING — content unchanged counts), the post-move content
    * (replaced row gone, mover's value survives under the new key),
    * and the move commit's CDC delete count (both preimages). A
    * silent duplicate, a lost replace, or a phantom commit breaks
    * the hash.
    */
  val q341 = GraftQuery(
    "q341_rowlevel_key_move",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q341_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      Tables.orders(s, d).createOrReplaceTempView("q341_base")
      val Array(k1, k2) = s.sql(
        "SELECT o_orderkey FROM q341_base ORDER BY o_orderkey LIMIT 2")
        .collect().map(_.getLong(0))
      var refused = 0L
      if (!VersionedTable.latestVersion(path).exists(_ >= 2L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (k BIGINT, v BIGINT)
          TBLPROPERTIES('key'='k')""")
        s.sql(s"""
          INSERT INTO graft.$table
          SELECT o_orderkey, CAST(round(o_totalprice * 100) AS LONG)
          FROM q341_base""")
        // two rows onto one key: refused, and the refused commit
        // publishes NOTHING
        try s.sql(s"UPDATE graft.$table SET k = 0 WHERE k <= $k2")
        catch { case _: Exception => refused = 1L }
        // a unique move onto an existing untouched key REPLACES it
        s.sql(s"UPDATE graft.$table SET k = $k2 WHERE k = $k1")
      } else refused = 1L
      val latest = VersionedTable.latestVersion(path).get
      val content = s.table(s"graft.$table")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("v")).cast("long").as("sum_v"))
        .select(lit("content").as("leg"), col("n_rows"), col("sum_v"))
      val cdcDels = VersionedTable.readChangeFeed(s, path, latest - 1, latest)
        .filter(col("_change_type") === "delete").count()
      import s.implicits._
      content.unionAll(Seq(
        ("refused_collision", refused, 0L),
        ("cdc_deletes", cdcDels, 0L))
        .toDF("leg", "n_rows", "sum_v"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      k2row AS (SELECT k, cents FROM base ORDER BY k LIMIT 2)
      SELECT 'content' AS leg,
             CAST((SELECT count(*) FROM base) - 1 AS BIGINT) AS n_rows,
             CAST((SELECT sum(cents) FROM base) -
                  (SELECT cents FROM k2row ORDER BY k DESC LIMIT 1)
               AS BIGINT) AS sum_v
      UNION ALL
      SELECT 'refused_collision', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT 'cdc_deletes', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    """.trim))

  /** WIDENED CDC STREAM (round 19 — previously a construction-time
    * refusal: "widen and readChangeFeed do not compose yet"): the
    * change-feed walk's per-commit reads — insert batches AND the
    * position-scoped preimage views each tombstone semi-joins
    * against — now go through the stream's widened physical schema
    * (`readChangeFeedAs`), so a NARROW epoch's deleted rows arrive
    * as widened preimages and a narrow-typed tombstone key batch
    * casts to the widened types before the join. Legs: the initial
    * CDC snapshot over both epochs (inserts, promoted), the delete
    * wave's preimage count/sum (narrow-epoch rows, delivered wide),
    * and the final table content. A dropped preimage, a mis-cast
    * key join, or a double delivery breaks the hash.
    */
  val q342 = GraftQuery(
    "q342_widened_cdc_stream",
    (s, d) => {
      import graft.operators.VersionedTable
      import org.apache.spark.sql.streaming.Trigger
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val src = s"/tmp/graft_q342_src_$sfx"
      val ckpt = s"/tmp/graft_q342_ckpt_$sfx"
      val sink1 = s"/tmp/graft_q342_w1_$sfx"
      val sink2 = s"/tmp/graft_q342_w2_$sfx"
      val conf = s.sparkContext.hadoopConfiguration
      val complete = VersionedTable.latestVersion(src).exists(_ >= 3L) &&
        VersionedTable.latestVersion(sink1).nonEmpty &&
        VersionedTable.latestVersion(sink2).nonEmpty
      if (!complete) {
        Seq(src, ckpt, sink1, sink2).foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val f = p.getFileSystem(conf)
          if (f.exists(p)) f.delete(p, true)
        }
        Tables.orders(s, d).createOrReplaceTempView("q342_base")
        // narrow epoch: INT key, INT value
        VersionedTable.append(s.sql("""
          SELECT CAST(o_orderkey AS INT) AS k,
                 CAST(o_orderkey % 1000 AS INT) AS v
          FROM q342_base WHERE o_orderdate < TIMESTAMP '1997-01-01'"""),
          src)
        // wide epoch: LONG key, LONG value beyond int range
        VersionedTable.append(s.sql("""
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS LONG) + 3000000000 AS v
          FROM q342_base WHERE o_orderdate >= TIMESTAMP '1997-01-01'"""),
          src)
        def drain(sink: String, wave: String): Unit = {
          val q = s.readStream.format("graft")
            .option("widen", "true").option("readChangeFeed", "true")
            .load(src)
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
              if (!df.isEmpty)
                VersionedTable.append(
                  df.agg(
                    sum(when(col("_change_type") === "insert", 1L)
                      .otherwise(0L)).cast("long").as("n_ins"),
                    sum(when(col("_change_type") === "insert", col("v"))
                      .otherwise(0L)).cast("long").as("sum_ins"),
                    sum(when(col("_change_type") === "delete", 1L)
                      .otherwise(0L)).cast("long").as("n_del"),
                    sum(when(col("_change_type") === "delete", col("v"))
                      .otherwise(0L)).cast("long").as("sum_del")),
                  sink, txnId = Some(s"q342-$wave-$id"))
              ()
            }.start()
          q.awaitTermination(120000)
          ()
        }
        drain(sink1, "w1") // snapshot: both epochs as widened inserts
        // delete a slice of the NARROW epoch with an INT-typed key
        // frame — the stored tombstone is narrow too
        VersionedTable.deleteKeys(s.sql("""
          SELECT CAST(o_orderkey AS INT) AS k
          FROM q342_base
          WHERE o_orderdate < TIMESTAMP '1997-01-01'
            AND o_orderkey % 10 = 3"""), "k", src)
        drain(sink2, "w2") // exactly the widened preimage deletes
      }
      def leg(name: String, sink: String, n: String, sm: String) =
        VersionedTable.readLatest(s, sink)
          .agg(sum(col(n)).cast("long").as("n_rows"),
            sum(col(sm)).cast("long").as("sum_v"))
          .select(lit(name).as("leg"), col("n_rows"), col("sum_v"))
      val latest = VersionedTable.latestVersion(src).get
      val fin = VersionedTable.readAtWidened(s, src, latest)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("v")).cast("long").as("sum_v"))
        .select(lit("final_content").as("leg"), col("n_rows"), col("sum_v"))
      leg("wave1_snapshot", sink1, "n_ins", "sum_ins")
        .unionAll(leg("wave2_deletes", sink2, "n_del", "sum_del"))
        .unionAll(fin)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate AS dt
        FROM orders),
      pre AS (SELECT k, k % 1000 AS v FROM base
              WHERE dt < TIMESTAMP '1997-01-01'),
      post AS (SELECT k, cents + 3000000000 AS v FROM base
               WHERE dt >= TIMESTAMP '1997-01-01'),
      dels AS (SELECT k, v FROM pre WHERE k % 10 = 3)
      SELECT 'wave1_snapshot' AS leg,
             CAST((SELECT count(*) FROM pre) +
                  (SELECT count(*) FROM post) AS BIGINT) AS n_rows,
             CAST((SELECT sum(v) FROM pre) +
                  (SELECT sum(v) FROM post) AS BIGINT) AS sum_v
      UNION ALL
      SELECT 'wave2_deletes', CAST(count(*) AS BIGINT),
             CAST(sum(v) AS BIGINT)
      FROM dels
      UNION ALL
      SELECT 'final_content',
             CAST((SELECT count(*) FROM pre) + (SELECT count(*) FROM post)
                  - (SELECT count(*) FROM dels) AS BIGINT),
             CAST((SELECT sum(v) FROM pre) + (SELECT sum(v) FROM post)
                  - (SELECT sum(v) FROM dels) AS BIGINT)
    """.trim))

  /** ARRAY-ELEMENT DATA SKIPPING (round 19, completing the array
    * arc): `statscols = 'm.element.bytes'` records each batch's
    * envelope over ALL array elements (per-row array_min/array_max
    * of the extraction), and the pruning rule maps an
    * `exists(m, x -> x.bytes >= k)` predicate — "experiments with
    * ANY file over k bytes", the reference's file_manifest query
    * shape — onto that envelope: exists needs SOME element in range,
    * which is exactly what the envelope answers. Four quartile-
    * disjoint commits; the probe's `pruned_dirs` plan leg must read
    * 2 of 4 batch dirs before any footer opens, and the content leg
    * pins the answer unchanged.
    */
  val q343 = GraftQuery(
    "q343_array_element_stats_skip",
    (s, d) => {
      import graft.operators.VersionedTable
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"q343_docs_$sfx"
      val path = graftCatalog(s).tablePath(Seq(table))
      Tables.orders(s, d).createOrReplaceTempView("q343_base")
      val m = s.sql("SELECT max(o_orderkey) FROM q343_base")
        .collect().head.getLong(0)
      if (!VersionedTable.latestVersion(path).exists(_ >= 4L)) {
        s.sql(s"DROP TABLE IF EXISTS graft.$table")
        s.sql(s"""CREATE TABLE graft.$table (
          k BIGINT, m ARRAY<STRUCT<fmt: STRING, bytes: BIGINT>>)
          TBLPROPERTIES('key'='k', 'statscols'='m.element.bytes')""")
        (0 until 4).foreach { b =>
          val lo = m / 4 * b
          val hiCond =
            if (b == 3) "" else s"AND o_orderkey < ${m / 4 * (b + 1)}"
          s.sql(s"""
            INSERT INTO graft.$table
            SELECT o_orderkey,
                   array(named_struct('fmt', o_orderstatus,
                           'bytes', o_orderkey),
                         named_struct('fmt', 'aux', 'bytes', o_orderkey))
            FROM q343_base WHERE o_orderkey >= $lo $hiCond""")
        }
      }
      val half = m / 4 * 2
      val q = s.table(s"graft.$table")
        .filter(expr(s"exists(m, x -> x.bytes >= $half)"))
      val dirs = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.size
            case _ => 0
          }
      }.sum
      q.agg(count(lit(1)).cast("long").as("n_rows"),
        sum(expr(
          "aggregate(m, CAST(0 AS BIGINT), (acc, x) -> acc + x.bytes)"))
          .cast("long").as("sum_bytes"))
        .select(lit("content").as("leg"), col("n_rows"), col("sum_bytes"))
        .unionAll(s.range(1).select(lit("pruned_dirs").as("leg"),
          lit(dirs.toLong).as("n_rows"), lit(0L).as("sum_bytes")))
    },
    Some("""
      WITH m AS (SELECT max(o_orderkey) AS mx FROM orders),
      half AS (SELECT (mx // 4) * 2 AS h FROM m)
      SELECT 'content' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(2 * sum(o_orderkey) AS BIGINT) AS sum_bytes
      FROM orders WHERE o_orderkey >= (SELECT h FROM half)
      UNION ALL
      SELECT 'pruned_dirs', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    """.trim))

  def all: Seq[GraftQuery] = Seq(q16, q27, q85, q86, q115, q140, q259, q260,
    q261, q263, q264, q265, q267, q268, q269, q275, q276, q278, q280, q281,
    q282, q283, q284, q285, q286, q288, q289, q290, q291, q292, q293, q294,
    q295, q296, q297, q298, q299, q300, q301, q302, q303, q304, q305, q306,
    q307, q308, q309, q310, q311, q312, q313, q314, q315, q316, q317, q318,
    q319, q320, q321, q322, q323, q324, q325, q326, q327, q328, q329,
    q330, q331, q332, q333, q334, q335, q336, q337, q338, q339, q340,
    q341, q342, q343)
}
