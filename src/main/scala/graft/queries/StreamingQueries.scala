package graft.queries

import graft.Tables
import graft.streaming.EventStreams

/** Driver-checkable streaming queries: the streaming result must
  * equal its batch-SQL equivalent (the DuckDB oracle), proving
  * batch/stream unification on the same transforms.
  */
object StreamingQueries extends QueryRegistry {

  /** Tumbling 1-hour windowed aggregate, run as an actual Structured
    * Streaming query (AvailableNow, complete mode) — verified against
    * the batch date_trunc rollup.
    */
  val q40 = GraftQuery(
    "q40_stream_hourly_rollup",
    (s, d) => EventStreams.hourlyRollupStreaming(s, d,
      s"q40_mem_${System.nanoTime()}"),
    Some("""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
    """.trim))

  /** Gap-based sessionization (30-min inactivity), batch windowed
    * form; the streaming twin (flatMapGroupsWithState) is covered by
    * StreamingSessionSpec.
    */
  val q41 = GraftQuery(
    "q41_sessionize",
    (s, d) => EventStreams.sessionizeBatch(Tables.events(s, d), gapSeconds = 1800),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM flagged)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
             epoch_ns(min(ts)) // 1000000000 AS start_epoch,
             epoch_ns(max(ts)) // 1000000000 AS end_epoch,
             round(sum(value), 2) AS sum_value
      FROM sessions
      GROUP BY user_id, session_idx
    """.trim))

  /** Streaming dedup (dropDuplicatesWithinWatermark) proven by
    * construction: the event stream unioned with itself — every key
    * duplicated — must collapse back to exactly the batch DISTINCT.
    * Without the dedup the row count doubles, so the oracle compare
    * genuinely exercises the state store, not just the passthrough.
    */
  val q43 = GraftQuery(
    "q43_stream_dedup",
    (s, d) => EventStreams.dedupSelfUnionStreaming(s, d,
      s"q43_mem_${System.nanoTime()}"),
    Some("""
      SELECT DISTINCT user_id, epoch_us(ts) AS ts_us FROM events
    """.trim))

  /** Stream-stream attribution join (clicks x purchases within 30
    * minutes, per user) with watermarks bounding both join states —
    * verified against the batch range join in DuckDB.
    */
  val q49 = GraftQuery(
    "q49_stream_stream_join",
    (s, d) => EventStreams.clickPurchaseJoinStreaming(s, d,
      s"q49_mem_${System.nanoTime()}"),
    Some("""
      SELECT a.user_id, epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS purchase_us
      FROM events a JOIN events b ON a.user_id = b.user_id
      WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """.trim))

  /** Stream-static enrichment: event stream joined to the static
    * customer dimension (no watermark needed on the static side) —
    * verified against the batch join.
    */
  val q56 = GraftQuery(
    "q56_stream_static_enrich",
    (s, d) => EventStreams.enrichWithCustomersStreaming(s, d,
      s"q56_mem_${System.nanoTime()}"),
    Some("""
      SELECT e.user_id, epoch_us(e.ts) AS ts_us, c.c_mktsegment
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """.trim))

  /** Per-user running profile on transformWithState (Spark 4's
    * arbitrary-state API): ValueState count/sum-cents + MapState
    * distinct-type registry, RocksDB-backed. The batch oracle is the
    * plain per-user aggregate — counts, sums, and type cardinality
    * are monotone, so the max over per-batch emissions equals the
    * final state regardless of micro-batch splits.
    */
  val q142 = GraftQuery(
    "q142_stream_user_profile",
    (s, d) => EventStreams.userProfileStreaming(s, d,
      s"q142_mem_${System.nanoTime()}"),
    Some("""
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events
      GROUP BY user_id
    """.trim))

  /** Gap sessionization through the BUILT-IN session_window aggregate
    * — the declarative twin of q41's explicit-state form (one
    * semantics, two paths: Catalyst plans a session-merge aggregate,
    * no user state code, and the same expression works unchanged in
    * streaming mode). Semantics note: session_window merges on
    * overlap (diff < gap), so the oracle's new-session predicate is
    * >= gap — q41's explicit form uses > gap; the boundary case
    * (diff exactly = gap) differs by design between the two
    * declarations and nanosecond data never lands on it by accident.
    */
  val q148 = GraftQuery(
    "q148_session_window_builtin",
    (s, d) => {
      import org.apache.spark.sql.functions._
      Tables.events(s, d)
        .select(col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("tstamp"),
          round(col("value") * 100).cast("long").as("vc"))
        .groupBy(col("user_id"),
          session_window(col("tstamp"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_value_c"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"), col("sum_value_c"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
      flagged AS (
        SELECT user_id, us, vc,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      sess AS (
        SELECT user_id, us, vc,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
             count(*) AS n_events, CAST(sum(vc) AS BIGINT) AS sum_value_c
      FROM sess
      GROUP BY user_id, sid
    """.trim))

  /** Stream-stream LEFT OUTER range join (q49's inner form plus
    * watermark-driven null emission): the abandonment feed. The
    * oracle replays the eviction cutoff — unmatched clicks appear
    * only when the global watermark (min of both streams' max event
    * time − 1h delay) passed click_ts + 30min before the drain
    * ended; matched rows are cutoff-free.
    */
  val q194 = GraftQuery(
    "q194_stream_outer_join",
    (s, d) => EventStreams.clickPurchaseOuterJoinStreaming(s, d,
      s"q194_mem_${System.nanoTime()}"),
    Some("""
      WITH c AS (SELECT user_id, epoch_us(ts) AS click_us FROM events
                 WHERE event_type = 'click'),
      p AS (SELECT user_id, epoch_us(ts) AS purchase_us FROM events
            WHERE event_type = 'purchase'),
      wm AS (SELECT least((SELECT max(click_us) FROM c),
                          (SELECT max(purchase_us) FROM p))
                    - 3600000000 AS wm_us),
      matched AS (
        SELECT c.user_id, c.click_us, p.purchase_us
        FROM c JOIN p ON c.user_id = p.user_id
          AND p.purchase_us >= c.click_us
          AND p.purchase_us <= c.click_us + 1800000000),
      unmatched AS (
        SELECT c.user_id, c.click_us, CAST(NULL AS BIGINT) AS purchase_us
        FROM c CROSS JOIN wm
        WHERE c.click_us + 1800000000 < wm.wm_us
          AND NOT EXISTS (
            SELECT 1 FROM p WHERE p.user_id = c.user_id
              AND p.purchase_us >= c.click_us
              AND p.purchase_us <= c.click_us + 1800000000))
      SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """.trim))

  /** Sliding-window rate rollup: 10-minute windows sliding by 5 —
    * every event counted in two overlapping windows (the SLO-monitor
    * shape). The oracle expands each event into both windows it
    * belongs to.
    */
  val q195 = GraftQuery(
    "q195_stream_sliding_rate",
    (s, d) => EventStreams.slidingRateStreaming(s, d,
      s"q195_mem_${System.nanoTime()}"),
    Some("""
      WITH e AS (SELECT event_type,
                        epoch_ns(ts) // 1000000000 AS sec,
                        CAST(round(value * 100) AS BIGINT) AS vc
                 FROM events),
      w AS (SELECT event_type, vc, sec // 300 * 300 AS w_start FROM e
            UNION ALL
            SELECT event_type, vc, sec // 300 * 300 - 300 FROM e)
      SELECT w_start, event_type, count(*) AS n_events,
             CAST(sum(vc) AS BIGINT) AS sum_value_c
      FROM w GROUP BY 1, 2
    """.trim))

  /** Streaming IVF index maintenance — q143's append lifecycle driven
    * by an actual stream: the index is built on 90% of the corpus,
    * the held-out 10% arrives as a Structured Streaming source and
    * each micro-batch APPENDS into the partitioned layout inside
    * foreachBatch (cluster dirs gain files, nothing rewritten — the
    * dedup-store discipline applied to ANN: index state lives in the
    * sink table, not in operator state). The search then runs over
    * the union through the partition-pruned path, against q28's
    * FULL-corpus oracle — a dropped or double-appended micro-batch
    * row changes a top-k list and breaks the hash.
    */
  val q230 = GraftQuery(
    "q230_stream_ivf_append",
    (s, d) => {
      import org.apache.spark.sql.functions.col
      val Sim = graft.operators.Similarity
      val path = "/tmp/graft_q230_stream_ivf_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 8)
      Sim.ivfIndexWrite(emb.filter(col("vec_id") % 10 =!= 0), cents,
        "vec_id", "embedding", "vec_id", "embedding", path,
        targetRowsPerFile = 256L)
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      val delta = s.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(d)
        .filter(col("vec_id") % 10 === 0)
      val q = delta.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // foreachBatch is at-least-once: a replayed micro-batch must
          // not double-append (a duplicated row changes top-k lists).
          // Idempotence = anti-join the batch against ids already in
          // the index — the (id)-only read is columnar-pruned and the
          // replay window is one batch, so the check is a narrow scan,
          // not a second copy of the index
          if (!batch.isEmpty) {
            val present = s.read.parquet(path).select(col("id"))
            val fresh = batch.join(present,
              batch("vec_id") === present("id"), "left_anti")
            if (!fresh.isEmpty)
              Sim.ivfIndexAppend(fresh, cents, "vec_id", "embedding",
                "vec_id", "embedding", path, targetRowsPerFile = 256L)
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Sim.ivfTopKIndexed(s, path, emb.filter(col("vec_id") < 3), cents,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
    },
    SimilarityQueries.q28.oracle)

  /** Streaming IVFADC maintenance — q230's lifecycle upgraded to the
    * composed index: the IVFADC store (codes + codebook + centroids)
    * is built on 90% of the corpus, the held-out 10% arrives as a
    * stream, and each micro-batch is PQ-ENCODED AGAINST THE STORED
    * CODEBOOK and appended into the partitioned layout
    * (ivfPqIndexAppend's geometry guard refuses a mismatched store) —
    * so the streamed-into index is search-ready with no re-encode
    * pass. Appends are idempotent under foreachBatch's at-least-once
    * contract (anti-join on stored ids). The search then runs the
    * full ADC + re-rank path over base + appended codes, against an
    * oracle that replays the composition with PQ training restricted
    * to the base 90% but encoding over everything — a batch row
    * encoded against the wrong codebook breaks the hash.
    */
  val q236 = GraftQuery(
    "q236_stream_ivfpq_append",
    (s, d) => {
      import org.apache.spark.sql.functions.col
      val Sim = graft.operators.Similarity
      val path = "/tmp/graft_q236_stream_ivfpq_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 8)
      if (!Sim.ivfPqIndexComplete(s, path, m = 4, kCodes = 16, subDim = 16))
        Sim.ivfPqIndexWrite(emb.filter(col("vec_id") % 10 =!= 0), cents,
          "vec_id", "embedding", "vec_id", "embedding",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L)
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      val delta = s.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(d)
        .filter(col("vec_id") % 10 === 0)
      val q = delta.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val present = s.read.parquet(s"$path/index").select(col("id"))
            val fresh = batch.join(present,
              batch("vec_id") === present("id"), "left_anti")
            if (!fresh.isEmpty)
              Sim.ivfPqIndexAppend(s, fresh, "vec_id", "embedding",
                m = 4, kCodes = 16, subDim = 16, path,
                targetRowsPerFile = 256L)
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Sim.ivfPqTopK(s, path, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 5, nprobe = 2, shortlistN = 20)
    },
    Some(SimilarityQueries.ivfPqSearchOracleSql(c => s"$c % 10 <> 0", "")))

  /** Streaming perceptual-hash store — incremental multimodal dedup:
    * clips arrive as micro-batches, each batch pays the EXPENSIVE
    * work once (real PNG decode → aHash) and appends its hashes to a
    * parquet store (idempotent under at-least-once replay via a
    * doc_id anti-join — the q230 discipline); duplicate RESOLUTION
    * happens at read time as a min-id-per-fingerprint view over the
    * append-only hash log, so the outcome is independent of how the
    * stream was batched (a first-write-wins store would make the
    * canonical depend on batch boundaries). The oracle replays every
    * frame-0 hash from the fixture's pixel formula and the grouping.
    */
  val q250 = GraftQuery(
    "q250_stream_image_hash_store",
    (s, d) => {
      import org.apache.spark.sql.functions.{col, count, lit, min}
      val M = graft.operators.Multimodal
      val path = "/tmp/graft_q250_stream_phash_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
        .select(col("doc_id"))
      val q = src.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val hashes = M.perceptualHashes(M.decodeFrames(
                M.syntheticClips(batch))).toDF()
              .filter(col("frame_idx") === 0)
              .select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"))
            val fresh =
              if (new java.io.File(s"$path/_SUCCESS").exists()) {
                val present = s.read.parquet(path).select(col("doc_id").as("pid"))
                hashes.join(present, hashes("doc_id") === col("pid"), "left_anti")
              } else hashes
            if (!fresh.isEmpty)
              fresh.write.mode("append").parquet(path)
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(path)
        .groupBy(col("c0"), col("c1"), col("c2"), col("c3"))
        .agg(count(lit(1)).as("n_clips"), min(col("doc_id")).as("canonical_id"))
    },
    Some("""
      WITH dims AS (
        SELECT doc_id,
               16 + doc_id % 17 AS w,
               16 + doc_id % 13 AS hh
        FROM documents),
      samp AS (
        SELECT doc_id, t.k,
               ((((t.k % 8) * w) // 8) * 7 + (((t.k // 8) * hh) // 8) * 13 +
                doc_id * 31) % 256 AS s
        FROM dims CROSS JOIN range(0, 64) t(k)),
      tot AS (SELECT doc_id, sum(s) AS tot FROM samp GROUP BY 1),
      bits AS (
        SELECT s.doc_id, s.k,
               CASE WHEN s.s * 64 >= t.tot THEN 1 ELSE 0 END AS b
        FROM samp s JOIN tot t ON t.doc_id = s.doc_id),
      hash AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN k < 16 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN k >= 16 AND k < 32 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN k >= 32 AND k < 48 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS c2,
               CAST(sum(CASE WHEN k >= 48 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS c3
        FROM bits GROUP BY 1)
      SELECT c0, c1, c2, c3, CAST(count(*) AS BIGINT) AS n_clips,
             CAST(min(doc_id) AS BIGINT) AS canonical_id
      FROM hash GROUP BY 1, 2, 3, 4
    """.trim))

  /** Streaming publish into the versioned table with the txn guard:
    * each micro-batch commits as a new version carrying its batchId
    * as the transaction id, so foreachBatch's at-least-once replay
    * can never double-publish — a replayed batch finds its txn on
    * the latest manifest and no-ops (the Delta-style idempotent-sink
    * discipline, spec-proven in VersionedTableSpec). The declared
    * result reads the LATEST version back; a dropped or
    * double-committed batch changes the aggregate and breaks the
    * full-table oracle.
    */
  val q262 = GraftQuery(
    "q262_stream_versioned_publish",
    (s, d) => {
      import org.apache.spark.sql.functions.{col, count, lit, round, sum}
      val VT = graft.operators.VersionedTable
      val path = "/tmp/graft_q262_stream_vt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val schema = s.read.parquet(s"$d/orders.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(d)
      val q = src.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          if (!batch.isEmpty)
            VT.append(batch, path, txnId = Some(s"stream-$bid"))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      VT.readLatest(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      FROM orders
      GROUP BY 1
    """.trim))

  def all: Seq[GraftQuery] =
    Seq(q40, q41, q43, q49, q56, q142, q148, q194, q195, q230, q236, q250,
      q262)
}
