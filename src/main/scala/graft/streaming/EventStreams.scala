package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming operators over the events table (T1/T6 in
  * SURVEY §2.9 and the beyond-reference streaming surface).
  *
  * The events testdata carries nanosecond timestamps, read as nanos
  * longs (see graft.Tables); tsCol here is that long column.
  */
object EventStreams {

  /** Cap on shuffle/state-store partitions for the micro-batch drains
    * below, applied for the stream's lifetime and restored after.
    *
    * Why (optimization guide §2.2 fixed-cost-per-partition, r19
    * verdict item 2): AQE is disabled inside streaming queries, so
    * every micro-batch shuffles into a FIXED `spark.sql.shuffle
    * .partitions` state-store partitions no matter how few rows the
    * batch carries — at 32 cores the stream-stream joins paid 32 state
    * stores x several micro-batches of pure per-partition setup and
    * ran 2.5x SLOWER than at 8 cores (driver r19 scaling record:
    * q49 6.5 s @32c vs 2.8 s @8c). Production Structured Streaming
    * pins this number anyway: the state-store count is frozen at the
    * first checkpoint, so "cores at submit time" is the wrong default
    * at ANY scale. Deployments size it to expected state volume via
    * `spark.graft.stream.shufflePartitions`; the local default caps at
    * 8 (results are partition-count-independent — same rows, verified
    * by the oracle across both cpu settings the driver runs).
    */
  private def withStreamShufflePartitions[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    val cap = spark.conf.getOption("spark.graft.stream.shufflePartitions")
      .map(_.toInt)
      .getOrElse(math.min(spark.sparkContext.defaultParallelism, 8))
    spark.conf.set(key, cap.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The events table as a streaming source with the engine's
    * long-nanos `ts` contract restored (graft.Tables.normalizeEventTs)
    * — the fixture's physical encoding has varied between
    * TIMESTAMP(NANOS) and timestamp[us] across driver regenerations,
    * and every consumer below does long-nanos arithmetic on `ts`.
    */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Tumbling-window aggregate as a streaming query over a parquet
    * directory, drained with Trigger.AvailableNow into a memory sink
    * (complete mode), returned as a DataFrame. Batch-equivalent:
    * groupBy(date_trunc) — which is exactly what the DuckDB oracle
    * runs. Watermark bounds state for continuous deployments.
    */
  def hourlyRollupStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
      .withColumn("ts_sec", expr("ts div 1000000000").cast("timestamp"))
    val agg = stream
      .withWatermark("ts_sec", "1 hour")
      .groupBy(window(col("ts_sec"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
    withStreamShufflePartitions(spark) {
      val q = agg.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Streaming dedup on a key with bounded state: duplicates arriving
    * within the watermark horizon are dropped; state for keys older
    * than the watermark is evicted (dropDuplicatesWithinWatermark,
    * Spark 3.5+). This is the belt-and-braces redelivery guard of
    * SURVEY §2.9 T2 — the idempotent merge sink remains the source of
    * truth; this bounds how much duplicate work ever reaches it.
    * eventTimeCol must be a timestamp column with a watermark set by
    * the caller via delay.
    */
  def dedupStreaming(events: DataFrame, keyCols: Seq[String],
      eventTimeCol: String, delay: String): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Driver-checkable wrapper for dedupStreaming: reads the events
    * stream TWICE and unions the two (every (user_id, ts) key now
    * appears at least twice, possibly in different micro-batches),
    * then drains the deduped stream into a memory sink. The surviving
    * key set equals batch DISTINCT regardless of which physical row
    * wins, so only the key columns are emitted.
    */
  def dedupSelfUnionStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    // dedup key is the MICROSECOND timestamp: DuckDB timestamps are
    // microsecond precision, so a nanos key could never hash-match
    // the oracle (and two events inside one microsecond must collapse
    // identically in both engines)
    def readOnce() = eventsStream(spark, sfDir)
      .withColumn("ts_sec", expr("ts div 1000000000").cast("timestamp"))
      .withColumn("ts_us", expr("ts div 1000"))
    val doubled = readOnce().union(readOnce())
    val deduped = dedupStreaming(doubled, Seq("user_id", "ts_us"), "ts_sec", "1 hour")
      .select(col("user_id"), col("ts_us"))
    withStreamShufflePartitions(spark) {
      val q = deduped.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Streaming ingest dedup against a persisted MinHash signature
    * store — the 100 TB ingest shape end-to-end: each micro-batch of
    * newly-arrived documents is deduped against the STORED corpus
    * signatures (`Dedup.minhashLshPairsAgainstStore`) inside
    * foreachBatch. The corpus is never re-tokenized; each batch pays
    * one broadcast of its own band keys over a scan of the stored
    * bands, and matches append to the sink. foreachBatch (not a
    * stateful operator) because the dedup state IS the store — the
    * same state-lives-in-the-sink-table principle as the ingest
    * pipeline's anti-join merge (SURVEY §2.9 T3).
    */
  def dedupAgainstStoreStreaming(newDocs: DataFrame, storePath: String,
      idCol: String, textCol: String, n: Int, bands: Int,
      rowsPerBand: Int, threshold: Double)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.Dedup.minhashLshPairsAgainstStore(
            batch, storePath, idCol, textCol, n, bands, rowsPerBand,
            threshold))
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-stream inner join with event-time range condition: clicks
    * joined to the same user's purchases within the next 30 minutes
    * (attribution join). Both sides carry watermarks and the join
    * condition bounds event time in both directions, so each side's
    * buffered state is evicted once the other side's watermark passes
    * — bounded state on unbounded streams, the canonical Structured
    * Streaming join discipline. Timestamps are truncated to
    * microseconds on both sides (oracle parity: DuckDB time is us).
    */
  def clickPurchaseJoinStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    def readType(t: String, tsName: String, userName: String) =
      eventsStream(spark, sfDir)
        .filter(col("event_type") === t)
        .select(col("user_id").as(userName),
          expr("timestamp_micros(ts div 1000)").as(tsName))
        .withWatermark(tsName, "1 hour")
    val clicks = readType("click", "click_ts", "user_id")
    val purchases = readType("purchase", "purchase_ts", "p_user_id")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"))
      .select(col("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"))
    withStreamShufflePartitions(spark) {
      val q = joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Stream-stream LEFT OUTER range join: every click, matched to
    * its purchases within 30 minutes OR emitted with nulls once the
    * watermark proves no purchase can still arrive — the abandonment
    * feed. Outer emission is watermark-driven state eviction: a
    * buffered click releases its null row only when the GLOBAL
    * watermark (min over both streams' max-event-time − delay)
    * passes click_ts + 30min, so clicks too close to the end of the
    * stream stay unmatched-but-unemitted (the batch oracle applies
    * the same cutoff). Matched rows emit on arrival, cutoff-free.
    */
  def clickPurchaseOuterJoinStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    def readType(t: String, tsName: String, userName: String) =
      eventsStream(spark, sfDir)
        .filter(col("event_type") === t)
        .select(col("user_id").as(userName),
          expr("timestamp_micros(ts div 1000)").as(tsName))
        .withWatermark(tsName, "1 hour")
    val clicks = readType("click", "click_ts", "user_id")
    val purchases = readType("purchase", "purchase_ts", "p_user_id")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"),
      "left_outer")
      .select(col("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"))
    withStreamShufflePartitions(spark) {
      val q = joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Sliding-window rate rollup: 10-minute windows every 5 minutes
    * per event type — each event lands in two overlapping windows,
    * the shape rate monitors and SLO dashboards read. Complete
    * output mode over the finite drain (the q40 pattern) so tail
    * windows are not watermark-clipped.
    */
  def slidingRateStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
      .withColumn("ts_sec", expr("ts div 1000000000").cast("timestamp"))
    val agg = stream
      .withWatermark("ts_sec", "1 hour")
      .groupBy(window(col("ts_sec"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as long)")).as("sum_value_c"))
      .select(col("window.start").cast("long").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value_c"))
    withStreamShufflePartitions(spark) {
      val q = agg.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Stream-static enrichment join: the event stream joined to the
    * static customer dimension — the canonical streaming lookup. The
    * static side needs no watermark (it is re-planned per
    * micro-batch, which is also what picks up dimension updates); on
    * a cluster the dimension broadcasts per batch.
    */
  def enrichWithCustomersStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = stream.join(customers, col("user_id") === col("c_custkey"))
      .select(col("user_id"), col("ts_us"), col("c_mktsegment"))
    withStreamShufflePartitions(spark) {
      val q = joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Batch sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds gapSeconds. Pure window
    * functions — one shuffle on user_id; SQL-expressible, so the
    * oracle can verify it.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapNanos = gapSeconds * 1000000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNanos, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(ts) div 1000000000").as("start_epoch"),
        expr("max(ts) div 1000000000").as("end_epoch"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  final case class SessionOut(user_id: Long, start_epoch: Long, end_epoch: Long,
      n_events: Long, sum_value: Double)

  /** Streaming sessionization with explicit state
    * (flatMapGroupsWithState): emits a session when the inactivity
    * gap passes. The streaming twin of sessionizeBatch for unbounded
    * input; state is one small record per active user.
    */
  def sessionizeStreaming(events: DataFrame, gapSeconds: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapNanos = gapSeconds * 1000000000L
    events.select(col("user_id").cast("long"), col("ts").cast("long"),
      col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Double), SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        // state tuple: (sessionStart, lastTs, nEvents, sumValue)
        (user: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[(Long, Long, Long, Double)]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          val out = scala.collection.mutable.ListBuffer[SessionOut]()
          var st = state.getOption.orNull
          sorted.foreach { case (_, ts, v) =>
            if (st == null) st = (ts, ts, 1L, v)
            else if (ts - st._2 > gapNanos) {
              out += SessionOut(user, st._1 / 1000000000L,
                st._2 / 1000000000L, st._3, st._4)
              st = (ts, ts, 1L, v)
            } else st = (st._1, ts, st._3 + 1, st._4 + v)
          }
          if (st != null) state.update(st)
          out.iterator
      }.toDF()
  }

  final case class UserProfile(user_id: Long, n_events: Long,
      sum_value_c: Long, n_types: Long)

  /** Per-user running profile on `transformWithState` (Spark 4's
    * arbitrary-state API, the successor to flatMapGroupsWithState):
    * ValueState holds the (count, sum-cents) pair, MapState the
    * distinct event-type registry — the composed-state shape the old
    * API forced into one monolithic tuple. State is per-key and
    * RocksDB-backed (the API requires the RocksDB provider), so an
    * unbounded key space spills to local disk instead of executor
    * heap; TTLConfig.NONE here because the batch-replay oracle must
    * see every key's final state (a deployment would set a TTL).
    */
  class UserProfileProcessor extends
      org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, String, Long), UserProfile] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var types: MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)]("totals",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      types = getHandle.getMapState[String, Long]("types",
        E.STRING, E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[UserProfile] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, t, vc) =>
        n += 1; s += vc
        types.updateValue(t,
          (if (types.containsKey(t)) types.getValue(t) else 0L) + 1L)
      }
      totals.update((n, s))
      Iterator.single(UserProfile(key, n, s, types.keys().size.toLong))
    }
  }

  /** Driver-checkable wrapper: the events stream through
    * UserProfileProcessor, drained with AvailableNow. Counts, sums,
    * and distinct-type cardinalities are all monotone in the event
    * stream, so a max-aggregate over the per-batch emissions IS the
    * final state no matter how the source splits micro-batches.
    */
  def userProfileStreaming(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    import spark.implicits._
    // transformWithState requires the RocksDB provider; scope it to
    // this query and restore the session's previous setting after
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, graft.GraftSession.RocksDbProvider)
    try {
    val stream = eventsStream(spark, sfDir)
      .select(col("user_id").cast("long"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"))
      .as[(Long, String, Long)]
    val out = stream.groupByKey(_._1)
      .transformWithState(new UserProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
    withStreamShufflePartitions(spark) {
      val q = out.toDF().writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // localCheckpoint: materialize before the provider conf reverts
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("sum_value_c")).as("sum_value_c"),
        max(col("n_types")).as("n_types"))
      .localCheckpoint(true)
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
