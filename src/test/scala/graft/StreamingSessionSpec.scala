package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams

/** Stateful streaming sessionization: flatMapGroupsWithState over a
  * rate-limited replay must emit the same closed sessions the batch
  * windowed form computes (open sessions stay in state).
  */
class StreamingSessionSpec extends SparkTestBase {
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L

  test("batch sessionize splits on the gap and aggregates") {
    val events = Seq(
      (1L, ns(1000), 1.0), (1L, ns(1100), 2.0),   // session 1
      (1L, ns(4000), 3.0),                        // session 2 (gap > 1800)
      (2L, ns(500), 4.0))                         // other user
      .toDF("user_id", "ts", "value")
    val got = EventStreams.sessionizeBatch(events, 1800)
      .select("user_id", "session_idx", "n_events", "start_epoch", "end_epoch", "sum_value")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 1L, 2L, 1000L, 1100L, 3.0),
      (1L, 2L, 1L, 4000L, 4000L, 3.0),
      (2L, 1L, 1L, 500L, 500L, 4.0)))
  }

  test("streaming dedup drops redelivered keys within the watermark") {
    val root = tmpDir("dedup_stream")
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    Seq((10L, t(1000), "a"), (11L, t(1010), "b"))
      .toDF("event_id", "ts", "payload").coalesce(1)
      .write.parquet(s"$root/b1")
    // redelivery of event 10 (same key, within watermark) + a new one
    Seq((10L, t(1005), "a-dup"), (12L, t(1020), "c"))
      .toDF("event_id", "ts", "payload").coalesce(1)
      .write.parquet(s"$root/b2")
    val schema = spark.read.parquet(s"$root/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(root)
    val deduped = EventStreams.dedupStreaming(stream, Seq("event_id"), "ts", "10 minutes")
    val name = s"dd_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = spark.table(name).select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(10L, 11L, 12L)) // event 10 kept once
  }

  test("streaming sessionize emits closed sessions, keeps open state") {
    val root = tmpDir("sess_stream")
    // two micro-batch files processed in order (AvailableNow drains both,
    // but state persists across batches within the run)
    Seq((1L, ns(1000), 1.0), (1L, ns(1100), 2.0))
      .toDF("user_id", "ts", "value").coalesce(1)
      .write.parquet(s"$root/b1")
    Seq((1L, ns(4000), 3.0), (1L, ns(6500), 5.0))
      .toDF("user_id", "ts", "value").coalesce(1)
      .write.parquet(s"$root/b2")

    val schema = spark.read.parquet(s"$root/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(root)
    val sessions = EventStreams.sessionizeStreaming(stream, 1800)
    val name = s"sess_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name)
      .select("user_id", "start_epoch", "end_epoch", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // closed: (1000..1100) closed by the 4000 event; (4000) closed by 6500.
    // open: the 6500 session stays in state, not emitted.
    assert(got === Set(
      (1L, 1000L, 1100L, 2L, 3.0),
      (1L, 4000L, 4000L, 1L, 3.0)))
  }
}
