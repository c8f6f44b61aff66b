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
