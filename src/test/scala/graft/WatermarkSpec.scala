package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Watermark semantics: in append mode with a watermark, a window
  * only emits once the watermark passes it, and events arriving
  * after the watermark has moved past their window are dropped —
  * the bounded-state guarantee the 100 TB streaming design relies
  * on (vs the reference's accept-forever + idempotent-sink model,
  * SURVEY §2.9 T3, which q40 preserves by using complete mode).
  */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  test("append-mode windowed agg drops events later than the watermark") {
    val root = tmpDir("wm")
    val ckpt = tmpDir("wm_ckpt")
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // run 1: events at 10:01 and 10:31 -> watermark persists at 10:21
    Seq((1L, ts(1), 1.0), (2L, ts(31), 1.0))
      .toDF("id", "ts", "v").coalesce(1).write.parquet(s"$root/b1")
    val schema = spark.read.parquet(s"$root/b1").schema
    val outDir = tmpDir("wm_out")

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(root)
      val agg = stream
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .select(col("window.start").cast("long").as("w"), col("n"), col("sv"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // run 2 (same checkpoint, watermark restored): a late event at
    // 10:02 (watermark 10:21 already passed its window) and an
    // on-time one at 10:32
    Seq((3L, ts(2), 100.0), (4L, ts(32), 1.0))
      .toDF("id", "ts", "v").coalesce(1).write.parquet(s"$root/b2")
    drain()

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val w1000 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime / 1000
    // the 10:00 window emitted with ONLY the on-time event — the late
    // id=3 (v=100.0) was dropped, not merged
    assert(out.get(w1000) === Some((1L, 1.0)))
  }
}
