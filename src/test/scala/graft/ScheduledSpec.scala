package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.functions._
import graft.pipeline.ReconcileJob
import graft.streaming.Scheduled

/** S6 coverage: the in-engine recurring cadence (rate-source clock +
  * ProcessingTime trigger) fires the job body repeatedly with
  * monotonic batch ids, and stopping the query halts it — the
  * EventBridge-cron semantics, held inside the engine.
  */
class ScheduledSpec extends SparkTestBase {
  import spark.implicits._

  private def awaitAtLeast(counter: AtomicLong, n: Long, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (counter.get() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
  }

  test("cadence invokes the job once per tick with increasing batch ids, until stopped") {
    val fires = new AtomicLong(0)
    val lastBatch = new AtomicLong(-1)
    val monotonic = new AtomicLong(1) // 1 = true
    val q = Scheduled.cadence(spark, "200 milliseconds") { batchId =>
      if (batchId <= lastBatch.get()) monotonic.set(0)
      lastBatch.set(batchId)
      fires.incrementAndGet()
      ()
    }
    try {
      awaitAtLeast(fires, 3, timeoutMs = 60000)
      assert(fires.get() >= 3, s"scheduled job fired only ${fires.get()} times")
      assert(monotonic.get() == 1, "batch ids were not strictly increasing")
    } finally q.stop()
    // stop() halts the trigger, but a batch already IN FLIGHT may
    // complete just after it returns (amplified on a contended box);
    // let any straggler drain, then require silence
    Thread.sleep(800)
    val after = fires.get()
    Thread.sleep(800)
    assert(fires.get() == after, "job kept firing after the query was stopped")
  }

  test("cadence with a checkpointLocation resumes batch ids monotonically across restart") {
    val ckpt = tmpDir("sched_ckpt")
    val maxBefore = new AtomicLong(-1)
    val fires1 = new AtomicLong(0)
    val q1 = Scheduled.cadence(spark, "200 milliseconds", Some(ckpt)) { batchId =>
      maxBefore.updateAndGet(m => math.max(m, batchId))
      fires1.incrementAndGet()
      ()
    }
    try awaitAtLeast(fires1, 2, timeoutMs = 60000) finally q1.stop()
    assert(fires1.get() >= 2, s"first run fired only ${fires1.get()} times")
    // restart against the SAME checkpoint: the first batch id must
    // continue past the pre-restart maximum, never reset to 0
    val minAfter = new AtomicLong(Long.MaxValue)
    val fires2 = new AtomicLong(0)
    val q2 = Scheduled.cadence(spark, "200 milliseconds", Some(ckpt)) { batchId =>
      minAfter.updateAndGet(m => math.min(m, batchId))
      fires2.incrementAndGet()
      ()
    }
    try awaitAtLeast(fires2, 1, timeoutMs = 60000) finally q2.stop()
    assert(fires2.get() >= 1, "restarted cadence never fired")
    // >= not >: a batch IN FLIGHT when stop() landed may not have
    // committed its offset, and the restart legitimately REPLAYS that
    // batch id (at-least-once — the documented cadence contract). The
    // bug this guards against is a RESET (post-restart ids starting
    // over at 0 below the pre-restart maximum).
    assert(minAfter.get() >= maxBefore.get(),
      s"batch ids reset after restart: pre-max=${maxBefore.get()} post-min=${minAfter.get()}")
  }

  test("a reconcile run per tick is idempotent: every scheduled pass reports the same state") {
    val FIXED_NOW = 1768500000L
    val tables = tmpDir("sched_tables")
    Seq(("run1", "instr1", "K1", FIXED_NOW))
      .toDF("run_id", "instrument_id", "s3_key", "processed_at")
      .write.parquet(s"$tables/sync_runs")
    val listing = Seq(("K2", 10L, FIXED_NOW - 100))
      .toDF("key", "size", "last_modified_epoch")
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val fires = new AtomicLong(0)
    val q = Scheduled.cadence(spark, "200 milliseconds") { _ =>
      val rep = ReconcileJob.run(spark, listing, tables, FIXED_NOW)
      reports.add((rep.orphanedInS3, rep.orphanedInDb))
      fires.incrementAndGet()
      ()
    }
    try awaitAtLeast(fires, 2, timeoutMs = 120000) finally q.stop()
    assert(fires.get() >= 2, s"reconcile ran only ${fires.get()} times")
    // the weekly job re-run on a cadence is a pure report: every pass
    // sees the same orphans, none mutates state
    import scala.jdk.CollectionConverters._
    assert(reports.asScala.toSet == Set((1L, 1L)),
      s"scheduled reconcile passes disagreed: ${reports.asScala.toList}")
  }
}
