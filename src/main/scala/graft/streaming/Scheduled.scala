package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** In-engine recurring job cadence (SURVEY §2.1 S6): the reference
  * schedules its reconciliation Lambda with an EventBridge cron rule
  * (cloudformation/agf-reconciliation-stack.yaml:142-151,
  * eventbridge/event-rules.json:52-63); the Spark-native
  * re-expression is a Structured Streaming CLOCK — the rate source
  * ticks, `Trigger.ProcessingTime` paces the micro-batches, and
  * `foreachBatch` invokes the job body once per tick. The scheduler
  * is the engine's own trigger machinery: restart-safe (a killed
  * driver resumes ticking on restart), cluster-deployable (the query
  * lives wherever the SparkSession does), and composable with every
  * other streaming query in the session.
  *
  * Restart semantics: the cadence does NOT restart itself — a killed
  * driver resumes ticking only when the caller re-invokes `cadence`
  * on startup (the same contract as every Structured Streaming
  * query). Pass `checkpointLocation` to make batch ids MONOTONIC
  * across those restarts; without it the query uses a temporary
  * checkpoint and batch ids reset to 0 on every invocation.
  *
  * An external orchestrator (cron/Airflow → spark-submit) remains the
  * right choice when the cluster should not sit idle between runs;
  * this operator covers the reference semantic when it should.
  */
object Scheduled {

  /** Invoke `job(batchId)` once per `interval` tick until the caller
    * stops the returned query. The rate source emits one row per
    * second as the clock signal; each ProcessingTime trigger drains
    * the accumulated ticks as ONE batch, so `job` runs once per
    * interval regardless of tick backlog (a slow job run never queues
    * a burst of catch-up invocations — the EventBridge semantics).
    */
  def cadence(spark: SparkSession, interval: String,
      checkpointLocation: Option[String] = None)
      (job: Long => Unit): StreamingQuery = {
    val writer = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch { (_: DataFrame, batchId: Long) => job(batchId) }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }
}
