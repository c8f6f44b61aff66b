package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Side-output channels (SURVEY §2.8 K3/K4/K8; reference:
  * lambda/agf_reconciliation_lambda.py:275-358): a notification sink
  * with a fallback chain, and observed metrics on DataFrames.
  * Channels are pluggable — the reference's SNS/SES become whatever
  * transport production provides; tests use in-memory channels.
  */
object Notify {

  /** Subject cap, matching the reference's SNS truncation (ref :304). */
  val MaxSubjectLen = 100

  trait Channel {
    def name: String
    def send(subject: String, body: String): Unit // throws on failure
  }

  final case class Delivery(channel: String, subject: String)

  /** K3: try each channel in order; first success wins; every failure
    * is collected. K8 (error notification) is this same chain invoked
    * from a job's catch block.
    */
  def sendWithFallback(channels: Seq[Channel], subject: String,
      body: String): Either[Seq[(String, Throwable)], Delivery] = {
    val truncated = subject.take(MaxSubjectLen)
    val failures = scala.collection.mutable.ListBuffer[(String, Throwable)]()
    channels.foreach { ch =>
      try {
        ch.send(truncated, body)
        return Right(Delivery(ch.name, truncated))
      } catch {
        case e: Exception => failures += ((ch.name, e))
      }
    }
    Left(failures.toList)
  }

  /** K4: attach named observed metrics (processed/error counters, the
    * A2 analog) to a DataFrame; values are published on the
    * QueryExecution listener bus when the DataFrame executes, without
    * a separate count() job.
    */
  def withIngestMetrics(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col("quarantine_reason").isNotNull, 1).otherwise(0)).as("n_quarantined"))
}
