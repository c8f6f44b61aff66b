package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table:
  * region nation customer supplier part orders lineitem events
  * documents embeddings.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // The engine-wide contract is events.ts = BIGINT nanoseconds
      // since the epoch (UTC). The fixture's physical encoding has
      // varied across driver regenerations — TIMESTAMP(NANOS) (which
      // Spark's vectorized reader only accepts as a long via
      // nanosAsLong) and timestamp[us] (read as TIMESTAMP_NTZ) — so
      // the loader adapts to whatever it finds and normalizes back to
      // the long-nanos contract instead of hard-coding one encoding.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NTZ->TZ cast interprets the wall clock in the session time
      // zone; the fixture's wall clocks are UTC, so pin it here
      // rather than trusting the caller's session config.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Restore the long-nanos `ts` contract regardless of the parquet
    * physical type the fixture was written with. Public because the
    * streaming readers (graft.streaming.EventStreams) must apply the
    * same normalization to their readStream DataFrames — the
    * expression is a plain projection, so it is streaming-safe.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    val toNanos: Option[Column] = df.schema("ts").dataType match {
      case LongType         => None // TIMESTAMP(NANOS) via nanosAsLong: already the contract
      case TimestampNTZType => Some(unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType    => Some(unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected nanos-long, timestamp, or timestamp_ntz)")
    }
    toNanos.fold(df)(c => df.withColumn("ts", c))
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
