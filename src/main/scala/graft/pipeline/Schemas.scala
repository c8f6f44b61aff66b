package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for the two manifest documents and the derived
  * tables (FIXTURES.md §1-4; reference: lambda/agf_ingestion_lambda
  * .py). Schemas are declared, never inferred — at 100 TB schema
  * inference is a full extra scan.
  */
object Schemas {

  /** run.json — one per sync run (FIXTURES.md §1). */
  val runJson: StructType = StructType(Seq(
    StructField("computer_name", StringType),
    StructField("files_in_batch", IntegerType),
    StructField("sync_timestamp", StringType),
    StructField("total_size_bytes", LongType),
    StructField("files_by_staff", MapType(StringType, LongType)),
    StructField("file_manifest", ArrayType(StructType(Seq(
      StructField("path", StringType),
      StructField("size", LongType),
      StructField("checksum", StringType),
      StructField("file_date", StringType),
      StructField("is_update", BooleanType),
      StructField("staff_name", StringType)))))))

  /** experiment.json — one per experiment folder (FIXTURES.md §2). */
  val experimentJson: StructType = StructType(Seq(
    StructField("experiment_id", StringType),
    StructField("experiment_folder", StringType),
    StructField("staff_name", StringType),
    StructField("instrument", StringType),
    StructField("computer", StringType),
    StructField("created", StringType),
    StructField("last_updated", StringType),
    StructField("update_count", IntegerType),
    StructField("file_count", IntegerType),
    StructField("total_size_bytes", LongType),
    StructField("s3_location", StringType),
    StructField("auto_detected", BooleanType),
    StructField("sync_version", StringType),
    StructField("parameters", MapType(StringType, StringType)),
    StructField("files", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("relative_path", StringType),
      StructField("size", LongType),
      StructField("checksum", StringType),
      StructField("modified", StringType)))))))

  /** Table names (the three reference DynamoDB tables + quarantine). */
  val SyncRuns = "sync_runs"
  val Experiments = "experiments"
  val FileInventory = "file_inventory"
  val Quarantine = "quarantine"

  /** Primary keys (FIXTURES.md §4). */
  val syncRunsKeys: Seq[String] = Seq("run_id", "instrument_id")
  val experimentsKeys: Seq[String] = Seq("experiment_id", "last_updated")
  val fileInventoryKeys: Seq[String] = Seq("experiment_id", "file_path")
}
