package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColumnOps

/** Pure DataFrame => DataFrame transforms for the ingestion pipeline
  * (SURVEY §3.1). Shared verbatim by the batch and streaming entry
  * points — this collapses the reference's Lambda/backfill duality
  * into one code path (reference: lambda/agf_ingestion_lambda.py).
  *
  * Input contract for both document kinds: the parsed JSON columns
  * plus `s3_bucket` and `s3_key` (locally, the path below the ingest
  * root). All derivations are built-in column expressions (ColumnOps)
  * — no UDFs anywhere on the hot path.
  */
object IngestPipeline {

  /** Current-time epoch, injectable for deterministic tests. */
  def nowEpoch(fixedNow: Option[Long]): Column =
    fixedNow.map(lit(_)).getOrElse(unix_timestamp(current_timestamp()))

  /** Lenient timestamp: parseable -> epoch; empty/garbage -> now
    * (ref parse_timestamp :42-68).
    */
  private def lenientTs(c: Column, fixedNow: Option[Long]): Column =
    coalesce(
      unix_timestamp(try_to_timestamp(regexp_replace(c, "Z$", "+00:00"))),
      nowEpoch(fixedNow))

  /** V1 gate: split into (valid, quarantined-with-reason). One pass,
    * two filtered branches — Catalyst shares the scan.
    */
  def validatePaths(df: DataFrame): (DataFrame, DataFrame) = {
    val ok = ColumnOps.isValidS3Path(col("s3_key"))
    (df.filter(ok),
      df.filter(!ok).withColumn("quarantine_reason", lit("invalid_s3_path")))
  }

  /** P1 strict mode (STRICT_TIMESTAMP_PARSING, ref :30,55-66): when
    * on, records whose timestamp columns are present but unparseable
    * are quarantined instead of defaulting to now(). Empty/missing
    * stays lenient-defaulted in both modes only if strict is off;
    * strict also rejects empty — matching the reference, which raises
    * on empty under strict.
    */
  def strictTimestampGate(df: DataFrame, tsCols: Seq[String],
      strict: Boolean): (DataFrame, DataFrame) =
    if (!strict) (df, df.limit(0).withColumn("quarantine_reason", lit("")))
    else {
      val bad = tsCols.map(c =>
        !ColumnOps.isParseableTimestamp(col(c)) || col(c).isNull ||
          length(col(c)) === 0).reduce(_ || _)
      (df.filter(!bad),
        df.filter(bad).withColumn("quarantine_reason", lit("unparseable_timestamp")))
    }

  /** sync_runs rows from parsed run.json documents
    * (ref :210-224; output schema FIXTURES.md §4).
    */
  def runRecords(runJsons: DataFrame, fixedNow: Option[Long] = None): DataFrame =
    runJsons.select(
      ColumnOps.runId(col("s3_key")).as("run_id"),
      ColumnOps.instrumentId(col("s3_key")).as("instrument_id"),
      lit("ALL").as("gsi_pk"),
      col("computer_name"),
      lenientTs(col("sync_timestamp"), fixedNow).as("sync_timestamp"),
      ColumnOps.fileDateString(col("s3_key")).as("date"),
      col("files_in_batch").as("files_count"),
      ColumnOps.totalBytes(col("total_size_bytes"), col("file_manifest")).as("total_bytes"),
      ColumnOps.staffNames(coalesce(col("files_by_staff"),
        map().cast("map<string,bigint>"))).as("staff_names"),
      col("s3_key"),
      col("s3_bucket"),
      lit("completed").as("processing_status"),
      nowEpoch(fixedNow).as("processed_at"))

  /** file_inventory rows from run.json manifests: explode (the
    * reference's only table-generating op) + the full derivation
    * chain (ref build_file_record :348-417). Rows with invalid
    * checksums carry quarantine_reason; route them with
    * splitQuarantine before writing.
    */
  def runFileRecords(runJsons: DataFrame, fixedNow: Option[Long] = None,
      strictTimestamps: Boolean = false): DataFrame = {
    val exploded = runJsons
      .filter(size(coalesce(col("file_manifest"),
        array().cast("array<struct<path:string,size:bigint,checksum:string,file_date:string,is_update:boolean,staff_name:string>>"))) > 0)
      .select(col("s3_bucket"), col("s3_key").as("run_key"),
        ColumnOps.runId(col("s3_key")).as("run_id"),
        ColumnOps.instrumentId(col("s3_key")).as("instrument_id"),
        explode(col("file_manifest")).as("f"))
    val runBase = expr(
      "array_join(slice(split(run_key, '/'), 1, size(split(run_key, '/')) - 1), '/')")
    val staff = ColumnOps.staffName(col("f.staff_name"), col("f.path"))
    exploded.select(
      ColumnOps.experimentId(col("f.path"), staff, col("run_id")).as("experiment_id"),
      col("f.path").as("file_path"),
      ColumnOps.basename(col("f.path")).as("file_name"),
      ColumnOps.reconstructedKey(runBase, col("f.path")).as("s3_key"),
      col("s3_bucket"),
      col("f.size").as("file_size_bytes"),
      ColumnOps.fileExtension(col("f.path")).as("file_type"),
      ColumnOps.normalizedChecksum(col("f.checksum")).as("checksum_sha256"),
      nowEpoch(fixedNow).as("uploaded_at"),
      lenientTs(col("f.file_date"), fixedNow).as("modified_at"),
      col("run_id"),
      staff.as("staff_name"),
      col("instrument_id"),
      coalesce(col("f.is_update"), lit(false)).as("is_update"),
      // null checksum must quarantine (coalesce: isValidChecksum(null)
      // is NULL, and when(NULL) would route the row as clean); strict
      // mode also rejects null/empty timestamps like the reference
      when(!coalesce(ColumnOps.isValidChecksum(col("f.checksum")), lit(false)),
        lit("invalid_checksum"))
        .when(lit(strictTimestamps) &&
          !ColumnOps.isParseableTimestamp(col("f.file_date")),
          lit("unparseable_timestamp"))
        .as("quarantine_reason"))
  }

  /** experiments rows (append-only versions) from parsed
    * experiment.json (ref :278-298).
    */
  def experimentRecords(expJsons: DataFrame, fixedNow: Option[Long] = None): DataFrame =
    expJsons.select(
      col("experiment_id"),
      lenientTs(col("last_updated"), fixedNow).as("last_updated"),
      col("experiment_folder"),
      col("staff_name"),
      col("instrument").as("instrument_id"),
      col("computer").as("computer_name"),
      lenientTs(col("created"), fixedNow).as("created_at"),
      coalesce(col("update_count"), lit(1)).as("update_count"),
      col("file_count"),
      col("total_size_bytes").as("total_bytes"),
      col("s3_location"),
      col("s3_key").as("s3_experiment_json_key"),
      col("s3_bucket"),
      coalesce(col("auto_detected"), lit(true)).as("auto_detected"),
      coalesce(col("sync_version"), lit("1.0")).as("sync_version"),
      col("parameters"))

  /** file_inventory rows from experiment.json file lists
    * (ref build_experiment_file_record :420-454). Schema-aligned with
    * runFileRecords: run_id is the 'from_experiment_json' sentinel,
    * is_update is null (run source only).
    */
  def experimentFileRecords(expJsons: DataFrame, fixedNow: Option[Long] = None,
      strictTimestamps: Boolean = false): DataFrame = {
    val exploded = expJsons
      .filter(size(coalesce(col("files"),
        array().cast("array<struct<name:string,relative_path:string,size:bigint,checksum:string,modified:string>>"))) > 0)
      .select(col("s3_bucket"), col("s3_key").as("exp_key"),
        col("experiment_id"), col("staff_name"),
        col("instrument").as("instrument_id"),
        explode(col("files")).as("f"))
    exploded.select(
      col("experiment_id"),
      col("f.relative_path").as("file_path"),
      col("f.name").as("file_name"),
      ColumnOps.experimentFileKey(col("exp_key"), col("f.relative_path")).as("s3_key"),
      col("s3_bucket"),
      col("f.size").as("file_size_bytes"),
      ColumnOps.fileExtension(col("f.name")).as("file_type"),
      ColumnOps.normalizedChecksum(col("f.checksum")).as("checksum_sha256"),
      nowEpoch(fixedNow).as("uploaded_at"),
      lenientTs(col("f.modified"), fixedNow).as("modified_at"),
      lit("from_experiment_json").as("run_id"),
      col("staff_name"),
      col("instrument_id"),
      lit(null).cast("boolean").as("is_update"),
      when(!coalesce(ColumnOps.isValidChecksum(col("f.checksum")), lit(false)),
        lit("invalid_checksum"))
        .when(lit(strictTimestamps) &&
          !ColumnOps.isParseableTimestamp(col("f.modified")),
          lit("unparseable_timestamp"))
        .as("quarantine_reason"))
  }

  /** Split rows carrying a quarantine_reason from clean rows (the
    * DLQ analog, SURVEY §2.8 K7).
    */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("quarantine_reason").isNull).drop("quarantine_reason"),
      df.filter(col("quarantine_reason").isNotNull))
}
