package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Ingest entry points. One transformation code path (IngestPipeline)
  * behind two sources:
  *
  *  - batch: spark.read.json over the directory tree — this IS the
  *    reference's backfill CLI (SURVEY §3.3 disappears into it);
  *  - streaming: readStream file source with pathGlobFilter +
  *    checkpoint; Trigger.AvailableNow gives replay parity. The
  *    merge sink is idempotent (J3/J4), so at-least-once delivery
  *    composes to effectively-once (SURVEY §2.9 T2).
  */
object IngestJob {

  final case class IngestCounts(runs: Long, experiments: Long,
      files: Long, quarantined: Long)

  /** The local-path analog of the S3 key: path below the ingest root. */
  private def withKey(df: DataFrame, root: String, bucket: String): DataFrame = {
    val norm = root.stripSuffix("/")
    // non-greedy prefix match: strip up to the FIRST occurrence of the
    // root (a greedy .* would truncate keys whose tree repeats the
    // root path string)
    df.withColumn("s3_key",
      regexp_replace(input_file_name(), s"^file:.*?${java.util.regex.Pattern.quote(norm)}/", ""))
      // input_file_name is percent-encoded URI form; decode %XX but
      // preserve literal '+' (a URI plus is a plus — unquote_plus
      // semantics apply to S3 event keys, not file URIs)
      .withColumn("s3_key", url_decode(regexp_replace(col("s3_key"), "\\+", "%2B")))
      .withColumn("s3_bucket", lit(bucket))
  }

  /** Read + transform one document kind from a tree (batch). */
  def readRunJsons(spark: SparkSession, root: String, bucket: String): DataFrame =
    withKey(spark.read.schema(Schemas.runJson)
      .option("multiLine", "true")
      .option("pathGlobFilter", "*run.json")
      .option("recursiveFileLookup", "true").json(root), root, bucket)

  def readExperimentJsons(spark: SparkSession, root: String, bucket: String): DataFrame =
    withKey(spark.read.schema(Schemas.experimentJson)
      .option("multiLine", "true")
      .option("pathGlobFilter", "*experiment.json")
      .option("recursiveFileLookup", "true").json(root), root, bucket)

  /** Apply the shared transforms + merges for one micro-batch (or the
    * whole tree in batch mode). Writes the three tables + quarantine
    * under tablesDir.
    */
  def processBatch(spark: SparkSession, tablesDir: String,
      runJsons: DataFrame, expJsons: DataFrame,
      fixedNow: Option[Long] = None,
      strictTimestamps: Boolean = false): IngestCounts = {
    val (okRunPaths, badRunPaths) = IngestPipeline.validatePaths(runJsons)
    val (okExpPaths, badExpPaths) = IngestPipeline.validatePaths(expJsons)
    // STRICT_TIMESTAMP_PARSING parity (ref :30,55-66): strict mode
    // quarantines records with unparseable/empty timestamps instead
    // of defaulting them to now()
    val (validRuns, badRunTs) = IngestPipeline.strictTimestampGate(
      okRunPaths, Seq("sync_timestamp"), strictTimestamps)
    val (validExps, badExpTs) = IngestPipeline.strictTimestampGate(
      okExpPaths, Seq("created", "last_updated"), strictTimestamps)

    // Hive-layout partitioning (SURVEY §7.1): instrument/date for the
    // runs table, instrument for the inventory — time/instrument
    // predicates (the reconciliation window) become partition pruning
    val runs = IngestPipeline.runRecords(validRuns, fixedNow)
    val nRuns = MergeWriter.insertIfAbsent(spark, s"$tablesDir/${Schemas.SyncRuns}",
      runs, Schemas.syncRunsKeys, "s3_key", Seq("instrument_id", "date"))

    val exps = IngestPipeline.experimentRecords(validExps, fixedNow)
    val nExps = MergeWriter.insertIfAbsent(spark, s"$tablesDir/${Schemas.Experiments}",
      exps, Schemas.experimentsKeys, "s3_experiment_json_key")

    val (runFiles, badRunFiles) = IngestPipeline.splitQuarantine(
      IngestPipeline.runFileRecords(validRuns, fixedNow, strictTimestamps))
    val (expFiles, badExpFiles) = IngestPipeline.splitQuarantine(
      IngestPipeline.experimentFileRecords(validExps, fixedNow, strictTimestamps))
    val nFiles = MergeWriter.mergeFileInventory(spark,
      s"$tablesDir/${Schemas.FileInventory}", runFiles, expFiles,
      Schemas.fileInventoryKeys, Seq("instrument_id"))

    val quarantine = badRunPaths.select(col("s3_key"), col("quarantine_reason"))
      .unionByName(badExpPaths.select(col("s3_key"), col("quarantine_reason")))
      .unionByName(badRunTs.select(col("s3_key"), col("quarantine_reason")))
      .unionByName(badExpTs.select(col("s3_key"), col("quarantine_reason")))
      .unionByName(badRunFiles.select(col("s3_key"), col("quarantine_reason")))
      .unionByName(badExpFiles.select(col("s3_key"), col("quarantine_reason")))
    // insert-if-absent so streaming re-reads don't append duplicate
    // quarantine rows every micro-batch
    val nQuarantine = MergeWriter.insertIfAbsent(spark,
      s"$tablesDir/${Schemas.Quarantine}", quarantine,
      Seq("s3_key", "quarantine_reason"), "s3_key")

    IngestCounts(nRuns, nExps, nFiles, nQuarantine)
  }

  /** Batch/backfill over a full tree (the reference's backfill CLI +
    * manual-invoke path in one).
    */
  def runBatch(spark: SparkSession, root: String, tablesDir: String,
      bucket: String = "local", fixedNow: Option[Long] = None): IngestCounts =
    processBatch(spark, tablesDir,
      readRunJsons(spark, root, bucket),
      readExperimentJsons(spark, root, bucket), fixedNow)

  /** Streaming ingest: file source + checkpointed foreachBatch merge.
    * AvailableNow drains everything present then stops — identical
    * replay semantics to the backfill (SURVEY §2.9 T4).
    */
  def runStreaming(spark: SparkSession, root: String, tablesDir: String,
      checkpointDir: String, bucket: String = "local",
      fixedNow: Option[Long] = None,
      strictTimestamps: Boolean = false): Unit = {
    val runStream = withKey(spark.readStream.schema(Schemas.runJson)
      .option("multiLine", "true")
      .option("pathGlobFilter", "*run.json")
      .option("recursiveFileLookup", "true").json(root), root, bucket)
    val expSchema = Schemas.experimentJson
    val query = runStream.writeStream
      .option("checkpointLocation", s"$checkpointDir/runs")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // experiment docs are re-read per trigger batch-side; the run
        // stream drives progress. (Two independent streams would race
        // on the shared file_inventory merge — single-writer rule.)
        val expBatch = withKey(spark.read.schema(expSchema)
          .option("multiLine", "true")
          .option("pathGlobFilter", "*experiment.json")
          .option("recursiveFileLookup", "true").json(root), root, bucket)
        processBatch(spark, tablesDir, batch, expBatch, fixedNow, strictTimestamps)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }
}
