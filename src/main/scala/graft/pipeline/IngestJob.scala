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

  /** Path-URI -> key: strip up to the FIRST occurrence of the root
    * (a greedy .* would truncate keys whose tree repeats the root
    * path string), then decode %XX while preserving literal '+' (a
    * URI plus is a plus — unquote_plus semantics apply to S3 event
    * keys, not file URIs). Shared by ingest and the reconcile CLI so
    * both sides derive identical keys.
    */
  def keyFromUri(uri: org.apache.spark.sql.Column, root: String): org.apache.spark.sql.Column = {
    val norm = root.stripSuffix("/")
    url_decode(regexp_replace(
      regexp_replace(uri, s"^file:.*?${java.util.regex.Pattern.quote(norm)}/", ""),
      "\\+", "%2B"))
  }

  /** The local-path analog of the S3 key: path below the ingest root. */
  private def withKey(df: DataFrame, root: String, bucket: String): DataFrame =
    df.withColumn("s3_key", keyFromUri(input_file_name(), root))
      .withColumn("s3_bucket", lit(bucket))

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

  /** Streaming ingest: two sequential checkpointed AvailableNow
    * streams (one per document kind — their schemas differ), each
    * draining only its own new files through the shared merge. Run
    * sequentially, never concurrently: both merge into
    * file_inventory and the writer is single-writer by design.
    * Replays and late files of EITHER kind are picked up by the next
    * invocation (SURVEY §2.9 T4); the idempotent merges make
    * redelivery a no-op.
    */
  def runStreaming(spark: SparkSession, root: String, tablesDir: String,
      checkpointDir: String, bucket: String = "local",
      fixedNow: Option[Long] = None,
      strictTimestamps: Boolean = false): Unit = {
    def emptyOf(schema: org.apache.spark.sql.types.StructType): DataFrame =
      withKeyColumns(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), bucket)

    val runStream = withKey(spark.readStream.schema(Schemas.runJson)
      .option("multiLine", "true")
      .option("pathGlobFilter", "*run.json")
      .option("recursiveFileLookup", "true").json(root), root, bucket)
    val runQuery = runStream.writeStream
      .option("checkpointLocation", s"$checkpointDir/runs")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, tablesDir, batch, emptyOf(Schemas.experimentJson),
          fixedNow, strictTimestamps)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    runQuery.awaitTermination()

    val expStream = withKey(spark.readStream.schema(Schemas.experimentJson)
      .option("multiLine", "true")
      .option("pathGlobFilter", "*experiment.json")
      .option("recursiveFileLookup", "true").json(root), root, bucket)
    val expQuery = expStream.writeStream
      .option("checkpointLocation", s"$checkpointDir/experiments")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, tablesDir, emptyOf(Schemas.runJson), batch,
          fixedNow, strictTimestamps)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    expQuery.awaitTermination()
  }

  private def withKeyColumns(df: DataFrame, bucket: String): DataFrame =
    df.withColumn("s3_key", lit(null).cast("string"))
      .withColumn("s3_bucket", lit(bucket))
      .limit(0)
}
