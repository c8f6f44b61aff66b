package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weekly reconciliation (SURVEY §3.2; reference:
  * lambda/agf_reconciliation_lambda.py): compare the object-store
  * listing against the union of keys recorded in the three tables,
  * both directions, inside an incremental time window.
  *
  * Plan shape: [Filter(window) <- Scan]^2 -> Join(left_anti) twice ->
  * TakeOrderedAndProject for the samples. Counts come from one
  * aggregate over the tagged union — no collect of full key sets.
  */
object ReconcileJob {

  final case class ReconcileReport(
      s3Count: Long, dbCount: Long,
      orphanedInS3: Long, orphanedInDb: Long,
      sampleS3: Seq[String], sampleDb: Seq[String],
      report: String)

  /** Junk filter (V4): folder markers and .DS_Store. */
  def cleanListing(listing: DataFrame): DataFrame =
    listing.filter(!col("key").endsWith("/") && !col("key").contains(".DS_Store"))

  /** Union-distinct of the recorded keys across the three tables
    * (J2) — different key column per table, exactly like the
    * reference (:128-166).
    */
  def dbKeys(spark: SparkSession, tablesDir: String,
      cutoffEpoch: Option[Long] = None): DataFrame = {
    def tbl(name: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$tablesDir/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(s"$tablesDir/$name")) else None
    }
    def windowed(df: DataFrame, tsCol: String, keyCol: String): DataFrame = {
      val base = cutoffEpoch.map(c => df.filter(col(tsCol) >= c)).getOrElse(df)
      base.select(col(keyCol).as("key"))
    }
    val parts = Seq(
      tbl(Schemas.SyncRuns).map(windowed(_, "processed_at", "s3_key")),
      tbl(Schemas.FileInventory).map(windowed(_, "uploaded_at", "s3_key")),
      tbl(Schemas.Experiments).map(windowed(_, "last_updated", "s3_experiment_json_key")))
      .flatten
    parts.reduceOption(_ union _)
      .map(_.distinct())
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.StringType)))))
  }

  /** Full reconciliation: listing is (key, size, last_modified_epoch).
    * windowDays bounds both sides (T5; default 8 like
    * RECONCILIATION_DAYS).
    */
  def run(spark: SparkSession, listing: DataFrame, tablesDir: String,
      nowEpoch: Long, windowDays: Int = 8, sampleN: Int = 20): ReconcileReport = {
    val cutoff = nowEpoch - windowDays.toLong * 24 * 3600
    val s3Keys = cleanListing(listing)
      .filter(col("last_modified_epoch") >= cutoff)
      .select(col("key")).distinct().cache()
    val db = dbKeys(spark, tablesDir, Some(cutoff)).cache()
    try {
      val orphS3 = s3Keys.join(db, Seq("key"), "left_anti").cache()
      val orphDb = db.join(s3Keys, Seq("key"), "left_anti").cache()
      try {
        val (nS3, nDb) = (s3Keys.count(), db.count())
        val (nOrphS3, nOrphDb) = (orphS3.count(), orphDb.count())
        val sampleS3 = orphS3.orderBy("key").limit(sampleN)
          .collect().map(_.getString(0)).toSeq
        val sampleDb = orphDb.orderBy("key").limit(sampleN)
          .collect().map(_.getString(0)).toSeq
        ReconcileReport(nS3, nDb, nOrphS3, nOrphDb, sampleS3, sampleDb,
          renderReport(nS3, nDb, nOrphS3, nOrphDb, sampleS3, sampleDb, sampleN))
      } finally { orphS3.unpersist(); orphDb.unpersist() }
    } finally { s3Keys.unpersist(); db.unpersist() }
  }

  /** Fixed-layout text report (K5; ref :203-272), with the top-N
    * samples and "and N more" overflow notes.
    */
  def renderReport(nS3: Long, nDb: Long, nOrphS3: Long, nOrphDb: Long,
      sampleS3: Seq[String], sampleDb: Seq[String], sampleN: Int): String = {
    val sb = new StringBuilder
    sb.append("=== Reconciliation Report ===\n")
    sb.append(s"S3 objects (window): $nS3\n")
    sb.append(s"Recorded keys (window): $nDb\n")
    sb.append(s"Orphaned in S3 (not in DB): $nOrphS3\n")
    sb.append(s"Orphaned in DB (not in S3): $nOrphDb\n")
    def section(title: String, n: Long, sample: Seq[String]): Unit =
      if (n > 0) {
        sb.append(s"\n$title:\n")
        sample.foreach(k => sb.append(s"  - $k\n"))
        if (n > sampleN) sb.append(s"  ... and ${n - sampleN} more\n")
      }
    section("Sample orphaned in S3", nOrphS3, sampleS3)
    section("Sample orphaned in DB", nOrphDb, sampleDb)
    if (nOrphS3 == 0 && nOrphDb == 0) sb.append("\nAll in sync.\n")
    else sb.append("\nRecommended action: backfill missing keys / prune stale rows.\n")
    sb.toString
  }
}
