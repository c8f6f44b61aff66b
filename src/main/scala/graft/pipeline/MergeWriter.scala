package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent merge semantics over parquet tables, replicating the
  * reference's conditional-write behavior (SURVEY §2.4 J3/J4):
  *
  *  - J3 insert-if-absent: DynamoDB ConditionExpression
  *    attribute_not_exists(pk) — replays are no-ops.
  *  - J4 last-writer-wins: unconditional batch_writer puts —
  *    run.json-sourced rows overwrite, correcting the
  *    'from_experiment_json' placeholders.
  *
  * Scale notes: the anti-join shuffles only (key) columns of the
  * existing side; at 100 TB the tables would be bucketed by key so
  * the merge join is co-located, and the rewrite would ride a
  * transactional table format. Single-writer-per-table is assumed,
  * exactly like the reference's per-key conditional writes.
  */
object MergeWriter {

  private def readTable(spark: SparkSession, dir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) Some(spark.read.parquet(dir)) else None
  }

  /** J3: append only rows whose key is absent from the existing
    * table; duplicate keys within the incoming batch keep the first
    * by `orderCol`. Returns the number of rows appended.
    */
  def insertIfAbsent(spark: SparkSession, tableDir: String,
      incoming: DataFrame, keys: Seq[String], orderCol: String,
      partitionCols: Seq[String] = Nil): Long = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val dedup = incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val toAppend = readTable(spark, tableDir) match {
      case Some(existing) =>
        dedup.join(existing.select(keys.map(col): _*), keys, "left_anti")
      case None => dedup
    }
    val cached = toAppend.cache()
    try {
      val n = cached.count()
      if (n > 0) {
        val writer = cached.write.mode(SaveMode.Append)
        (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
         else writer).parquet(tableDir)
      }
      n
    } finally cached.unpersist()
  }

  /** J3 + J4 combined, for file_inventory: per key keep the best of
    * {incoming run rows (priority 1) > existing rows (2) > incoming
    * experiment rows (3)} — run.json rows overwrite what exists,
    * experiment.json rows only fill absent keys (ref :238-252 vs
    * :328-341). Rewrites the table (single writer, like the
    * reference).
    */
  def mergeFileInventory(spark: SparkSession, tableDir: String,
      runRows: DataFrame, expRows: DataFrame, keys: Seq[String],
      partitionCols: Seq[String] = Nil): Long = {
    val existing = readTable(spark, tableDir)
    val tagged = runRows.withColumn("__prio", lit(1))
      .unionByName(expRows.withColumn("__prio", lit(3)))
    val all = existing match {
      case Some(e) => tagged.unionByName(e.withColumn("__prio", lit(2)))
      case None => tagged
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__prio"), desc("uploaded_at"), col("s3_key"))
    val merged = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__prio")
      .cache()
    try {
      val n = merged.count()
      // two-phase rewrite: parquet has no transactions; stage then swap
      val tmp = tableDir + "__staging"
      val writer = merged.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
       else writer).parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(tableDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(tableDir))
      n
    } finally merged.unpersist()
  }

  /** Read helper for tests / jobs: empty DataFrame when the table
    * does not exist yet.
    */
  def tableOrEmpty(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    readTable(spark, dir).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaFrom.schema))
}
