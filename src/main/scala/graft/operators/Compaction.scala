package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the operational pair to streaming ingest.
  * Every micro-batch append writes at least one file per task; at
  * 100 TB that is millions of kilobyte files whose per-file open cost
  * dominates scans. Compaction rewrites a table directory into
  * ~targetBytes files (two-phase staging + atomic-rename swap, same
  * single-writer discipline as MergeWriter).
  *
  * Partitioned tables preserve their Hive layout: rows are
  * repartitioned by the partition columns so each partition's rows
  * land in one task -> one file per partition directory.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Long, filesAfter: Long,
      bytes: Long, rows: Long)

  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      partitionCols: Seq[String] = Nil): CompactionStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += ((f.getPath.toString, f.getLen))
      }
      buf.toSeq
    }
    val before = dataFiles
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val tmp = dir + "__compact"
    val writer =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
          .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      else df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    writer.parquet(tmp)
    fs.delete(path, true)
    fs.rename(new Path(tmp), path)
    CompactionStats(before.size.toLong, dataFiles.size.toLong, totalBytes, rows)
  }
}
