package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the operational pair to streaming ingest.
  * Every micro-batch append writes at least one file per task; at
  * 100 TB that is millions of kilobyte files whose per-file open cost
  * dominates scans. Compaction rewrites a table directory into
  * ~targetBytes files (two-phase staging + atomic-rename swap, same
  * single-writer discipline as MergeWriter).
  *
  * Partitioned tables preserve their Hive layout AND honor
  * targetBytes inside each partition: the file listing already gives
  * per-partition byte totals, so each partition gets
  * ceil(partitionBytes / targetBytes) hash-salt buckets and the
  * repartition key is (partitionCols..., bucket). A 1 TB partition
  * becomes ~targetBytes-sized files, not one 1 TB straggler file.
  *
  * Row count comes from an `observe` on the rewrite scan itself —
  * no separate count() pass over the table.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Long, filesAfter: Long,
      bytes: Long, rows: Long)

  /** Undo Hive's partition-value escaping (%xx, same alphabet as URL
    * escaping but space stays literal).
    */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      partitionCols: Seq[String] = Nil): CompactionStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = path.toUri.getPath
    def dataFiles = {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += ((f.getPath.toUri.getPath, f.getLen))
      }
      buf.toSeq
    }
    val before = dataFiles
    val totalBytes = before.map(_._2).sum
    val df = spark.read.parquet(dir)
    val obs = Observation()
    val observed = df.observe(obs, count(lit(1)).as("rows"))
    val tmp = dir + "__compact"
    if (partitionCols.nonEmpty) {
      // per-partition byte totals straight from the listing: the
      // partition subpath is the file's parent relative to the root
      val partBytes = before.groupBy { case (p, _) =>
        p.stripPrefix(rootUri).stripPrefix("/").split('/').dropRight(1).toSeq
      }.map { case (segs, fsz) =>
        val values = segs.map(s => unescapePathName(s.substring(s.indexOf('=') + 1)))
        values -> fsz.map(_._2).sum
      }
      val bucketRows = partBytes.toSeq.map { case (values, bytes) =>
        org.apache.spark.sql.Row.fromSeq(
          values :+ math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
      }
      val bucketSchema = org.apache.spark.sql.types.StructType(
        partitionCols.map(c => org.apache.spark.sql.types.StructField(
          s"__p_$c", org.apache.spark.sql.types.StringType)) :+
          org.apache.spark.sql.types.StructField("__n_buckets",
            org.apache.spark.sql.types.IntegerType))
      val buckets = spark.createDataFrame(
        spark.sparkContext.parallelize(bucketRows, 1), bucketSchema)
      val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
      val joinCond = partitionCols.map(c =>
        df(c).cast("string") <=> col(s"__p_$c")).reduce(_ && _)
      // explicit partition count: an AQE-coalesced shuffle would merge
      // the buckets back into few tasks and re-create the giant files
      val totalBuckets = partBytes.values
        .map(b => math.max(1L, (b + targetBytes - 1) / targetBytes)).sum.toInt
      val nShuffle = math.max(totalBuckets, spark.sessionState.conf.numShufflePartitions)
      observed.join(broadcast(buckets), joinCond)
        // salt on a hash of the data columns: deterministic, uniform,
        // and independent of the input file layout
        .withColumn("__bucket",
          pmod(hash(dataCols: _*), coalesce(col("__n_buckets"), lit(1))))
        .drop(buckets.columns: _*)
        .repartition(nShuffle, partitionCols.map(col) :+ col("__bucket"): _*)
        .drop("__bucket")
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
        .parquet(tmp)
    } else {
      val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      observed.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    val rows = obs.get("rows").asInstanceOf[Long]
    fs.delete(path, true)
    fs.rename(new Path(tmp), path)
    CompactionStats(before.size.toLong, dataFiles.size.toLong, totalBytes, rows)
  }
}
