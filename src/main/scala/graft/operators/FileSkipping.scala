package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit file-level zone maps — the manifest-style data skipping
  * layer (Delta add-file stats, Iceberg manifest min/max) on plain
  * parquet directories. q66/Layout already gets ROW-GROUP skipping
  * from parquet footers, but every footer must still be opened; a
  * zone-map catalog moves the min/max one level up, so a range query
  * against a 100k-file table opens only the files whose range
  * overlaps — the other 99k are never listed into the scan at all.
  *
  * The catalog is one row per file (path, min, max, count): the same
  * order of magnitude as the filesystem listing every query already
  * pays for, so collecting the matching paths onto the driver is the
  * bounded catalog lookup every table format does, not a data
  * collect.
  */
object FileSkipping {

  /** Build the zone map for one column of a parquet directory: one
    * row per file. One full scan — amortized over every later pruned
    * read, exactly like any index build (q42/q81 pattern). The scan
    * reads only `column` (plus file names from split metadata), so
    * the build cost is one column's bytes, not the table's.
    */
  def fileStats(spark: SparkSession, path: String, column: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("min_v"), max(col(column)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** The catalog lookup: paths of files whose [min_v, max_v] range
    * overlaps [lo, hi]. Driver-side by design (bounded by file count).
    */
  def overlappingFiles(stats: DataFrame, lo: Column, hi: Column): Seq[String] =
    stats.filter(col("min_v") <= hi && col("max_v") >= lo)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Read only the overlapping files. Callers still apply the exact
    * row predicate — zone maps are conservative (a file overlapping
    * the range can hold out-of-range rows); pruning is a physical
    * optimization, never a semantic filter. An empty overlap returns
    * an empty frame with the table's schema.
    */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
      lo: Column, hi: Column): DataFrame = {
    val files = overlappingFiles(stats, lo, hi)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*)
  }
}
