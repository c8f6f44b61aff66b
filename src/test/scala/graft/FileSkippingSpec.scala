package graft

import org.apache.spark.sql.functions._
import graft.operators.{FileSkipping, Layout}

class FileSkippingSpec extends SparkTestBase {
  import spark.implicits._

  private def writeLayout(n: Int, files: Int): String = {
    val path = tmpDir("fskip")
    val df = spark.range(0, n).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    Layout.rangeSortedWrite(df, "k", files, path)
    path
  }

  test("zone map has one row per file and covers the full domain") {
    val path = writeLayout(1000, 8)
    val stats = FileSkipping.fileStats(spark, path, "k").cache()
    assert(stats.count() === 8)
    val (lo, hi) = stats.agg(min(col("min_v")), max(col("max_v")))
      .as[(Long, Long)].head()
    assert(lo === 0L && hi === 999L)
  }

  test("a narrow range opens a strict subset of files, result unchanged") {
    val path = writeLayout(1000, 8)
    val stats = FileSkipping.fileStats(spark, path, "k").cache()
    val files = FileSkipping.overlappingFiles(stats, lit(100L), lit(200L))
    assert(files.nonEmpty && files.size < 8,
      s"expected pruning, scanned ${files.size}/8 files")
    val pruned = FileSkipping.prunedRead(spark, path, stats, lit(100L), lit(200L))
      .filter(col("k").between(100L, 200L)).orderBy(col("k"))
      .as[(Long, Long)].collect().toSeq
    val full = spark.read.parquet(path)
      .filter(col("k").between(100L, 200L)).orderBy(col("k"))
      .as[(Long, Long)].collect().toSeq
    assert(pruned === full)
    assert(pruned.size === 101)
  }

  test("an out-of-domain range opens zero files and returns an empty frame") {
    val path = writeLayout(100, 4)
    val stats = FileSkipping.fileStats(spark, path, "k")
    assert(FileSkipping.overlappingFiles(stats, lit(5000L), lit(6000L)).isEmpty)
    val empty = FileSkipping.prunedRead(spark, path, stats, lit(5000L), lit(6000L))
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("k", "v")) // schema preserved
  }
}
