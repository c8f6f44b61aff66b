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

  test("taggedRead: the filter alone prunes files from the catalog, no bounds restated") {
    val path = writeLayout(1000, 8)
    val stats = FileSkipping.fileStats(spark, path, "k")
    val auto = FileSkipping.taggedRead(spark, path, "k" -> stats)
      .filter(col("k").between(100L, 200L))
    val opened = auto.inputFiles.length
    assert(opened < 8 && opened > 0, s"expected file pruning, opened $opened/8")
    val full = spark.read.parquet(path)
      .filter(col("k").between(100L, 200L)).orderBy(col("k"))
      .as[(Long, Long)].collect().toSeq
    assert(auto.orderBy(col("k")).as[(Long, Long)].collect().toSeq === full)
    // a second column's catalog composes: v = 2k, so a v-filter
    // prunes on its own catalog
    val vstats = FileSkipping.fileStats(spark, path, "v")
    val both = FileSkipping.taggedRead(spark, path,
      "k" -> stats, "v" -> vstats)
    val vAuto = both.filter(col("v") >= 1800L)
    assert(vAuto.inputFiles.length < 8, "v-catalog should prune too")
    assert(vAuto.count() === 100L)
  }

  test("bloom catalog prunes point lookups on a hash layout where zone maps cannot") {
    val path = tmpDir("fskip_bloom")
    val df = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    df.repartition(8, col("k")).write.mode("overwrite").parquet(path)
    val zstats = FileSkipping.fileStats(spark, path, "k").cache()
    // hash layout: every file's range overlaps any point -> zone maps read all 8
    assert(FileSkipping.overlappingFiles(zstats, lit(123L), lit(123L)).size === 8)
    val bstats = FileSkipping.bloomFileStats(spark, path, "k").cache()
    assert(bstats.count() === 8)
    val cand = FileSkipping.bloomCandidateFiles(bstats, Seq(123L))
    // no false negatives: the file really holding k=123 must be a candidate
    val truth = spark.read.parquet(path).filter(col("k") === 123L)
      .select(input_file_name()).as[String].head()
    assert(cand.contains(truth))
    // and at 125 keys/file vs 2^16 bits the FP odds are ~1e-5 per
    // file: pruning must actually bite
    assert(cand.size < 8, s"expected pruning, got ${cand.size}/8 candidates")
    val got = FileSkipping.bloomPointRead(spark, path, bstats, "k", Seq(123L, 777L))
      .orderBy(col("k")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((123L, 246L), (777L, 1554L)))
  }

  test("bloom probe for absent keys returns no rows even on false-positive files") {
    val path = tmpDir("fskip_bloom_miss")
    spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
      .repartition(4, col("k")).write.mode("overwrite").parquet(path)
    val bstats = FileSkipping.bloomFileStats(spark, path, "k")
    // keys far outside the domain: candidate files may exist (FP) but
    // the exact filter keeps the result empty
    val got = FileSkipping.bloomPointRead(spark, path, bstats, "k",
      Seq(100000L, 200000L))
    assert(got.count() === 0)
    assert(got.columns.toSeq === Seq("k", "v"))
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
