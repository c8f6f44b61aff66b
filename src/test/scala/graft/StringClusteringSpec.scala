package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** String-typed clustering: `compactByRange` / `compactByZOrderN` on
  * STRING columns via globalRank-derived boundary values — content
  * identity, the strict inputFiles subset a string-range filter opens
  * (the q282 measured-asymmetry discipline), null routing, and the
  * value-balanced skew honesty.
  */
class StringClusteringSpec extends SparkTestBase {
  import spark.implicits._

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.toSeq
    }.flatten

  test("compactByRange on a string column: content identical, prefix filter opens a strict bucket subset") {
    val path = tmpDir("strc_range")
    val rows = (0 until 400).map(i => (f"key_$i%04d", i.toLong))
    VersionedTable.append(rows.filter(_._2 % 2 == 0).toDF("name", "v"), path)
    VersionedTable.append(rows.filter(_._2 % 2 == 1).toDF("name", "v"), path)
    val before = VersionedTable.readLatest(spark, path)
      .as[(String, Long)].collect().sortBy(_._1)
    VersionedTable.compactByRange(spark, path, "name", nBuckets = 4)
    val after = VersionedTable.readAt(spark, path, 3L)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(after === before, "clustering never changes content")
    // the measured asymmetry: a string-range filter on the clustered
    // layout opens a strict subset of the bucket files
    val all = scanFiles(VersionedTable.readAtAuto(spark, path, 3L))
    val filtered = scanFiles(VersionedTable.readAtAuto(spark, path, 3L)
      .filter(col("name") >= "key_0100" && col("name") < "key_0200"))
    assert(all.size >= 4, s"expected >=4 bucket files, got ${all.size}")
    assert(filtered.nonEmpty && filtered.size < all.size,
      s"string stats must prune buckets: ${filtered.size} of ${all.size}")
    assert(VersionedTable.readAtAuto(spark, path, 3L)
      .filter(col("name") >= "key_0100" && col("name") < "key_0200")
      .count() === 100L, "pruning never changes the answer")
  }

  test("string clustering routes NULLs to bucket 0 and keeps them") {
    val path = tmpDir("strc_null")
    val df = Seq(("a", 1L), (null, 2L), ("m", 3L), (null, 4L), ("z", 5L))
      .toDF("name", "v")
    VersionedTable.append(df, path)
    VersionedTable.compactByRange(spark, path, "name", nBuckets = 2)
    val after = VersionedTable.readAt(spark, path, 2L)
      .as[(Option[String], Long)].collect().sortBy(_._2)
    assert(after.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(after.count(_._1.isEmpty) === 2, "null rows survive clustering")
  }

  test("value-balanced honesty: a heavily skewed value keeps its bucket whole") {
    val path = tmpDir("strc_skew")
    // one value carries 80% of rows: buckets are VALUE-balanced, so
    // the hot value cannot split — content must still be exact
    val rows = (0 until 400).map(i =>
      (if (i < 320) "hot" else f"cold_$i%03d", i.toLong))
    VersionedTable.append(rows.toDF("name", "v"), path)
    VersionedTable.compactByRange(spark, path, "name", nBuckets = 4)
    assert(VersionedTable.readAt(spark, path, 2L).count() === 400L)
    assert(VersionedTable.readAt(spark, path, 2L)
      .filter(col("name") === "hot").count() === 320L)
  }

  test("z-order with a string dimension: content identical, typed stats for every dim") {
    val path = tmpDir("strc_zorder")
    val rows = (0 until 256).map(i => (f"n_$i%03d", (i % 16).toLong, i.toLong))
    VersionedTable.append(rows.toDF("name", "x", "v"), path)
    val before = VersionedTable.readLatest(spark, path)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    VersionedTable.compactByZOrderN(spark, path, Seq("name", "x"),
      nBuckets = 4, bits = 2)
    assert(VersionedTable.readAt(spark, path, 2L)
      .as[(String, Long, Long)].collect().sortBy(_._3) === before)
    assert(VersionedTable.statsColumnsOf(path, 2L).toSet === Set("name", "x"),
      "every z dimension records stats, string included")
    // single-dim slices each prune
    val all = scanFiles(VersionedTable.readAtAuto(spark, path, 2L))
    val byName = scanFiles(VersionedTable.readAtAuto(spark, path, 2L)
      .filter(col("name") < "n_064"))
    assert(byName.size < all.size,
      s"string dim must prune the z layout: ${byName.size} of ${all.size}")
  }
}
