package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

class ReconcileZipSpec extends SparkTestBase {
  import spark.implicits._

  private val FIXED_NOW = 1768500000L

  test("reconcile finds orphans in both directions inside the window") {
    // table side: one run with s3_key K1
    val tables = tmpDir("tables")
    Seq(("run1", "instr1", "K1", FIXED_NOW))
      .toDF("run_id", "instrument_id", "s3_key", "processed_at")
      .write.parquet(s"$tables/sync_runs")
    // listing side: K2 present, K1 missing; junk + stale filtered
    val listing = Seq(
      ("K2", 10L, FIXED_NOW - 100),
      ("dir/", 0L, FIXED_NOW - 100),            // junk: folder marker
      ("a/.DS_Store", 1L, FIXED_NOW - 100),     // junk
      ("OLD", 5L, FIXED_NOW - 100L * 24 * 3600) // outside 8-day window
    ).toDF("key", "size", "last_modified_epoch")
    val rep = ReconcileJob.run(spark, listing, tables, FIXED_NOW)
    assert(rep.s3Count === 1)
    assert(rep.dbCount === 1)
    assert(rep.orphanedInS3 === 1 && rep.sampleS3 === Seq("K2"))
    assert(rep.orphanedInDb === 1 && rep.sampleDb === Seq("K1"))
    assert(rep.report.contains("Orphaned in S3 (not in DB): 1"))
  }

  test("reconcile in-sync report") {
    val tables = tmpDir("tables")
    Seq(("run1", "i", "K1", FIXED_NOW))
      .toDF("run_id", "instrument_id", "s3_key", "processed_at")
      .write.parquet(s"$tables/sync_runs")
    val listing = Seq(("K1", 10L, FIXED_NOW - 1)).toDF("key", "size", "last_modified_epoch")
    val rep = ReconcileJob.run(spark, listing, tables, FIXED_NOW)
    assert(rep.orphanedInS3 === 0 && rep.orphanedInDb === 0)
    assert(rep.report.contains("All in sync."))
  }

  test("zip validation enforces per-file and total caps") {
    val ok = ZipPlanner.validate(Seq(("a", 100L), ("b", 200L)).toDF("key", "size"))
    assert(ok.ok && ok.totalBytes === 300)
    val bigFile = ZipPlanner.validate(
      Seq(("a", ZipPlanner.MaxFileBytes + 1)).toDF("key", "size"))
    assert(!bigFile.ok && bigFile.reason.get.contains("single file"))
    val bigTotal = ZipPlanner.validate(
      Seq.tabulate(6)(i => (s"f$i", ZipPlanner.MaxFileBytes)).toDF("key", "size"))
    assert(!bigTotal.ok && bigTotal.reason.get.contains("total"))
  }

  test("zip entry names disambiguate duplicate basenames in key order") {
    val df = Seq("x/plate.csv", "y/plate.csv", "z/plate.csv", "w/README")
      .toDF("key").withColumn("size", lit(1L))
    val got = ZipPlanner.entryNames(df)
      .select("key", "entry_name").as[(String, String)].collect().toMap
    assert(got("x/plate.csv") === "plate.csv")
    assert(got("y/plate.csv") === "plate_1.csv")
    assert(got("z/plate.csv") === "plate_2.csv")
    assert(got("w/README") === "README")
  }

  test("zip entry names stay unique when a suffixed name collides with a literal one") {
    val df = Seq("a/report.txt", "b/report.txt", "c/report_1.txt")
      .toDF("key").withColumn("size", lit(1L))
    val names = ZipPlanner.entryNames(df).select("entry_name").as[String].collect()
    assert(names.distinct.length === 3, s"collision in ${names.toSeq}")
  }
}
