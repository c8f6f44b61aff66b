package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** [[VersionedTable.exportHiveLayout]]: `col=value` dirs for external
  * readers, content-invariant with the resolved view.
  */
class HiveExportSpec extends SparkTestBase {
  import spark.implicits._

  test("export writes col=value dirs; content equals the resolved view; refusals are loud") {
    val path = tmpDir("hive_src")
    val out = tmpDir("hive_out") + "/export"
    VersionedTable.append(Seq(
      (1L, "A", 10L), (2L, "B", 20L), (3L, "A", 30L), (4L, "B", 40L))
      .toDF("k", "grp", "v"), path)
    VersionedTable.deleteKeys(Seq(3L).toDF("k"), "k", path)
    VersionedTable.upsert(Seq((2L, "B", 200L)).toDF("k", "grp", "v"),
      "k", path)
    VersionedTable.exportHiveLayout(spark,
      path, VersionedTable.latestVersion(path).get, Seq("grp"), out)
    // hive dir contract
    val f = new Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dirs = f.listStatus(new Path(out)).filter(_.isDirectory)
      .map(_.getPath.getName).sorted
    assert(dirs === Array("grp=A", "grp=B"))
    // a foreign engine's read (plain parquet) equals the resolved
    // view: tombstone applied, correction present
    val back = spark.read.parquet(out).select("k", "grp", "v")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back === Array((1L, "A", 10L), (2L, "B", 200L), (4L, "B", 40L)))
    // refusal: a partition column the table lacks
    val e = intercept[IllegalArgumentException] {
      VersionedTable.exportHiveLayout(spark, path,
        VersionedTable.latestVersion(path).get, Seq("nope"), out)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("incremental sync rewrites ONLY touched partitions; untouched dirs byte-identical; vanished dirs removed") {
    val path = tmpDir("hive_sync_src")
    val out = tmpDir("hive_sync_out") + "/export"
    val ckpt = tmpDir("hive_sync_ckpt")
    VersionedTable.append(Seq(
      (1L, "A", 10L), (2L, "B", 20L), (3L, "C", 30L), (4L, "B", 40L))
      .toDF("k", "grp", "v"), path)                                 // v1
    // base sync = full export
    assert(VersionedTable.syncHiveLayout(spark, path, Seq("grp"), out,
      ckpt) === Some((0L, 1L)))
    val f = new Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def snapshotDir(d: String): Map[String, (Long, Long)] =
      f.listStatus(new Path(s"$out/$d")).filter(_.isFile)
        .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime))
        .toMap
    val aBefore = snapshotDir("grp=A")
    // mutate: delete ALL of C (its dir must vanish), upsert into B,
    // append a new partition D — A is never touched
    VersionedTable.deleteKeys(Seq(3L).toDF("k"), "k", path)         // v2
    VersionedTable.upsert(Seq((2L, "B", 200L)).toDF("k", "grp", "v"),
      "k", path)                                                    // v3
    VersionedTable.append(Seq((9L, "D", 90L)).toDF("k", "grp", "v"),
      path)                                                         // v4
    assert(VersionedTable.syncHiveLayout(spark, path, Seq("grp"), out,
      ckpt) === Some((1L, 4L)))
    // the untouched partition is BYTE-IDENTICAL (same files, same
    // sizes, same mtimes — never rewritten, never even listed by the
    // write)
    assert(snapshotDir("grp=A") === aBefore)
    // the fully-deleted partition's dir is gone (delete-awareness)
    assert(!f.exists(new Path(s"$out/grp=C")))
    // a foreign plain-parquet read equals the resolved view
    val back = spark.read.parquet(out).select("k", "grp", "v")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back === Array((1L, "A", 10L), (2L, "B", 200L),
      (4L, "B", 40L), (9L, "D", 90L)))
    // idempotent: nothing new -> no-op, still byte-identical
    assert(VersionedTable.syncHiveLayout(spark, path, Seq("grp"), out,
      ckpt) === None)
    assert(snapshotDir("grp=A") === aBefore)
  }
}
