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
}
