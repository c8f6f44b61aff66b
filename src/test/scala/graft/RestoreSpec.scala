package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** RESTORE TABLE — the metadata-only rewind commit: refusal and
  * edge legs beyond q317's oracle-gated lifecycle.
  */
class RestoreSpec extends SparkTestBase {
  import spark.implicits._

  test("restore past the retention floor refuses loudly; to-latest is a no-op; chains classify") {
    val path = tmpDir("rst_edges")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
    VersionedTable.append(Seq((2L, 20L)).toDF("k", "v"), path)
    VersionedTable.append(Seq((3L, 30L)).toDF("k", "v"), path)
    // no-op: restoring to the latest commits nothing
    assert(VersionedTable.restore(path, 3L) === 3L)
    assert(VersionedTable.latestVersion(path) === Some(3L))
    // rewind to v1, then restore the restore (back to v3's content)
    val r1 = VersionedTable.restore(path, 1L)
    assert(r1 === 4L)
    assert(VersionedTable.readLatest(spark, path).count() === 1L)
    val r2 = VersionedTable.restore(path, 3L)
    assert(VersionedTable.readAt(spark, path, r2)
      .as[(Long, Long)].collect().sorted
      === Array((1L, 10L), (2L, 20L), (3L, 30L)))
    assert(VersionedTable.restoredFrom(path, r1) === Some(1L))
    assert(VersionedTable.history(spark, path)
      .filter(col("kind") === "restore").count() === 2L)
    // vacuum away early versions: restoring below the floor refuses
    VersionedTable.vacuum(path, keep = 2)
    val e = intercept[Exception] { VersionedTable.restore(path, 1L) }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("SQL RESTORE over a non-graft name raises the name-the-fix refusal") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("RESTORE TABLE definitely_not_graft TO VERSION AS OF 1")
    }
    assert(e.getMessage.contains("not a graft table"))
  }
}
