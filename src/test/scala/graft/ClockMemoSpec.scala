package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** The round-19 commit-clock memo: `versionAtTime` caches
  * (version → `#ts=`) per path so TIMESTAMP AS OF on a
  * high-commit-rate table stops re-reading every retained manifest
  * header per call (measured 2.1–4.7 s at 10k manifests). The
  * [[TxnMemoSpec]] contracts, applied to the clock:
  *
  *  - answers are identical on the cold and memoized paths;
  *  - new commits extend the memo incrementally;
  *  - a VACUUM whose watermark manifest disappears forces a rescan;
  *  - a table DELETED and REBUILT at the same path never serves the
  *    OLD incarnation's clock — even when version numbers coincide
  *    (the `#ts=` incarnation pin).
  */
class ClockMemoSpec extends SparkTestBase {
  import spark.implicits._

  test("memoized clock answers match cold answers through commits, vacuum, and rebuild") {
    val path = tmpDir("clock_memo")
    VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
    Thread.sleep(15)
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), path)
    val ts1 = VersionedTable.commitTimeMillis(path, 1L).get
    val ts2 = VersionedTable.commitTimeMillis(path, 2L).get
    assert(ts1 < ts2, "commit clock must advance across the sleep")
    // cold, then memoized: identical resolution
    assert(VersionedTable.versionAtTime(path, ts1 * 1000L) === Some(1L))
    assert(VersionedTable.versionAtTime(path, ts1 * 1000L) === Some(1L))
    assert(VersionedTable.versionAtTime(path, ts2 * 1000L) === Some(2L))
    assert(VersionedTable.versionAtTime(path, ts1 * 1000L - 1L) === None)
    // a NEW commit lands after the memo was built: incremental pickup
    Thread.sleep(15)
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), path)
    val ts3 = VersionedTable.commitTimeMillis(path, 3L).get
    assert(VersionedTable.versionAtTime(path, ts3 * 1000L) === Some(3L))
    assert(VersionedTable.versionAtTime(path, ts2 * 1000L) === Some(2L))
    // vacuum away the memo's watermark window floor: rescan, not crash
    VersionedTable.append(Seq((4L, "d")).toDF("k", "v"), path)
    VersionedTable.vacuum(path, keep = 2)
    assert(VersionedTable.versionAtTime(path, ts1 * 1000L) === None,
      "vacuumed versions leave the addressable range")
    assert(VersionedTable.versionAtTime(path,
      System.currentTimeMillis() * 1000L) === Some(4L))
    // DELETE and REBUILD at the same path: version numbers coincide
    // but the new v1 committed LATER — a probe between the two
    // incarnations' clocks must answer from the NEW one (None), not
    // the cached old stamps
    val oldTs1 = ts1
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true)
    Thread.sleep(15)
    VersionedTable.append(Seq((9L, "z")).toDF("k", "v"), path)
    val newTs1 = VersionedTable.commitTimeMillis(path, 1L).get
    assert(oldTs1 < newTs1)
    assert(VersionedTable.versionAtTime(path, oldTs1 * 1000L) === None,
      "a rebuilt table must not serve the old incarnation's clock")
    assert(VersionedTable.versionAtTime(path, newTs1 * 1000L) === Some(1L))
  }
}
