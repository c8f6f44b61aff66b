package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** The round-18 txn-guard memo: manifests are immutable, so the
  * idempotency scan caches (txnId -> version) per path and pays only
  * NEW manifests per probe — the ManifestScaleProbe measured the
  * uncached scan at ~3.6 s PER streaming commit on a 10k-manifest
  * table. Contracts the memo must not break:
  *
  *  - replays still dedup (with other commits interleaved);
  *  - a VACUUM forces a rescan of the retention window (no stale
  *    watermark against renumbered listings);
  *  - a table DELETED and REBUILT at the same path never dedups
  *    against the OLD incarnation's ids — even when version numbers
  *    coincide (the `#ts=` identity check).
  */
class TxnMemoSpec extends SparkTestBase {
  import spark.implicits._

  test("replays dedup across interleaved commits; vacuum rescans; rebuilds never false-dedup") {
    val path = tmpDir("txn_memo")
    val v1 = VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path,
      txnId = Some("tx-1"))
    // interleave a foreign commit, then replay: dedup returns v1
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), path)
    assert(VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path,
      txnId = Some("tx-1")) === v1)
    // second probe rides the memo (same answer)
    assert(VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path,
      txnId = Some("tx-1")) === v1)
    // more txn commits, then vacuum away the early versions: the
    // memo's watermark manifest disappears — the rescan must neither
    // crash nor forget the RETAINED ids
    val v4 = VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), path,
      txnId = Some("tx-2"))
    VersionedTable.append(Seq((4L, "d")).toDF("k", "v"), path)
    VersionedTable.vacuum(path, keep = 2)
    assert(VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), path,
      txnId = Some("tx-2")) === v4)
    // DELETE the table and rebuild at the same path: the old
    // incarnation's ids must not dedup the new table's first commits
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true)
    val n1 = VersionedTable.append(Seq((9L, "z")).toDF("k", "v"), path,
      txnId = Some("tx-2"))
    assert(n1 === 1L, "a rebuilt table must accept the old incarnation's ids")
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect() === Array((9L, "z")))
    // and within the new incarnation the id dedups again
    assert(VersionedTable.append(Seq((9L, "z")).toDF("k", "v"), path,
      txnId = Some("tx-2")) === n1)
  }
}
