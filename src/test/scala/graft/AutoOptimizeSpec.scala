package graft

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.VersionedTable

/** Self-scheduled maintenance: the `maybeCompact` metadata gate and
  * the sink's `autoCompactTombstones` option keep merge-on-read debt
  * bounded — the replica read stays a single-relation scan (~1×
  * slope) with NO manual OPTIMIZE, turning the measured q300/q301
  * pair into a knob.
  */
class AutoOptimizeSpec extends SparkTestBase {
  import spark.implicits._

  private def singleRelationScan(path: String): Boolean = {
    val plan = VersionedTable.readLatest(spark, path)
      .queryExecution.optimizedPlan
    val rels = plan.collect { case r: LogicalRelation => r }
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    rels.size == 1 && joins.isEmpty
  }

  test("maybeCompact bounds tombstone debt at the threshold; reads stay single-relation") {
    val path = tmpDir("ao_direct")
    val base = (0L until 300L).map(k => (k, k)).toDF("k", "v")
    VersionedTable.append(base, path)
    (0 until 7).foreach { i =>
      VersionedTable.upsert(
        base.filter($"k" % 7 === i).withColumn("v", $"v" + lit(1000L * (i + 1))),
        "k", path)
      val compacted = VersionedTable.maybeCompact(spark, path,
        tombstoneThreshold = 3)
      assert(VersionedTable.tombstoneDebt(path) < 3 || compacted.isEmpty,
        "debt must fold at the threshold")
      assert(VersionedTable.tombstoneDebt(path) <= 3)
    }
    // 7 upserts with threshold 3: folds after the 3rd and 6th, one
    // tombstone left from the 7th
    assert(VersionedTable.tombstoneDebt(path) === 1)
    VersionedTable.maybeCompact(spark, path, tombstoneThreshold = 1)
    assert(VersionedTable.tombstoneDebt(path) === 0)
    assert(singleRelationScan(path),
      "a debt-free table reads as ONE relation — the ~1x slope, structurally")
    // content exact: every key got exactly one +1000*(i+1) correction
    val got = VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().toMap
    (0L until 300L).foreach { k =>
      assert(got(k) === k + 1000L * (k % 7 + 1), s"key $k")
    }
  }

  test("the gate is metadata-only: below threshold it commits nothing") {
    val path = tmpDir("ao_noop")
    VersionedTable.append(Seq((1L, 1L)).toDF("k", "v"), path)
    VersionedTable.upsert(Seq((1L, 2L)).toDF("k", "v"), "k", path)
    val v = VersionedTable.latestVersion(path)
    assert(VersionedTable.maybeCompact(spark, path,
      tombstoneThreshold = 5).isEmpty)
    assert(VersionedTable.latestVersion(path) === v,
      "below threshold: no commit, one manifest read")
  }

  test("the sink's autoCompactTombstones keeps an Update-mode replica debt-free") {
    val src = tmpDir("ao_sink_src")
    val ckpt = tmpDir("ao_sink_ckpt")
    val dst = tmpDir("ao_sink_dst")
    val base = (0L until 50L).map(k => (k, k)).toDF("k", "v")
    // five source commits, delivered one per micro-batch
    VersionedTable.append(base, src)
    (1 to 4).foreach { i =>
      VersionedTable.append(
        base.filter($"k" % 4 === i % 4).withColumn("v", $"v" + lit(100L * i)),
        src)
    }
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("mergeKey", "k")
      .option("autoCompactTombstones", "2")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    // batch 1 seeds (no tombstone); batches 2-5 upsert: debt cycles
    // 1, 2->fold, 1, 2->fold under threshold 2
    assert(VersionedTable.tombstoneDebt(dst) === 0,
      s"auto-compaction must keep the replica debt-free, got " +
        s"${VersionedTable.tombstoneDebt(dst)}")
    assert(singleRelationScan(dst), "replica reads stay ~1x slope")
    // last-writer-wins content: key k took the HIGHEST i with i%4==k%4
    val got = VersionedTable.readLatest(spark, dst)
      .as[(Long, Long)].collect().toMap
    (0L until 50L).foreach { k =>
      val lastI = (k % 4) match {
        case 0 => 4L; case 1 => 1L; case 2 => 2L; case 3 => 3L
      }
      assert(got(k) === k + 100L * lastI, s"key $k")
    }
  }
}
