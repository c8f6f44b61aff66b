package graft

import java.nio.file.{Files, Paths}
import graft.pipeline._

/** Streaming-vs-batch parity (SURVEY §2.9): the same tree ingested
  * through the checkpointed AvailableNow streaming path must produce
  * exactly the batch-mode tables, and a second streaming run must be
  * a no-op (checkpoint + idempotent merge = effectively-once).
  */
class StreamingIngestSpec extends SparkTestBase {

  private val hex = "beef" * 16
  private val FIXED_NOW = Some(1768500000L)

  private def write(root: String, rel: String, content: String): Unit = {
    val p = Paths.get(root, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def fixtureTree(): String = {
    val root = tmpDir("stream_fixture")
    write(root, "raw/instr2/2026/02/01/runA/run.json",
      s"""{"computer_name": "PC-A", "files_in_batch": 1,
          "sync_timestamp": "2026-02-01T01:00:00Z",
          "file_manifest": [{"path": "Ann/Exp1/a.fcs", "size": 42,
                             "checksum": "$hex"}]}""")
    write(root, "raw/instr2/2026/02/01/runA/Ann/payload/Exp1/experiment.json",
      s"""{"experiment_id": "Exp1_Ann", "experiment_folder": "Exp1",
          "staff_name": "Ann", "instrument": "instr2", "computer": "PC-A",
          "last_updated": "2026-02-01T01:30:00Z", "file_count": 1,
          "total_size_bytes": 42, "s3_location": "s3://b/x/",
          "files": [{"name": "a.fcs", "relative_path": "a.fcs", "size": 42,
                     "checksum": "$hex"}]}""")
    root
  }

  test("streaming AvailableNow ingest matches batch ingest exactly") {
    val root = fixtureTree()
    val batchTables = tmpDir("tables_batch")
    val streamTables = tmpDir("tables_stream")
    val ckpt = tmpDir("ckpt")

    IngestJob.runBatch(spark, root, batchTables, fixedNow = FIXED_NOW)
    IngestJob.runStreaming(spark, root, streamTables, ckpt, fixedNow = FIXED_NOW)

    for (t <- Seq(Schemas.SyncRuns, Schemas.Experiments, Schemas.FileInventory)) {
      val b = spark.read.parquet(s"$batchTables/$t").collect().toSet
      val s = spark.read.parquet(s"$streamTables/$t").collect().toSet
      assert(s === b, s"table $t differs between batch and streaming")
    }

    // second streaming run from the same checkpoint: no new files ->
    // no-op; tables unchanged
    val before = spark.read.parquet(s"$streamTables/${Schemas.FileInventory}").collect().toSet
    IngestJob.runStreaming(spark, root, streamTables, ckpt, fixedNow = FIXED_NOW)
    val after = spark.read.parquet(s"$streamTables/${Schemas.FileInventory}").collect().toSet
    assert(after === before)
  }

  test("experiment-only tree streams fully (no run.json needed to drive progress)") {
    val root = tmpDir("exp_only")
    write(root, "raw/instr3/2026/03/01/runC/Bo/payload/ExpX/experiment.json",
      s"""{"experiment_id": "ExpX_Bo", "experiment_folder": "ExpX",
          "staff_name": "Bo", "instrument": "instr3", "computer": "PC-C",
          "last_updated": "2026-03-01T01:00:00Z", "file_count": 1,
          "total_size_bytes": 7, "s3_location": "s3://b/y/",
          "files": [{"name": "d.fcs", "relative_path": "d.fcs", "size": 7,
                     "checksum": "$hex"}]}""")
    val tables = tmpDir("tables_exp_only")
    IngestJob.runStreaming(spark, root, tables, tmpDir("ckpt_exp"), fixedNow = FIXED_NOW)
    assert(spark.read.parquet(s"$tables/${Schemas.Experiments}").count() === 1)
    assert(spark.read.parquet(s"$tables/${Schemas.FileInventory}").count() === 1)
  }

  test("late file arriving after first drain is picked up on the next run") {
    val root = fixtureTree()
    val tables = tmpDir("tables_late")
    val ckpt = tmpDir("ckpt_late")
    IngestJob.runStreaming(spark, root, tables, ckpt, fixedNow = FIXED_NOW)
    assert(spark.read.parquet(s"$tables/${Schemas.SyncRuns}").count() === 1)

    write(root, "raw/instr2/2026/02/02/runB/run.json",
      s"""{"computer_name": "PC-B", "files_in_batch": 0,
          "sync_timestamp": "2026-02-02T01:00:00Z", "file_manifest": []}""")
    IngestJob.runStreaming(spark, root, tables, ckpt, fixedNow = FIXED_NOW)
    val runs = spark.read.parquet(s"$tables/${Schemas.SyncRuns}")
    assert(runs.count() === 2)
  }
}
