package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** The ingest tables are written Hive-partitioned; instrument/date
  * predicates must prune at the file-index level (PartitionFilters in
  * the scan, not post-scan filters).
  */
class PartitionPruningSpec extends SparkTestBase {

  private val hex = "feed" * 16

  private def write(root: String, rel: String, content: String): Unit = {
    val p = Paths.get(root, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("sync_runs partitioned by (instrument_id, date); predicates prune partitions") {
    val root = tmpDir("prune_fixture")
    for (i <- Seq("instrA", "instrB"); d <- Seq("14", "15")) {
      write(root, s"raw/$i/2026/01/$d/run_${i}_$d/run.json",
        s"""{"computer_name": "PC", "files_in_batch": 1,
            "sync_timestamp": "2026-01-${d}T01:00:00Z",
            "file_manifest": [{"path": "S/E/f.csv", "size": 1, "checksum": "$hex"}]}""")
    }
    val tables = tmpDir("prune_tables")
    IngestJob.runBatch(spark, root, tables, fixedNow = Some(1768500000L))

    // layout on disk is instrument_id=<v>/date=<v>
    assert(Files.exists(Paths.get(s"$tables/sync_runs/instrument_id=instrA/date=2026-01-15")))

    val q = spark.read.parquet(s"$tables/sync_runs")
      .filter(col("instrument_id") === "instrA" && col("date") === "2026-01-15")
    assert(q.count() === 1)
    // the pruned scan touched exactly one of the four partition files:
    // read the scan's numFiles metric (plan strings truncate paths, so
    // string assertions can pass vacuously)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val executed = q.queryExecution.executedPlan
    q.collect() // drive the scan so metrics populate
    val scan = scans(executed).head
    assert(scan.metrics("numFiles").value === 1,
      s"expected 1 pruned file, got ${scan.metrics("numFiles").value}")
    val total = spark.read.parquet(s"$tables/sync_runs")
    total.collect()
    // sanity: the unpruned table really has 4 partition files
    assert(spark.read.parquet(s"$tables/sync_runs").inputFiles.length === 4)
  }
}
