package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Packing}
import graft.pipeline._

/** End-to-end composition: ingest a manifest tree, then run the
  * training-data operators (curation -> dedup -> packing) over the
  * derived corpus — all library pieces chained, nothing bespoke.
  */
class PipelineComposeSpec extends SparkTestBase {
  import spark.implicits._

  private val hex = "dead" * 16

  test("ingest output feeds the curation/dedup/packing chain") {
    // ingest a small tree
    val root = tmpDir("compose")
    val p = Paths.get(root, "raw/i1/2026/04/01/runZ/run.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      s"""{"computer_name": "PC", "files_in_batch": 2,
          "sync_timestamp": "2026-04-01T00:00:00Z",
          "file_manifest": [
            {"path": "A/E1/x.csv", "size": 10, "checksum": "$hex"},
            {"path": "A/E1/y.csv", "size": 20, "checksum": "$hex"}]}""")
    val tables = tmpDir("compose_tables")
    IngestJob.runBatch(spark, root, tables, fixedNow = Some(1768500000L))

    // derive a "document" per inventory row from its metadata text
    val docs = spark.read.parquet(s"$tables/file_inventory")
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("experiment_id"), col("file_name"),
          col("file_type"), col("staff_name"), col("run_id"),
          col("instrument_id"), col("s3_key")).as("text"),
        lit("en").as("lang"))
    assert(docs.count() === 2)

    val kept = Curation.filter(docs, "text", "lang",
      Curation.Thresholds(minTokens = 2, maxTokens = 100,
        maxStopwordRatio = 1.0, minUniqueRatio = 0.0,
        allowedLangs = Seq("en")))
    assert(kept.count() === 2)

    val groups = Dedup.exactGroups(kept, "doc_id", "text")
    assert(groups.count() === 2) // distinct filenames -> no dups

    val packed = Packing.packByBudgetDistributed(
      kept.select(col("doc_id"), size(split(col("text"), " ")).as("tokens")),
      "doc_id", "tokens", budget = 1000L)
    assert(packed.count() === 2)
    assert(packed.select(max("pack_id")).head().getLong(0) === 0L) // fits one pack
  }
}
