package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.operators.Retrieval

/** The written inverted index (postings partitioned by md5 term
  * bucket) must turn the query-term set into parquet partition
  * pruning, and the indexed search must reproduce bm25TopK exactly.
  */
class RetrievalIndexSpec extends SparkTestBase {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case qs: QueryStageExec => scans(qs.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  private val terms = Seq("spark", "vector", "stream")

  test("driver-side bucket twin matches the column expression") {
    import spark.implicits._
    val df = terms.toDF("term")
      .select(Retrieval.termBucket(org.apache.spark.sql.functions.col("term"), 16)
        .as("b"), org.apache.spark.sql.functions.col("term"))
    val got = df.as[(Long, String)].collect().map(_.swap).toMap
    terms.foreach(t => assert(got(t) === Retrieval.termBucketOf(t, 16), t))
  }

  test("indexed BM25 prunes postings to the query-term buckets and matches bm25TopK") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = tmpDir("inv_idx") + "/index"
    Retrieval.invertedIndexWrite(docs, "doc_id", "text", idx)

    val nBucketDirs = new java.io.File(idx + "/postings").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(nBucketDirs > 3, s"expected many bucket partitions, got $nBucketDirs")

    val indexed = Retrieval.bm25TopKIndexed(spark, idx, terms, k = 20)
    val rows = indexed.collect() // drive the scan so metrics populate

    val probed = terms.map(Retrieval.termBucketOf(_, 16)).distinct.size
    val scan = scans(indexed.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("postings"))
    assert(scan.nonEmpty, "no FileSourceScan over the postings found")
    assert(scan.exists(_.partitionFilters.exists(_.toString.contains("bucket"))),
      "no partition filter on bucket")
    val partsRead = scan.map(_.metrics("numPartitions").value).max
    assert(partsRead <= probed && partsRead < nBucketDirs,
      s"scan read $partsRead of $nBucketDirs bucket partitions — not pruned")

    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet === direct)
    assert(rows.nonEmpty)
  }

  test("q81 build-if-absent guard rejects a partially-written index (no _SUCCESS)") {
    val sf = "/root/testdata/sf0.001"
    val path = graft.queries.MiningQueries.invIndexPath(sf)
    // simulate an interrupted build: postings dir exists, no _SUCCESS
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(path))
    new java.io.File(path + "/postings").mkdirs()
    new java.io.File(path + "/postings/part-stale.parquet").createNewFile()
    val got = SparkEntry.queries("q81_bm25_indexed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the guard must have rebuilt: results match the non-indexed path
    val direct = Retrieval.bm25TopK(Tables.documents(spark, sf),
      "doc_id", "text", graft.queries.MiningQueries.bm25Terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === direct && got.nonEmpty)
    assert(new java.io.File(path + "/postings/_SUCCESS").exists())
  }

  test("reciprocal-rank fusion sums exact integer contributions per ranker") {
    import spark.implicits._
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rn")
    val r2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("doc_id", "rn")
    val got = Retrieval.reciprocalRankFusion(Seq(r1, r2), "doc_id", "rn")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val c = (r: Int) => 1000000L / (60 + r)
    assert(got(10L) === ((c(1) + c(2), 2L)))
    assert(got(20L) === ((c(2) + c(1), 2L)))
    assert(got(30L) === ((c(3), 1L)))
    assert(got(40L) === ((c(3), 1L)))
    // both-list docs dominate single-list docs at any rank here
    assert(got(10L)._1 > got(30L)._1)
  }
}
