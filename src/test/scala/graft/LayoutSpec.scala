package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.operators.Layout

/** Range-sorted layout must turn a pushed-down range predicate into
  * row-group skipping: the scan emits only the row groups whose
  * min/max overlap the predicate, while the same data laid out
  * round-robin (every row group spans the full value range) can skip
  * nothing.
  */
class LayoutSpec extends SparkTestBase {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case qs: QueryStageExec => scans(qs.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  test("range-sorted files skip row groups under a range predicate") {
    val dir = tmpDir("layout")
    val n = 400000L
    val df = spark.range(n).select(col("id"),
      pmod(hash(col("id")), lit(997)).as("payload"))
    // hash-scrambled row order: every row group AND page spans the
    // full id range, so neither row-group stats nor parquet column
    // indexes can skip anything (a round-robin repartition is not
    // enough — its pages stay clustered by the sequential input)
    df.orderBy(hash(col("id"))).write.parquet(s"$dir/scrambled")
    Layout.rangeSortedWrite(df, "id", 8, s"$dir/sorted")

    def scanRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("id") < n / 10).agg(count(lit(1)))
      val result = q.collect()(0).getLong(0)
      val emitted = scans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      (result, emitted)
    }
    val (sortedCount, sortedEmitted) = scanRows(s"$dir/sorted")
    val (rrCount, rrEmitted) = scanRows(s"$dir/scrambled")
    assert(sortedCount === n / 10 && rrCount === n / 10) // same answer
    // scrambled layout: every row group spans the full id range ->
    // the reader can skip nothing and emits ~all rows
    assert(rrEmitted >= n * 9 / 10, s"expected ~$n emitted, got $rrEmitted")
    // sorted layout: only the overlapping row group(s) survive
    assert(sortedEmitted <= n / 4,
      s"sorted layout emitted $sortedEmitted of $n — row groups not skipped")
  }

  test("globalPrefixSum matches a single-partition running sum") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i * 37 % 101) + 1)).toDF("id", "v")
    val got = graft.operators.Layout
      .globalPrefixSum(df.repartition(13), Seq(org.apache.spark.sql.functions.col("id")), "v", "cum", numPartitions = 7)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    var acc = 0L
    (1L to 500L).foreach { i =>
      acc += (i * 37 % 101) + 1
      assert(got(i) === acc, s"at id $i")
    }
  }

  test("globalPrefixSum total equals column sum regardless of partitioning") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val out = graft.operators.Layout
      .globalPrefixSum(df.repartition(5), Seq(org.apache.spark.sql.functions.col("id")), "v", "cum", numPartitions = 3)
    assert(out.agg(org.apache.spark.sql.functions.max("cum"))
      .head().getLong(0) === 5050L)
  }
}
