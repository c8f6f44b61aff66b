package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("approx distinct is within rsd of exact") {
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("exact"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.cardinalityProfile(li, "l_returnflag", "l_partkey")
      .select("l_returnflag", "approx_distinct_1pct")
      .as[(String, Long)].collect().toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("approx quantiles bracket the exact median") {
    val q = Sketches.quantileProfile(li, "l_returnflag", "l_extendedprice",
      Seq(0.5)).select("quantiles").as[Seq[Double]].collect()
    q.foreach { qs =>
      assert(qs.head > 0 && qs.length === 1)
    }
    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approxAll = Sketches.quantileProfile(
      li.withColumn("g", lit(1)), "g", "l_extendedprice", Seq(0.5))
      .select("quantiles").as[Seq[Double]].head().head
    assert(math.abs(approxAll - exactMedian) / exactMedian < 0.05)
  }

  test("frequent items find the heavy hitters") {
    val fi = Sketches.frequentItems(li, Seq("l_returnflag"), 0.2)
    val items = fi.head().getSeq[String](0).toSet
    // the three return flags each exceed 20% support at this SF
    assert(Set("A", "N", "R").subsetOf(items))
  }

  test("strict timestamp mode quarantines unparseable docs") {
    import graft.pipeline.IngestPipeline
    val df = Seq(
      ("raw/i/2026/01/15/r1/run.json", "2026-01-15T04:22:31Z"),
      ("raw/i/2026/01/15/r2/run.json", "not-a-date"),
      ("raw/i/2026/01/15/r3/run.json", ""))
      .toDF("s3_key", "sync_timestamp")
    val (okLenient, badLenient) =
      IngestPipeline.strictTimestampGate(df, Seq("sync_timestamp"), strict = false)
    assert(okLenient.count() === 3 && badLenient.count() === 0)
    val (okStrict, badStrict) =
      IngestPipeline.strictTimestampGate(df, Seq("sync_timestamp"), strict = true)
    assert(okStrict.count() === 1)
    assert(badStrict.select("quarantine_reason").distinct().as[String].collect()
      === Array("unparseable_timestamp"))
  }
}
