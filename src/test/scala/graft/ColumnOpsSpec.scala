package graft

import org.apache.spark.sql.functions._
import graft.functions.ColumnOps

/** Unit tests for the scalar parity layer against the reference's
  * Python semantics (edge cases from FIXTURES.md §1 and SURVEY §5).
  */
class ColumnOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, input: (String, String)*): Any =
    input.toSeq.toDF("a", "b").select(colExpr).head().get(0)

  test("V1 path validation accepts the contract and rejects variants") {
    val cases = Seq(
      ("raw/instr1/2026/01/15/run1/run.json", true),
      ("raw/instr1/2026/01/15/run1/staff/payload/exp/experiment.json", true),
      ("archive/instr1/2026/01/15/run1/run.json", false), // wrong prefix
      ("raw/instr1/2026/01/run1/x.json", false),          // too short
      ("raw/instr1/20xx/01/15/run1/run.json", false),     // non-digit year
      ("raw/instr1/2026/1a/15/run1/run.json", false))     // non-digit month
    val df = cases.toDF("key", "expected")
      .withColumn("got", ColumnOps.isValidS3Path(col("key")))
    assert(df.filter(col("got") =!= col("expected")).count() === 0)
  }

  test("V2 checksum normalization strips prefix, lowercases, validates") {
    val hex64 = "A3F2" * 16
    val df = Seq(
      (s"sha256:$hex64", true),
      (hex64, true),
      (hex64.toLowerCase, true),
      (s"  $hex64\n", true),        // reference strip()s whitespace
      (hex64.substring(1), false),  // 63 chars
      ("zz" * 32, false))           // non-hex
      .toDF("c", "expected")
      .withColumn("norm", ColumnOps.normalizedChecksum(col("c")))
      .withColumn("ok", ColumnOps.isValidChecksum(col("c")))
    assert(df.filter(col("ok") =!= col("expected")).count() === 0)
    assert(df.filter(col("expected") && col("norm") =!= lit(hex64.toLowerCase))
      .count() === 0)
  }

  test("P1 lenient timestamp: ISO with Z and offset parse; garbage falls back") {
    val expected = java.time.Instant.parse("2026-01-15T04:22:31Z").getEpochSecond
    val got = one(ColumnOps.lenientEpoch(col("a")), ("2026-01-15T04:22:31Z", ""))
    assert(got === expected)
    val got2 = one(ColumnOps.lenientEpoch(col("a")), ("2026-01-15T04:22:31+00:00", ""))
    assert(got2 === expected)
    // garbage -> now(): just check it is recent, not null
    val now = System.currentTimeMillis() / 1000
    val got3 = one(ColumnOps.lenientEpoch(col("a")), ("not-a-date", "")).asInstanceOf[Long]
    assert(math.abs(got3 - now) < 3600)
    assert(one(ColumnOps.isParseableTimestamp(col("a")), ("not-a-date", "")) === false)
  }

  test("P9 experiment id: folder vs standalone") {
    // staff/exp/file -> exp_staff ; staff/file -> standalone ; file ->
    // standalone ; empty folder segment is falsy -> standalone
    val df = Seq(
      ("Felix/TestExp2/plate1.csv", "TestExp2_Felix"),
      ("Dana/readme.txt", "standalone_Dana_run1"),
      ("Ann//x.txt", "standalone_Ann_run1"),
      ("lone.txt", "standalone_lone.txt_run1"))
      .toDF("path", "expected")
      .withColumn("staff", ColumnOps.staffName(lit(null).cast("string"), col("path")))
      .withColumn("got", ColumnOps.experimentId(col("path"), col("staff"), lit("run1")))
    assert(df.filter(col("got") =!= col("expected")).count() === 0)
  }

  test("P10 payload key reconstruction incl. single-segment quirk") {
    val runBase = lit("raw/i/2026/01/15/run1")
    val df = Seq(
      ("Felix/TestExp2/f.csv", "raw/i/2026/01/15/run1/Felix/payload/TestExp2/f.csv"),
      ("Dana/f.txt", "raw/i/2026/01/15/run1/Dana/payload/f.txt"),
      // reference quirk: single segment duplicates the filename
      ("f.txt", "raw/i/2026/01/15/run1/f.txt/payload/f.txt"))
      .toDF("path", "expected")
      .withColumn("got", ColumnOps.reconstructedKey(runBase, col("path")))
    assert(df.filter(col("got") =!= col("expected")).count() === 0)
  }

  test("P12 extension: lowercased last suffix else unknown") {
    val df = Seq(
      ("a/b/plate1.CSV", "csv"), ("a/b/archive.tar.gz", "gz"), ("a/b/README", "unknown"))
      .toDF("path", "expected")
      .withColumn("got", ColumnOps.fileExtension(col("path")))
    assert(df.filter(col("got") =!= col("expected")).count() === 0)
  }

  test("P11 experiment file key joins dirname") {
    val got = one(ColumnOps.experimentFileKey(col("a"), col("b")),
      ("raw/i/2026/01/15/r1/s/payload/e/experiment.json", "sub/data.fcs"))
    assert(got === "raw/i/2026/01/15/r1/s/payload/e/sub/data.fcs")
  }

  test("P5 total bytes falls back to manifest sum") {
    val df = spark.sql(
      """SELECT * FROM VALUES
         (CAST(1000 AS BIGINT), array(named_struct('size', CAST(1 AS BIGINT)))),
         (CAST(NULL AS BIGINT), array(named_struct('size', CAST(2 AS BIGINT)),
                                      named_struct('size', CAST(3 AS BIGINT))))
         AS t(provided, manifest)""")
      .select(ColumnOps.totalBytes(col("provided"), col("manifest")).as("tb"))
    assert(df.as[Long].collect().sorted === Array(5L, 1000L))
  }

  test("P2 url decode matches unquote_plus incl. plus-as-space") {
    assert(one(ColumnOps.urlDecoded(col("a")), ("a%2Fb+c%20d", "")) === "a/b c d")
  }
}
