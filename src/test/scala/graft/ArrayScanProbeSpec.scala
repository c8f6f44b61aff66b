package graft

import org.apache.spark.sql.types._

/** Capability probe for round-19 nested DDL through ARRAY-of-struct
  * ELEMENTS (the reference's dominant nested shape — the
  * `file_manifest` entry list, `agf_ingestion_lambda.py:207,239-245`):
  * pins that the parquet reader extends the round-18 plain-struct
  * behaviors into repeated groups, so metadata-only ADD/WIDEN of an
  * array element field can read old batches without rewrite. An
  * engine upgrade that regresses either fails HERE with a named
  * contract instead of deep inside a catalog read.
  */
class ArrayScanProbeSpec extends SparkTestBase {
  import spark.implicits._

  test("parquet scan null-fills a requested field absent from array element structs") {
    val dir = tmpDir("probe_arr_add")
    spark.sql(
      "SELECT 1L AS k, array(named_struct('a', 10L), named_struct('a', 20L)) AS m")
      .write.mode("overwrite").parquet(dir)
    val want = StructType(Seq(
      StructField("k", LongType),
      StructField("m", ArrayType(StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))))))
    val got = spark.read.schema(want).parquet(dir)
      .selectExpr("k", "m[0].a", "m[0].b", "m[1].a", "m[1].b")
      .as[(Long, Long, Option[String], Long, Option[String])].head()
    assert(got === ((1L, 10L, None, 20L, None)))
  }

  test("parquet scan promotes a requested int to long inside array elements") {
    val dir = tmpDir("probe_arr_widen")
    spark.sql(
      "SELECT 1L AS k, array(named_struct('a', CAST(7 AS INT))) AS m")
      .write.mode("overwrite").parquet(dir)
    val want = StructType(Seq(
      StructField("k", LongType),
      StructField("m", ArrayType(StructType(Seq(
        StructField("a", LongType)))))))
    val got = spark.read.schema(want).parquet(dir)
      .selectExpr("m[0].a").as[Long].head()
    assert(got === 7L)
  }

  test("a positional cast renames array element struct fields") {
    // the toLogical fast path: physical-named array<struct> casts to
    // the logical presentation positionally, elements included
    val df = spark.sql(
      "SELECT array(named_struct('a#2', 1L, 'b', 's')) AS m")
    val target = ArrayType(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    val out = df.select(org.apache.spark.sql.functions.col("m")
      .cast(target).as("m")).selectExpr("m[0].a", "m[0].b")
      .as[(Long, String)].head()
    assert(out === ((1L, "s")))
  }
}
