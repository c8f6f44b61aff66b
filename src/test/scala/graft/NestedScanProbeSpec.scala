package graft

import org.apache.spark.sql.types._

/** Capability probe pinning the two parquet-reader behaviors the
  * round-18 nested DDL relies on, so an engine upgrade that regresses
  * either fails HERE with a named contract instead of deep inside a
  * catalog read:
  *
  *  - a requested struct field ABSENT from the file null-fills
  *    (nested ADD COLUMNS reads old batches without rewrite);
  *  - a requested INNER type wider than the file's promotes natively
  *    (SPARK-40876 — nested ALTER COLUMN TYPE widening reads narrow
  *    batches without rewrite).
  */
class NestedScanProbeSpec extends SparkTestBase {
  import spark.implicits._

  test("parquet scan null-fills a requested nested field absent from the file") {
    val dir = tmpDir("probe_nested_add")
    spark.sql("SELECT 1L AS k, named_struct('a', 10L) AS s")
      .write.mode("overwrite").parquet(dir)
    val want = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val got = spark.read.schema(want).parquet(dir)
      .selectExpr("k", "s.a", "s.b").as[(Long, Long, Option[String])]
      .head()
    assert(got === ((1L, 10L, None)))
  }

  test("parquet scan promotes a requested nested int to long natively") {
    val dir = tmpDir("probe_nested_widen")
    spark.sql("SELECT 1L AS k, named_struct('a', CAST(7 AS INT)) AS s")
      .write.mode("overwrite").parquet(dir)
    val want = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    val got = spark.read.schema(want).parquet(dir)
      .selectExpr("s.a").as[Long].head()
    assert(got === 7L)
  }
}
