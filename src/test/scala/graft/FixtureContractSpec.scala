package graft

import org.apache.spark.sql.types._

/** Pins the ENGINE-FACING schema of every driver-generated testdata
  * table, as loaded through graft.Tables (the only sanctioned path).
  *
  * The driver regenerates /root/testdata between rounds and has
  * already changed physical encodings once (events.ts went from
  * TIMESTAMP(NANOS) to timestamp[us] after round 8, silently breaking
  * 35 queries at analysis time). This suite exists so the NEXT silent
  * regeneration fails ONE obvious test with a named message instead
  * of dozens of queries with analysis errors deep in query code.
  *
  * What is asserted is the loader's output contract — e.g. events.ts
  * MUST come out as LongType epoch-nanos no matter which physical
  * type the parquet carries — not the parquet physical types
  * themselves, which Tables.load is expected to adapt to.
  */
class FixtureContractSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.load(spark, sfDir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private def assertContract(table: String, expected: (String, DataType)*): Unit = {
    val actual = fields(table)
    expected.foreach { case (col, dt) =>
      assert(actual.contains(col),
        s"fixture contract broken: $table lost column '$col' " +
          s"(driver regenerated testdata?); has ${actual.keys.toSeq.sorted}")
      assert(actual(col) == dt,
        s"fixture contract broken: $table.$col loads as ${actual(col)}, " +
          s"engine expects $dt (driver regenerated testdata with a new " +
          "encoding? adapt Tables.load, as done for events.ts)")
    }
    assert(actual.size == expected.size,
      s"fixture contract broken: $table has columns ${actual.keys.toSeq.sorted}, " +
        s"engine expects ${expected.map(_._1).sorted}")
  }

  test("events loads with the long-nanos ts contract") {
    assertContract("events",
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    // ts must be epoch-NANOS, not micros/millis: Jan 2024 fixture
    // epochs are ~1.7e18 ns. A micros regression would read ~1.7e15.
    val ts = Tables.events(spark, sfDir)
      .selectExpr("min(ts) as lo", "max(ts) as hi").head()
    assert(ts.getLong(0) > 1_500_000_000_000_000_000L,
      s"events.ts magnitude ${ts.getLong(0)} is not epoch-nanos")
    assert(ts.getLong(1) < 2_500_000_000_000_000_000L,
      s"events.ts magnitude ${ts.getLong(1)} is not epoch-nanos")
  }

  test("relational tables load with the expected engine-facing types") {
    assertContract("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertContract("nation", "n_nationkey" -> IntegerType,
      "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertContract("customer", "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    assertContract("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertContract("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    assertContract("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // timestamp[us] with no tz annotation loads as NTZ; the whole
      // relational suite (192 green queries) is written against it
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    assertContract("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
  }

  test("document and embedding tables load with the expected types") {
    assertContract("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    assertContract("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  }

  test("a mutated events encoding fails loudly at load, naming the column") {
    import spark.implicits._
    val dir = tmpDir("mutated_fixture")
    // the one encoding class the loader cannot adapt: ts as a string
    Seq((1L, "2024-01-01T00:00:00", 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.load(spark, dir, "events") }
    assert(e.getMessage.contains("events.ts"),
      s"mutation failure message does not name the column: ${e.getMessage}")
  }

  test("NTZ and UTC-instant encodings of the same wall clock load to the same nanos") {
    import spark.implicits._
    val micros = Seq(1706000000000000L, 1706000000123456L)
    val base = micros.toDF("us")
    val ntzDir = tmpDir("events_ntz")
    val tzDir = tmpDir("events_tz")
    base.selectExpr("us as event_id",
        "cast(timestamp_micros(us) as timestamp_ntz) as ts")
      .write.parquet(s"$ntzDir/events.parquet")
    base.selectExpr("us as event_id", "timestamp_micros(us) as ts")
      .write.parquet(s"$tzDir/events.parquet")
    def loaded(d: String): Seq[(Long, Long)] =
      Tables.load(spark, d, "events").selectExpr("event_id", "ts")
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val ntz = loaded(ntzDir)
    val tz = loaded(tzDir)
    assert(ntz == tz, s"encodings disagree: $ntz vs $tz")
    assert(ntz.map(_._2) == micros.map(_ * 1000L).sorted,
      s"nanos contract broken: ${ntz.map(_._2)}")
  }
}
