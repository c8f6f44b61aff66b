package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.VersionedTable

/** Zero-rewrite TYPE WIDENING (round 12, the migration beyond
  * add-a-column): int batches read back as long next to long batches,
  * float as double, decimals grow — no data movement, the parquet
  * reader promotes on scan. Plus the refusal matrix: lossy or
  * meaning-changing pairs fail loudly, never silently degrade.
  */
class VersionedWideningSpec extends SparkTestBase {
  import spark.implicits._

  test("int->long widening across batches, with add-column and tombstones composed") {
    val path = tmpDir("vt_widen_il")
    // epoch 1: k is INT, no 'w' column yet
    VersionedTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    // migration: k becomes LONG, 'w' arrives
    VersionedTable.append(Seq((3000000000L, "c", 7.5)).toDF("k", "v", "w"),
      path)
    val df = VersionedTable.readAtWidened(spark, path, 2)
    assert(df.schema("k").dataType === LongType)
    assert(df.schema("w").dataType === DoubleType)
    assert(df.select($"k", $"v", $"w").as[(Long, String, Option[Double])]
      .collect().sortBy(_._1)
      === Array((1L, "a", None), (2L, "b", None),
        (3000000000L, "c", Some(7.5))),
      "old batches must read with the widened type and null-filled adds")
    // merge-on-read still applies position-scoped on the widened view
    VersionedTable.deleteKeys(Seq(2L).toDF("k"), "k", path)
    assert(VersionedTable.readAtWidened(spark, path, 3)
      .select($"k").as[Long].collect().sorted === Array(1L, 3000000000L))
  }

  test("float->double and decimal growth widen; aggregates are exact") {
    val path = tmpDir("vt_widen_fd")
    VersionedTable.append(
      Seq(1.5f, 2.5f).toDF("x")
        .withColumn("d", expr("CAST(1.25 AS DECIMAL(5,2))")), path)
    VersionedTable.append(
      Seq(3.25).toDF("x")
        .withColumn("d", expr("CAST(123456.7890 AS DECIMAL(20,4))")), path)
    val df = VersionedTable.readAtWidened(spark, path, 2)
    assert(df.schema("x").dataType === DoubleType)
    assert(df.schema("d").dataType === DecimalType(20, 4))
    assert(df.agg(sum($"x")).head.getDouble(0) === 7.25)
    assert(df.agg(sum($"d")).head.getDecimal(0)
      === new java.math.BigDecimal("123459.2890"))
  }

  test("refusal matrix: lossy and meaning-changing pairs fail loudly") {
    // long vs double: lossy both ways
    val p1 = tmpDir("vt_widen_ld")
    VersionedTable.append(Seq(1L).toDF("x"), p1)
    VersionedTable.append(Seq(2.5).toDF("x"), p1)
    val e1 = intercept[IllegalStateException] {
      VersionedTable.readAtWidened(spark, p1, 2)
    }
    assert(e1.getMessage.contains("lossless"))
    // string vs int: the column changed meaning
    val p2 = tmpDir("vt_widen_si")
    VersionedTable.append(Seq(1).toDF("x"), p2)
    VersionedTable.append(Seq("one").toDF("x"), p2)
    intercept[IllegalStateException] {
      VersionedTable.readAtWidened(spark, p2, 2)
    }
    // decimal growth past MAX_PRECISION refuses
    val p3 = tmpDir("vt_widen_dp")
    VersionedTable.append(
      Seq(1).toDF("i").select(expr("CAST(1 AS DECIMAL(38,0))").as("x")), p3)
    VersionedTable.append(
      Seq(1).toDF("i").select(expr("CAST(0.5 AS DECIMAL(2,1))").as("x")), p3)
    val e3 = intercept[IllegalStateException] {
      VersionedTable.readAtWidened(spark, p3, 2)
    }
    assert(e3.getMessage.contains("precision"))
    // and plain mergeSchema on an int/long mix fails in SPARK (the
    // gap readAtWidened exists to close) — the engine adds, not
    // duplicates, Spark's contract
    intercept[Exception] {
      VersionedTable.readAt(spark, p1, 2, mergeSchema = true).collect()
    }
  }
}
