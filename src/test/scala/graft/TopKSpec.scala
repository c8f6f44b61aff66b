package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** The bounded-heap top-k aggregate must return exactly the rows the
  * window row_number formulation keeps, including tie handling, and
  * must survive partial/merge (shuffle) paths and serialization.
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("top-3 lineitems per supplier equals the window formulation") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("rowid",
        col("l_orderkey") * 100 + col("l_linenumber").cast("long"))
      // force many partitions so partial buffers + merge run
      .repartition(16)
    val topk = TopK.perGroup(li, Seq("l_suppkey"), "l_extendedprice", "rowid",
      Seq("l_partkey"), k = 3)
      .select(col("l_suppkey"), col("l_extendedprice"), col("rowid"), col("l_partkey"))
      .as[(Long, Double, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(desc("l_extendedprice"), asc("rowid"))
    val win = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_extendedprice").cast("double"),
        col("rowid"), col("l_partkey"))
      .as[(Long, Double, Long, Long)].collect().toSet
    assert(topk === win)
    assert(topk.nonEmpty)
  }

  test("ties broken by lowest id, exact k kept") {
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 12L), (1L, 4.0, 13L),
      (2L, 1.0, 20L))
      .toDF("g", "score", "id")
      .repartition(4)
    val got = TopK.perGroup(df, Seq("g"), "score", "id", Nil, k = 2)
      .select("g", "score", "id").as[(Long, Double, Long)].collect().toSet
    assert(got === Set((1L, 5.0, 10L), (1L, 5.0, 11L), (2L, 1.0, 20L)))
  }
}
