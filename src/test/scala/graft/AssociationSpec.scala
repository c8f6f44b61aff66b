package graft

import org.apache.spark.sql.functions._
import graft.operators.Association

class AssociationSpec extends SparkTestBase {
  import spark.implicits._

  private val baskets = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 20L),
    (3L, 20L), // duplicate line in one basket counts once
    (4L, 30L))
    .toDF("order_id", "part_id")

  test("pair support counts distinct baskets, pairs strictly increasing") {
    val pairs = Association.frequentPairs(baskets, "order_id", "part_id", 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("lift compares support to the independence expectation") {
    val out = Association.frequentPairsWithLift(
      baskets, "order_id", "part_id", 3L)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // (10, 20): support 3, nf(10)=3, nf(20)=3, total baskets 4
    // lift = 3 * 4 / (3 * 3) = 1.3333 -> floor4
    assert(out === Seq((10L, 20L, 3L, 1.3333)))
  }

  test("the maxBasket contract drops degenerate baskets and reports them") {
    val wide = (1L to 50L).map(i => (99L, i)) ++ Seq((1L, 1L), (1L, 2L))
    val df = wide.toDF("order_id", "part_id")
    val pairs = Association.frequentPairs(df, "order_id", "part_id", 1L,
      maxBasket = 10)
    assert(pairs.as[(Long, Long, Long)].collect().toSet ===
      Set((1L, 2L, 1L)))
  }
}
