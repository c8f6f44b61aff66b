package graft

import org.apache.spark.sql.functions._
import graft.operators.AntiEntropy

class AntiEntropySpec extends SparkTestBase {
  import spark.implicits._

  private def table(rows: Seq[(Long, String)]) = rows.toDF("k", "payload")
  private val dig = concat_ws("|", col("k"), col("payload"))

  test("identical replicas reconcile to zero differing buckets") {
    val t = table((0L until 200L).map(i => (i, s"p$i")))
    assert(AntiEntropy.reconcile(t, t, "k", dig, dig, 16).count() === 0)
  }

  test("a changed row, a deleted row, and an added row each surface in their bucket") {
    val left = table((0L until 100L).map(i => (i, s"p$i")))
    val right = table(
      (0L until 100L).filter(_ != 7L).map(i =>
        (i, if (i == 3L) "CHANGED" else s"p$i")) :+ (100L, "NEW"))
    val got = AntiEntropy.reconcile(left, right, "k", dig, dig, 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // k=3 changed -> bucket 3: 10 rows each side, one only-left + one only-right
    assert(got(3L) === ((10L, 10L, 1L, 1L)))
    // k=7 deleted -> bucket 7: right short one row
    assert(got(7L) === ((10L, 9L, 1L, 0L)))
    // k=100 added -> bucket 0: right long one row
    assert(got(0L) === ((10L, 11L, 0L, 1L)))
    assert(got.size === 3, s"unexpected buckets: ${got.keys}")
  }

  test("bucket summaries are order-independent") {
    val a = table(Seq((1L, "x"), (2L, "y"), (3L, "z")))
    val b = table(Seq((3L, "z"), (1L, "x"), (2L, "y"))).repartition(3)
    val sa = AntiEntropy.bucketDigests(a, "k", dig, 4).collect().toSet
    val sb = AntiEntropy.bucketDigests(b, "k", dig, 4).collect().toSet
    assert(sa === sb)
  }
}
