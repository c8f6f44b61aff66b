package graft

import org.apache.spark.sql.functions._
import graft.expressions.{HilbertFunctions, HilbertIndex2D}

class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  test("xy2d is a bijection onto [0, 4^bits) for the full 6-bit grid") {
    val bits = 6
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex2D.xy2d(bits, x.toLong, y.toLong)
    assert(ds.distinct.size === n * n)
    assert(ds.min === 0L && ds.max === (n.toLong * n - 1))
  }

  test("consecutive indices are grid neighbors — the property Z-order lacks") {
    val bits = 6
    val n = 1 << bits
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex2D.xy2d(bits, x.toLong, y.toLong) -> (x, y)).toMap
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"d=$d: ($x1,$y1) -> ($x2,$y2) is not a unit step")
    }
  }

  test("codegen'd column matches the interpreted walk") {
    val df = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val got = df.select(col("x"), col("y"),
        HilbertFunctions.hilbert2d(col("x"), col("y"), 6).as("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h === HilbertIndex2D.xy2d(6, x, y), s"($x,$y)")
    }
  }
}
