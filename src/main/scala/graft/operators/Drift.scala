package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two samples of one metric —
  * the audit that decides whether yesterday's data still looks like
  * today's before a model trains on it.
  *
  * The statistic is the exact two-sample Kolmogorov–Smirnov distance
  * D = max_v |F_a(v) − F_b(v)| computed entirely in integer
  * arithmetic: with cumulative counts i (sample A) and j (sample B)
  * at value v, |i/n − j/m| = |i·m − j·n| / (n·m), so the max over the
  * pooled value domain is a max over exact longs and the only
  * division is one integer `div` at the very end. No libm, no float
  * summation — the number is bit-identical on any engine and any
  * partitioning (valid while n·m·10^6 < 2^63, i.e. ~3·10^6 rows per
  * side; beyond that, stratify or pre-bucket values first).
  *
  * The cumulative counts use the repo's windowless prefix-sum shape
  * (Histogram.equiDepthDistributed / Packing): per-value conditional
  * counts from ONE hash aggregate, range-partitioned by value, local
  * running sums offset by broadcast per-partition totals
  * (2·numPartitions longs — the only driver traffic). No global
  * Window over the value domain, so the plan survives a value domain
  * with billions of distinct points.
  */
object Drift {

  /** Exact two-sample KS over `valueCol` (must be an integral
    * column — scale floats to exact units first). `inA` / `inB`
    * select the two samples; rows matching neither are ignored, rows
    * matching both count in both. Returns one row:
    * (n_a, n_b, d_max, ks_e6, at_value) where ks_e6 =
    * d_max·10^6 div (n_a·n_b) and at_value is the smallest value
    * achieving the max (deterministic tie-break).
    */
  def ksStatistic(df: DataFrame, valueCol: String, inA: Column, inB: Column,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism

    val perValue = df
      .select(col(valueCol).cast("long").as("v"),
        when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .filter(col("a") + col("b") > 0)
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))

    val sorted = perValue
      .repartitionByRange(parts, col("v").asc)
      .sortWithinPartitions(col("v").asc)
      .select(col("v"), col("ca"), col("cb")).as[(Long, Long, Long)]
    val rdd = sorted.rdd
    rdd.cache()
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var sa = 0L; var sb = 0L
      it.foreach { case (_, ca, cb) => sa += ca; sb += cb }
      Iterator((i, sa, sb))
    }.collect().sortBy(_._1)
    // partitions can be < `parts` (small input): index by actual ids
    val offA = new Array[Long](totals.length + 1)
    val offB = new Array[Long](totals.length + 1)
    totals.zipWithIndex.foreach { case ((_, sa, sb), k) =>
      offA(k + 1) = offA(k) + sa; offB(k + 1) = offB(k) + sb
    }
    val n = offA(totals.length)
    val m = offB(totals.length)
    // a KS statistic over an empty sample is undefined: without this
    // guard n*m = 0 reaches the ks_e6 integral division (an ANSI
    // divide-by-zero) and an all-empty input emits a row of nulls —
    // both fail far from the actual contract violation
    require(n > 0 && m > 0, {
      val side = if (n == 0 && m == 0) "both samples are"
        else if (n == 0) "sample A is" else "sample B is"
      s"ksStatistic requires two non-empty samples: $side empty (n_a=$n, n_b=$m)"
    })
    val bA = spark.sparkContext.broadcast(offA)
    val bB = spark.sparkContext.broadcast(offB)
    val diffs = rdd.mapPartitionsWithIndex { (i, it) =>
      var ca = bA.value(i); var cb = bB.value(i)
      it.map { case (v, a, b) =>
        ca += a; cb += b
        (v, math.abs(ca * m - cb * n))
      }
    }.toDF("v", "d")

    val dmax = diffs.agg(max(col("d")).as("dmax"))
    val out = diffs.join(broadcast(dmax), col("d") === col("dmax"))
      .agg(min(col("v")).as("at_value"))
      .crossJoin(broadcast(dmax))
      .select(lit(n).as("n_a"), lit(m).as("n_b"), col("dmax").as("d_max"),
        expr(s"dmax * 1000000L div (${n}L * ${m}L)").as("ks_e6"),
        col("at_value"))
    // one row — materialize locally so the RDD pin can drop
    val rows = out.collect().toSeq
    rdd.unpersist(false)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), out.schema)
  }
}
