package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto front) operator — Börzsönyi, Kossmann & Stocker,
  * "The Skyline Operator" (ICDE 2001): the rows no other row
  * dominates, dominance being better-or-equal on every dimension and
  * strictly better on at least one. The multi-objective "best
  * tradeoff" query (cheapest-vs-biggest, fastest-vs-smallest) that
  * flat ORDER BY cannot express.
  *
  * Scale shape: the textbook formulation is a quadratic NOT EXISTS
  * self-join — the DuckDB oracle runs exactly that, and it is
  * precisely the plan that dies at 100x. Here the 2-D structure
  * collapses the work instead: bucket the minimized dimension into
  * fixed-width bands, take max(gain) per band (one hash aggregate),
  * and prefix-max those band maxima. Any row whose gain fails to
  * exceed the prefix max of strictly-cheaper bands is dominated by
  * SOME row over there (strictly lower cost, >= gain) and exits
  * without ever being joined. Survivors — the staircase frontier plus
  * near-frontier rows of each band — resolve residual dominance in a
  * band-local equi-join, quadratic only within a band's survivor set
  * (bucketWidth is the knob). Driver traffic is one (band, max) pair
  * per band — bounded by the cost domain over bucketWidth, the q90
  * prefix-offset discipline. No global sort, no Window, no theta join
  * against the full table.
  */
object Skyline {

  /** 2-D skyline: rows not dominated on (minimize `costCol`,
    * maximize `gainCol`). Both columns must be integral (exact
    * dominance — callers convert money to cents first, the repo-wide
    * integer-units discipline). Duplicate (cost, gain) points tie:
    * neither dominates, both surface. Costs are assumed >= 0 (`div`
    * bucketing floors toward zero).
    */
  def skyline2D(df: DataFrame, idCol: String, costCol: String,
      gainCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(idCol).as("id"),
      col(costCol).cast("long").as("cost"),
      col(gainCol).cast("long").as("gain"))
      .withColumn("b", expr(s"cost div $bucketWidth"))
    // band maxima: one hash aggregate; the collect is (#bands) rows
    val bmax = pts.groupBy(col("b")).agg(max(col("gain")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // pm(b) = max gain over strictly cheaper bands (MinValue if none):
    // gain <= pm(b) means a strictly-cheaper >= gain row exists
    val pm = bmax.scanLeft((Long.MinValue, Long.MinValue)) {
      case ((_, run), (b, mx)) => (b, math.max(run, mx))
    }
    val pmByBand = bmax.map(_._1).zip(pm.map(_._2).dropRight(1)).toSeq
    val pmDf = pmByBand.toDF("b", "pm")
    val survivors = pts.join(broadcast(pmDf), "b")
      .filter(col("gain") > col("pm"))
      .select(col("id"), col("cost"), col("gain"), col("b"))
    // residual dominance is band-local: a surviving dominator in a
    // cheaper band is impossible (its gain would be in the prefix max)
    val rivals = survivors.select(col("b").as("rb"), col("cost").as("rcost"),
      col("gain").as("rgain"))
    survivors.join(rivals,
        col("b") === col("rb") &&
          col("rcost") <= col("cost") && col("rgain") >= col("gain") &&
          (col("rcost") < col("cost") || col("rgain") > col("gain")),
        "left_anti")
      .select(col("id"), col("cost"), col("gain"))
  }
}
