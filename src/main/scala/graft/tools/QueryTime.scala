package graft.tools

import graft.{GraftSession, SparkEntry}

/** Median-of-N timer for a NAMED SUBSET of the declared queries —
  * the focused companion to graft.Bench (which always runs the full
  * suite). For comparing two physical plans of the same semantics
  * (e.g. q23 vs q75) without paying for 70+ queries.
  *
  * Usage: sbt "runMain graft.tools.QueryTime <sfDir> <iters> <query>..."
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    spark.range(1000).selectExpr("sum(id)").collect()
    val timings = names.map { n =>
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> ts
    }
    spark.stop()
    timings.foreach { case (n, ts) =>
      println(f"$n%-35s median ${ts((ts.size - 1) / 2)}%7.2f s  " +
        f"spread ${ts.max - ts.min}%5.2f  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
  }
}
