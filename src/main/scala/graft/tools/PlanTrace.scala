package graft.tools

import org.apache.spark.sql.execution.ExplainMode
import scala.collection.mutable

/** Execution-plan tracer: runs named queries and prints the FORMATTED
  * plan of every Dataset action executed along the way — including
  * the per-round plans of iterative operators (PageRank / k-core /
  * connected components), which the final `explain` cannot show
  * because eager `localCheckpoint` truncates lineage to a Scan
  * ExistingRDD stub (the r19 advice gap: before-plans of checkpointed
  * queries documented nothing).
  *
  * Plans are captured post-execution, so AQE's final shape (coalesced
  * reads, runtime join strategy) is what prints, deduplicated by plan
  * text so a 5-round loop with identical round shapes prints once
  * with a multiplicity note.
  *
  * Usage: sbt "runMain graft.tools.PlanTrace <sfDir> <query>..."
  */
object PlanTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val plans = mutable.LinkedHashMap[String, (String, Int)]()
    val printable = mutable.LinkedHashMap[String, String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.synchronized {
        val txt = qe.explainString(ExplainMode.fromString("formatted"))
        val key = txt.replaceAll("#\\d+", "#x") // expr ids vary per round
        plans.get(key) match {
          case Some((_, n)) => plans(key) = (funcName, n + 1)
          case None => plans(key) = (funcName, 1)
        }
        // stash the printable text under the normalized key
        printable.getOrElseUpdate(key, txt)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    try names.foreach { n =>
      plans.synchronized(plans.clear()); printable.clear()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      Thread.sleep(500) // listener bus drain
      println(s"\n===== $n =====")
      plans.synchronized {
        plans.foreach { case (key, (fn, count)) =>
          println(s"\n----- action=$fn x$count -----")
          println(printable(key))
        }
      }
    } finally spark.stop()
  }
}
