package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Where does a query's wall time actually go? Runs named queries
  * once each and prints every Spark job's wall time, task count and
  * description, plus the gaps (driver-side planning / collect /
  * non-Spark work). The optimization guide's §1 "empirical" loop for
  * a harness with no live UI: the per-job table is the Stages tab,
  * the gap column is the driver thread dump.
  *
  * For streaming queries, also prints every micro-batch progress's
  * durationMs breakdown (addBatch / getBatch / queryPlanning /
  * walCommit / commitOffsets), which is where stateful-stream
  * overhead hides.
  *
  * Usage: sbt "runMain graft.tools.JobProfile <sfDir> <query>..."
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.range(1000).selectExpr("sum(id)").collect()

    case class J(id: Int, start: Long, end: Long, desc: String, tasks: Int)
    val jobs = mutable.ArrayBuffer[J]()
    val starts = mutable.Map[Int, (Long, String, Int)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts(js.jobId) = (js.time, desc, js.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc, nt) =>
          jobs.synchronized { jobs += J(je.jobId, t0, je.time, desc, nt) }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val progress = mutable.ArrayBuffer[String]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          progress.synchronized {
            progress += s"batch ${e.progress.batchId} rows=" +
              s"${e.progress.numInputRows} durationMs=${e.progress.durationMs}"
          }
      })

    for (n <- names) {
      jobs.synchronized(jobs.clear())
      progress.synchronized(progress.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(700) // let the listener bus drain
      val sorted = jobs.synchronized(jobs.sortBy(_.start).toVector)
      println(f"%n===== $n  wall=$wall%.2f s  jobs=${sorted.size} =====")
      var prevEnd = t0 / 1000000L
      sorted.foreach { j =>
        val gap = (j.start - prevEnd) / 1000.0
        if (gap > 0.05) println(f"      gap ${gap}%7.3f s")
        println(f"  job ${j.id}%4d ${(j.end - j.start) / 1000.0}%7.3f s" +
          f"  tasks=${j.tasks}%4d  ${j.desc.take(90)}")
        prevEnd = math.max(prevEnd, j.end)
      }
      val busy = sorted.map(j => j.end - j.start).sum / 1000.0
      println(f"  sum(job wall)=$busy%.2f s of $wall%.2f s wall " +
        f"(rest = driver planning/collect + listener slack)")
      progress.synchronized(progress.foreach(p => println(s"  stream $p")))
    }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => () }
    spark.stop()
  }
}
