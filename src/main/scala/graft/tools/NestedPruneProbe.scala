package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Measures the scan-bytes delta NestedRenamePushdown buys on a
  * `SELECT sum(meta.bytes)`-shaped query over a nested-RENAMED table
  * with a fat sibling field — the round-18 verdict asked for the
  * number, not the argument. Run:
  *   sbt "runMain graft.tools.NestedPruneProbe"
  * Prints bytes read and wall time with the rule active vs excluded
  * (spark.sql.optimizer.excludedRules), same data, same session.
  */
object NestedPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("nested-prune-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.root", "/tmp/graft-prune-probe")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    spark.sql("DROP TABLE IF EXISTS graft.prune_probe")
    spark.sql("""CREATE TABLE graft.prune_probe (
      k BIGINT, meta STRUCT<pad: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.prune_probe
      SELECT id, named_struct('pad', repeat(uuid(), 16), 'sz', id % 1000)
      FROM range(400000)""")
    spark.sql("ALTER TABLE graft.prune_probe RENAME COLUMN meta.sz TO bytes")

    def run(tag: String, excluded: Option[String]): Unit = {
      excluded match {
        case Some(r) => spark.conf.set("spark.sql.optimizer.excludedRules", r)
        case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
      // warm the file index once, then measure 3 passes
      val warm = spark.sql("SELECT sum(meta.bytes) FROM graft.prune_probe")
      warm.collect()
      warm.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema"))
        .foreach(l => println(s"$tag ${l.trim.takeRight(120)}"))
      val times = (1 to 3).map { _ =>
        bytesRead.set(0)
        val t0 = System.nanoTime()
        val r = spark.sql("SELECT sum(meta.bytes) FROM graft.prune_probe")
          .collect().head.getLong(0)
        val ms = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300) // let straggler task-end events drain
        println(f"$tag%s pass: sum=$r%d bytes_read=${bytesRead.get()}%d wall=$ms%.0f ms")
        (bytesRead.get(), ms)
      }
      val medB = times.map(_._1).sorted.apply(1)
      val medT = times.map(_._2).sorted.apply(1)
      println(f"$tag%s MEDIAN: bytes_read=$medB%d wall=$medT%.0f ms")
    }
    run("rule_on", None)
    run("rule_off", Some("graft.plans.NestedRenamePushdown"))
    run("rule_on_again", None)
    spark.stop()
  }
}
