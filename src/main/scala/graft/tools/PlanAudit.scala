package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Plan auditor: prints formatted physical plans for the named
  * queries (or a default perf-critical set) so scan pruning, pushed
  * filters, join strategies, and codegen spans can be reviewed.
  * Findings are recorded in PLANS.md.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir] [query...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q01_pricing_summary", "q02_scan_project_filter",
      "q03_top_revenue_orders", "q04_customers_without_recent_orders",
      "q22_dedup_minhash_lsh", "q25_ann_brute_force_topk")
    // the engine's real session (extensions, graft catalog, nanos
    // reads): catalog/DDL and vector queries fail to CONSTRUCT under a
    // bare session, and a plan audited under foreign configs is not
    // the plan the bench runs
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { n =>
      println(s"\n===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    } finally spark.stop()
  }
}
