package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance audits for releasable tables.
  *
  * k-anonymity (Sweeney 2002): a released row is re-identifiable when
  * its quasi-identifier combination is shared by fewer than k rows —
  * the audit every release pipeline runs before shipping a dataset
  * containing indirect identifiers. This measures; it does not
  * suppress/generalize (the remediation is a policy choice the audit
  * informs).
  *
  * Scale shape: one hash aggregate over the quasi-identifier tuple
  * (the equivalence classes), then a bounded per-report-group
  * rollup — class cardinality is data-bounded, and nothing ever
  * sorts or collects rows.
  */
object Privacy {

  /** Per report group: class count, classes below k, rows at risk,
    * and the at-risk fraction in exact basis points.
    */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], reportBy: Column,
      k: Long): DataFrame = {
    val cls = df.groupBy((reportBy.as("grp") +: qi): _*)
      .agg(count(lit(1)).as("n"))
    cls.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"))
      .withColumn("risk_bp", expr("rows_at_risk * 10000L div n_rows"))
      .select(col("grp"), col("n_classes"), col("n_small_classes"),
        col("n_rows"), col("rows_at_risk"), col("risk_bp"))
  }
}
