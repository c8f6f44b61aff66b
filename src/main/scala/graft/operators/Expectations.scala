package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (dbt-test style): each rule
  * reduces to a violation count, so a suite over any table is ONE
  * aggregation pass — no per-rule scans. Referential checks add one
  * anti-join each (the only shape that can't fold into the scan).
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must never be null. */
  case class NotNull(column: String) extends Rule {
    def name = s"not_null:$column"
  }
  /** Boolean predicate must hold on every row. */
  case class Check(name: String, predicate: Column) extends Rule
  /** Column combination must be unique. */
  case class Unique(columns: Seq[String]) extends Rule {
    def name = s"unique:${columns.mkString(",")}"
  }
  /** Every non-null value of `column` must exist in `refColumn` of
    * `ref` (foreign-key expectation).
    */
  case class InReference(column: String, ref: DataFrame, refColumn: String)
      extends Rule {
    def name = s"in_reference:$column"
  }

  /** Violation count per rule. Scalar rules (NotNull/Check) share one
    * aggregation over one scan; each Unique is a two-phase key count;
    * each InReference is a left-anti join against the (deduplicated,
    * typically broadcastable) reference keys. Output:
    * (rule, n_violations, passed).
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scalarRules = rules.collect {
      case r: NotNull => r.name -> col(r.column).isNull
      case r: Check => r.name -> !coalesce(r.predicate, lit(false))
    }
    val scalar =
      if (scalarRules.isEmpty) Seq.empty[DataFrame]
      // coalesce: sum over an EMPTY input is NULL, which would make an
      // empty, violation-free table report passed = NULL instead of true
      else Seq(df.select(scalarRules.zipWithIndex.map { case ((_, viol), i) =>
        coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).as(s"r$i")
      }: _*).selectExpr(
        s"stack(${scalarRules.size}, " +
          scalarRules.zipWithIndex.map { case ((n, _), i) =>
            s"'${n.replace("'", "''")}', r$i"
          }.mkString(", ") +
          ") as (rule, n_violations)"))
    val uniques = rules.collect { case r: Unique =>
      df.groupBy(r.columns.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    val refs = rules.collect { case r: InReference =>
      df.filter(col(r.column).isNotNull)
        .join(r.ref.select(col(r.refColumn).as(r.column)).distinct(),
          Seq(r.column), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    val parts = scalar ++ uniques ++ refs
    val united =
      if (parts.isEmpty)
        spark.emptyDataset[(String, Long)].toDF("rule", "n_violations")
      else parts.reduce(_ unionByName _)
    united.withColumn("passed", col("n_violations") === 0L)
  }
}
