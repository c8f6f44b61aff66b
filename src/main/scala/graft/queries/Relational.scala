package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational parity queries — each maps an operator family from
  * SURVEY.md §2 (reference: /root/reference, SynBioExplorer/
  * agf-data-ingestion) onto the driver testdata tables.
  *
  * All float aggregates are rounded to a fixed scale so the Spark
  * result and the DuckDB oracle agree bit-for-bit despite different
  * summation orders.
  */
object Relational extends QueryRegistry {

  /** A1/A5-style aggregation (SURVEY §2.5): grouped sums/averages over
    * the fact table — the classic pricing-summary shape. Exercises
    * partial (map-side) aggregation + single shuffle on the group key.
    */
  val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)       AS sum_qty,
             round(sum(l_extendedprice), 2)  AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 4)       AS avg_qty,
             round(avg(l_extendedprice), 4)  AS avg_price,
             round(avg(l_discount), 4)       AS avg_disc,
             count(*)                        AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  def all: Seq[GraftQuery] = Seq(q01)
}
