package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory: one entry per
  * implemented operator family from SURVEY.md §2 plus the
  * beyond-reference extensions (dedup / similarity / text analysis /
  * multimodal). `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible entry.
  */
object SparkEntry {

  private def registries: Seq[QueryRegistry] =
    Seq(Relational, IngestParity, DedupQueries, SimilarityQueries,
      TextAnalysis, StreamingQueries, SourceQueries, ScaleQueries,
      AnalyticsQueries, MiningQueries)

  private lazy val allQueries: Seq[GraftQuery] = registries.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
