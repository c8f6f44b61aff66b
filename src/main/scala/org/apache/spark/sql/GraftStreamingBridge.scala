package org.apache.spark.sql

/** The one Spark-internal bridge this engine compiles against — kept
  * to a single six-line method in its own file so the boundary is
  * auditable.
  *
  * WHY IT EXISTS: a DataSource-V1 streaming `Source.getBatch` must
  * return a DataFrame whose plan is tagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructor for
  * such a frame — `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — is `private[sql]`. Spark's own V1 file
  * source (`FileStreamSource.getBatch`) builds its micro-batch frames
  * through exactly this call; third-party V1 connectors reach it the
  * same way this file does, from a compilation unit inside the
  * `org.apache.spark.sql` package. The alternative — a DataSource-V2
  * `MicroBatchStream` — would require hand-rolling a row-based
  * parquet `PartitionReader`, forfeiting the vectorized reader and
  * whole-stage codegen for every micro-batch; wrapping the planned
  * batch query's `toRdd` keeps the entire scan on Spark's native
  * parquet path and only re-tags the plan boundary.
  */
object GraftStreamingBridge {

  /** `df`'s physical plan as a streaming-tagged DataFrame: the lazy
    * `toRdd` of the fully-optimized batch query (vectorized parquet
    * scan, codegen intact) wrapped under a new streaming leaf.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** A logical plan as a DataFrame (`Dataset.ofRows`, also
    * `private[sql]`): what a `RunnableCommand` needs to execute the
    * child query of an intercepted INSERT/MERGE/DELETE — the parser
    * hands commands plans, not frames. Same seam, same rationale.
    */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The inverse retag for a V1 streaming `Sink.addBatch`: the
    * micro-batch arrives as a streaming-tagged plan that batch
    * writers refuse; wrapping its planned `toRdd` under a batch leaf
    * is how Spark's own and Delta's V1 sinks hand the data to their
    * committers. Execution stays the planned micro-batch — one pass,
    * codegen intact.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
