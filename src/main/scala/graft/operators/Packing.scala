package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget packs. Streaming-friendly formulation: pack id
  * = floor(exclusive-running-token-sum / budget) in a deterministic
  * document order — documents can straddle a boundary (the consumer
  * splits), which is what keeps the assignment a pure window
  * function: one shuffle on the ordering key, no sequential driver
  * loop, scales to any corpus size. Greedy no-straddle packing is
  * inherently sequential; at 100 TB this form (or per-partition
  * greedy via mapPartitions) is what you can actually run.
  */
object Packing {

  /** Assign each doc a pack_id by cumulative token count (exclusive
    * prefix sum) within a deterministic global order.
    */
  def packByBudget(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(tokenCol))
      .withColumn("tokens_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("tokens_before") / budget))
  }

  /** Distributed form of packByBudget: a classic two-phase prefix
    * sum. Range-partition by the ordering key, per-partition local
    * running sums (sequential inside a partition — the one place
    * mapPartitions is the right tool), then add broadcast partition
    * offsets. Identical output to the window form (asserted in
    * PackingSpec) with no single-reducer global window.
    */
  def packByBudgetDistributed(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sorted = docs
      .select(col(idCol).cast("long").as("id"), col(tokenCol).cast("long").as("t"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
    val rdd = sorted.rdd
    rdd.cache()
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.map(_._2).sum)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(totals.scanLeft(0L)(_ + _))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { case (id, t) =>
        val before = acc
        acc += t
        (id, t, before, before / budget)
      }
    }.toDF(idCol, tokenCol, "tokens_before", "pack_id")
    // materialize into a Dataset-level cache (clearable via
    // spark.catalog.clearCache) and drop the RDD pin
    val result = out.cache()
    result.count()
    rdd.unpersist(false)
    result
  }

  /** Per-pack stats: docs, tokens, budget utilization. */
  def packStats(packed: DataFrame, tokenCol: String, budget: Long): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        floor(sum(col(tokenCol)) * lit(10000L) / budget).as("util_bp"))
}
