package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Par}

/** Round-19 optimization spec: the input-parallelism guards.
  *
  * spread() must lift a narrow input to the session's default
  * parallelism and must NOT touch an input that is already wide —
  * the no-op leg is what makes the guard safe at cluster scale.
  * The guard-above-cache discipline and the explode-drops-empties
  * rewrite must preserve operator semantics exactly (empty docs
  * contribute nothing, before and after).
  */
class ParSpec extends SparkTestBase {
  import spark.implicits._

  test("spread lifts a 1-partition input to default parallelism") {
    val one = spark.range(100).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val s = Par.spread(one, col("id"))
    assert(s.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // same rows, exactly once
    assert(s.agg(count(lit(1)), sum(col("id"))).as[(Long, Long)].head() ===
      ((100L, 4950L)))
  }

  test("spread is a no-op on an input at/above default parallelism") {
    val wide = spark.range(100).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism + 2, col("id"))
    val s = Par.spread(wide, col("id"))
    // untouched: the frame keeps its (wider) partitioning
    assert(s.rdd.getNumPartitions === wide.rdd.getNumPartitions)
  }

  test("materialize returns the frame and forces the cache") {
    val df = spark.range(10).toDF("id").cache()
    assert(Par.materialize(df) eq df)
    assert(df.storageLevel.useMemory)
    df.unpersist()
  }

  test("winnowed fingerprints: docs below the gram width contribute nothing") {
    // 2-word doc has no 3-gram; before r19 a filter dropped it, now the
    // empty window array explodes to no rows — same contract
    val docs = Seq((1L, "too short"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(docs, "doc_id", "text")
    assert(fps.filter(col("doc_id") === 1L).count() === 0)
    assert(fps.filter(col("doc_id") === 2L).count() > 0)
    assert(!fps.schema("fp").nullable || fps.filter(col("fp").isNull).count() === 0)
  }

  test("duplicate spans: gramless docs contribute nothing") {
    val docs = Seq((1L, "short"), (2L, ("w " * 20).trim), (3L, ("w " * 20).trim))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
    assert(spans.filter(col("doc_id") === 1L).count() === 0)
    assert(spans.count() === 2) // the two identical long docs share grams
  }
}
