package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism guards for expensive per-row stages.
  *
  * The problem (optimization guide §2.5 "input skew"): a parquet
  * table written as one file with one row group arrives as ONE scan
  * partition no matter how many cores the session has — parquet
  * cannot split inside a row group — so a signature/tokenize/decode
  * stage planned directly over the scan runs on a single core while
  * the rest of the cluster idles. Every sf-directory table in this
  * harness has that shape (single file, single row group), and at
  * 100 TB the same shape appears whenever an upstream writer emits
  * few-but-huge row groups or unsplittable codecs.
  *
  * [[spread]] lifts such a scan to the session's default parallelism
  * with one tiny exchange of the projected input rows BEFORE the
  * expensive compute, and is a NO-OP whenever the input already
  * carries at least `defaultParallelism` partitions — a healthy
  * cluster scan (thousands of splits) never pays the extra shuffle.
  * The exchange is hash-keyed (caller supplies the row key) rather
  * than round-robin: deterministic under task retry (SPARK-38388)
  * and no sort-before-repartition cost.
  *
  * [[materialize]] is the companion cache discipline: an eagerly
  * computed cache boundary. AQE submits independent downstream
  * stages CONCURRENTLY; if each of them is first to touch a lazily
  * cached subtree, every one of them computes the full subtree
  * before any cache block lands (measured: q47's shingle cache built
  * 6x concurrently, 2.3 s each, before round 19). One explicit pass
  * materializes the cache once; the fan-out then reads memory.
  */
object Par {

  /** Repartition `df` by `key` to the session's default parallelism
    * iff its current physical partitioning is narrower. Use directly
    * before expensive per-row compute over a possibly-narrow scan;
    * project to the needed columns first so the exchange moves only
    * those bytes (guide §2.3).
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }

  /** Force a cached DataFrame's materialization NOW, so concurrent
    * AQE stages downstream read the cache instead of racing to each
    * compute the uncached subtree. Returns `df` for chaining.
    */
  def materialize(df: DataFrame): DataFrame = { df.count(); df }
}
