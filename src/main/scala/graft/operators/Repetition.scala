package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{QualityFunctions => Q, TextFunctions => T}

/** Repetition profiling — the Gopher-style (Rae et al., "Scaling
  * Language Models", §A1.1) duplicated-n-gram filters that catch
  * boilerplate- and loop-generated text exact dedup misses.
  *
  * Per-row work is an n-gram explode + two per-(doc, gram)
  * aggregations; both group on doc-prefixed keys, so partial
  * aggregation combines map-side and the shuffle carries per-doc
  * gram counts, never the corpus. Thresholds are fixed so keep/drop
  * is reproducible across engines.
  */
object Repetition {

  /** Raw (non-distinct) n-grams of a materialized token-array column.
    * Documents shorter than n map to an EMPTY array, which explode
    * drops — the r19 replacement for a size filter that Catalyst
    * would push below the spread exchange (re-tokenizing single-task
    * on the narrow scan; see Par scaladoc).
    */
  private def gramsOf(ws: org.apache.spark.sql.Column, n: Int) =
    explode(when(size(ws) >= n,
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>")))

  /** Per-document repetition profile:
    *  - top_bigram_frac: occurrences of the most frequent bigram over
    *    all bigram occurrences;
    *  - dup_trigram_frac: fraction of trigram occurrences whose
    *    trigram appears more than once;
    *  - keep: both under the (Gopher-flavored) thresholds.
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
      maxTopBigram: Double = 0.2, maxDupTrigram: Double = 0.3): DataFrame = {
    // spread + cache + materialize (r19, Par scaladoc): ONE tokenize
    // pass shared by the bigram and trigram passes (it ran twice, on
    // a single-split scan each time)
    val tokd = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), T.tokens(col("txt")).as("ws"))
        .cache())
    val c2 = tokd
      .select(col("doc_id"), gramsOf(col("ws"), 2).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val top2 = c2.groupBy(col("doc_id"))
      .agg(Q.floor4(max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_bigram_frac"))
    val c3 = tokd
      .select(col("doc_id"), gramsOf(col("ws"), 3).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val dup3 = c3.groupBy(col("doc_id"))
      .agg(Q.floor4(
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") /
          sum(col("c")).cast("double")).as("dup_trigram_frac"))
    top2.join(dup3, Seq("doc_id"))
      .withColumn("keep",
        col("top_bigram_frac") <= maxTopBigram &&
          col("dup_trigram_frac") <= maxDupTrigram)
  }
}
