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

  /** Raw (non-distinct) n-grams of the whitespace tokens. */
  private def grams(textCol: String, n: Int) = {
    val words = T.tokens(col(textCol))
    explode(transform(
      sequence(lit(1), size(words) - (n - 1)),
      i => array_join(slice(words, i, lit(n)), " ")))
  }

  /** Per-document repetition profile:
    *  - top_bigram_frac: occurrences of the most frequent bigram over
    *    all bigram occurrences;
    *  - dup_trigram_frac: fraction of trigram occurrences whose
    *    trigram appears more than once;
    *  - keep: both under the (Gopher-flavored) thresholds.
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
      maxTopBigram: Double = 0.2, maxDupTrigram: Double = 0.3): DataFrame = {
    val words = T.tokens(col(textCol))
    val c2 = docs.filter(size(words) >= 2)
      .select(col(idCol).as("doc_id"), grams(textCol, 2).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val top2 = c2.groupBy(col("doc_id"))
      .agg(Q.floor4(max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_bigram_frac"))
    val c3 = docs.filter(size(words) >= 3)
      .select(col(idCol).as("doc_id"), grams(textCol, 3).as("g"))
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
