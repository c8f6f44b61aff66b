package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{QualityFunctions => Q, TextFunctions => T}

/** Corpus curation: the composed keep/drop gate a training-data
  * pipeline runs before dedup — length bounds, stopword/diversity
  * thresholds, language allow-list. One pass, pure expressions; rows
  * carry the FIRST failing reason (evaluation order is the
  * documented filter order) so drop statistics are attributable.
  */
object Curation {

  final case class Thresholds(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      maxStopwordRatio: Double = 0.5,
      minUniqueRatio: Double = 0.2,
      allowedLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh"))

  /** Annotate each document with drop_reason (null = keep). The token
    * array is materialized as its own column so the gates reference a
    * cheap attribute — CaseWhen branches get no cross-branch CSE, and
    * CollapseProject keeps multiply-referenced non-cheap aliases
    * staged (SPARK-36718), so split() runs once per row, not per
    * gate. A null language is NOT allowed (coalesce: isin(null) is
    * NULL and a bare when(NULL) would silently keep the row).
    */
  def annotate(docs: DataFrame, textCol: String, langCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val words = col("__words")
    val n = size(words)
    docs
      .withColumn("__words", T.tokens(col(textCol)))
      .withColumn("drop_reason",
        when(n < t.minTokens, "too_short")
          .when(n > t.maxTokens, "too_long")
          .when(Q.stopwordRatio(words) > t.maxStopwordRatio, "stopword_heavy")
          .when(Q.uniqueRatio(words) < t.minUniqueRatio, "repetitive")
          .when(!coalesce(col(langCol).isin(t.allowedLangs: _*), lit(false)),
            "lang_not_allowed"))
      .drop("__words")
  }

  /** The kept corpus. */
  def filter(docs: DataFrame, textCol: String, langCol: String,
      t: Thresholds = Thresholds()): DataFrame =
    annotate(docs, textCol, langCol, t)
      .filter(col("drop_reason").isNull).drop("drop_reason")

  /** Drop-reason statistics (the curation report). */
  def dropStats(annotated: DataFrame): DataFrame =
    annotated.groupBy(coalesce(col("drop_reason"), lit("kept")).as("outcome"))
      .agg(count(lit(1)).as("n_docs"))
}
