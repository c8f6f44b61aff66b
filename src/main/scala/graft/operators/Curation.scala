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

  /** Annotate each document with drop_reason (null = keep). */
  def annotate(docs: DataFrame, textCol: String, langCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val words = T.tokens(col(textCol))
    val n = size(words)
    docs
      .withColumn("drop_reason",
        when(n < t.minTokens, "too_short")
          .when(n > t.maxTokens, "too_long")
          .when(Q.stopwordRatio(words) > t.maxStopwordRatio, "stopword_heavy")
          .when(Q.uniqueRatio(words) < t.minUniqueRatio, "repetitive")
          .when(!col(langCol).isin(t.allowedLangs: _*), "lang_not_allowed"))
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
