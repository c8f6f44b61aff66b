package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{QualityFunctions => Q, TextFunctions => T}

/** Multi-signal curation verdict — the composed filter a production
  * training-data pipeline actually runs: heuristic quality score,
  * language-ID agreement, repetition profile, and corpus-LM
  * likelihood, folded into one keep/drop decision with machine-
  * readable reason codes (so drops are auditable, not silent).
  *
  * Scale shape: three document-keyed aggregate passes (base scalars,
  * repetition profile, LM score) joined on doc_id — each pass is one
  * shuffle on per-doc keys; the LM's count tables are vocabulary-
  * bounded. Reason codes are evaluated in a fixed order so the output
  * string is deterministic.
  */
object QualityEnsemble {

  /** Verdict per document: (doc_id, quality_score, pred_lang,
    * reasons, keep). `reasons` is a comma-joined fixed-order list of
    * failed checks — empty means keep. Documents too short to profile
    * (< 3 tokens) are flagged `too_short`, not dropped silently.
    */
  def verdict(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      minQuality: Double = 0.70, maxTopBigram: Double = 0.05,
      maxDupTrigram: Double = 0.05, minAvgLogprob: Double = -3.45): DataFrame = {
    val words = T.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      Q.qualityScore(words).as("quality_score"),
      Q.predictedLang(words).as("pred_lang"))
    val rep = Repetition
      .repetitionProfile(docs, idCol, textCol, maxTopBigram, maxDupTrigram)
      .select(col("doc_id"), col("top_bigram_frac"), col("dup_trigram_frac"))
    val lm = LanguageModel.bigramScore(docs, idCol, textCol)
      .select(col("doc_id"), col("avg_logprob"))
    base.join(rep, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .withColumn("reasons", concat_ws(",",
        when(col("quality_score") < minQuality, lit("low_quality")),
        when(col("pred_lang") =!= col("lang"), lit("lang_mismatch")),
        when(col("top_bigram_frac") > maxTopBigram ||
          col("dup_trigram_frac") > maxDupTrigram, lit("repetitive")),
        when(col("avg_logprob") < minAvgLogprob, lit("unlikely_text")),
        when(col("top_bigram_frac").isNull || col("avg_logprob").isNull,
          lit("too_short"))))
      .withColumn("keep", col("reasons") === "")
      .select(col("doc_id"), col("quality_score"), col("pred_lang"),
        col("reasons"), col("keep"))
  }
}
