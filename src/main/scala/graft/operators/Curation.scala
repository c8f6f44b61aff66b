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

  /** Pairwise n-gram-vocabulary Jaccard between corpus groups
    * (sources) — the mixture-design diagnostic: near-identical
    * vocabularies mean two "sources" are one distribution (crawl
    * mirrors), near-disjoint ones mean a mixture weight is really a
    * topic weight. Only intersecting pairs emit a row.
    *
    * Scale shape: the corpus collapses to a (term, group) incidence
    * set — bounded by vocabulary x groups, NOT by document count —
    * via one distinct aggregate; the pair join fans out each term by
    * at most groups^2, and the jaccard is pure integer arithmetic
    * ((inter*10000) div union) off exact counts.
    */
  /** Per-document n-gram novelty: the share of a doc's distinct
    * shingles that appear NOWHERE else in the corpus (df = 1) — high
    * novelty selects for fresh content, near-zero novelty marks
    * near-dups and template text that slipped past exact dedup. The
    * inverse signal of q132's containment.
    *
    * Scale shape: one exploded-distinct pass, one per-shingle df
    * count (map-side combinable), df joined BACK onto the exploded
    * corpus by shingle key (never a collected posting list — the q82
    * lesson), one per-doc count aggregate. Novelty is exact integer
    * basis points.
    */
  def noveltyScore(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // spread + cache + materialize (r19): the shingle explode is the
    // expensive per-row stage over a possibly single-split scan, and
    // it feeds BOTH the df aggregate and the join back (Par scaladoc)
    val sh = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), explode(T.shingles(col("txt"), n)).as("sh"))
        .cache())
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 10000L) div n_shingles").as("novelty_bp"))
  }

  def vocabularyOverlap(docs: DataFrame, groupCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // spread + cache + materialize (r19): see noveltyScore — here the
    // incidence set feeds the vocab aggregate AND both self-join sides
    val inc = Par.materialize(
      Par.spread(docs.select(col(groupCol).as("g"), col(textCol).as("txt")),
          col("txt"))
        .select(col("g"), explode(T.shingles(col("txt"), n)).as("term"))
        .distinct()
        .cache())
    val vocab = inc.groupBy(col("g")).agg(count(lit(1)).as("v"))
    inc.as("a").join(inc.as("b"),
        col("a.term") === col("b.term") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(vocab.select(col("g").as("g1"), col("v").as("v1"))), "g1")
      .join(broadcast(vocab.select(col("g").as("g2"), col("v").as("v2"))), "g2")
      .select(col("g1"), col("g2"), col("inter"), col("v1"), col("v2"),
        expr("(inter * 10000L) div (v1 + v2 - inter)").as("jac_bp"))
  }
}
