package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document quality scoring and language identification heuristics
  * for training-data curation — pure built-in expressions.
  */
object QualityFunctions {

  val Stopwords: Seq[String] = Seq("the", "a")

  /** 4-decimal truncation. Ratios of small integers land exactly on
    * .xxxx5 round boundaries, where Spark's BigDecimal HALF_UP and
    * DuckDB's numeric rounding disagree; floor(x*1e4)/1e4 is computed
    * on identical doubles in both engines, so it never diverges.
    */
  def floor4(c: Column): Column = floor(c * 10000) / 10000.0

  /** Character-level Shannon entropy in bits/char — the gibberish /
    * low-information signal (random byte noise scores high, repeated
    * filler scores near zero; natural text sits ~4 bits). Pure column
    * ops per row: distinct chars -> per-char probability ->
    * -Σ p·log2(p), truncated to 4 decimals on identical doubles in
    * both engines (the floor4 discipline). `+ 0.0` normalizes the
    * -0.0 a single-distinct-char doc would produce (Java floor keeps
    * the sign; the driver's repr-tagged compare distinguishes -0.0).
    */
  def charEntropy(text: Column): Column = {
    val chars = filter(split(text, ""), c => c =!= lit(""))
    val n = size(chars).cast("double")
    val probs = transform(array_distinct(chars),
      c => size(filter(chars, x => x === c)).cast("double") / n)
    when(size(chars) > 0,
      floor4(-aggregate(probs, lit(0.0), (acc, p) => acc + p * log2(p))) + 0.0)
      .otherwise(0.0)
  }

  /** Ratio of distinct tokens to tokens (repetition indicator). */
  def uniqueRatio(words: Column): Column =
    floor4(size(array_distinct(words)).cast("double") / size(words))

  /** Ratio of stopword tokens. */
  def stopwordRatio(words: Column): Column =
    floor4(size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / size(words))

  /** Mean token length for single-space-joined text. */
  def avgWordLen(text: Column, words: Column): Column =
    floor4((length(text) - (size(words) - 1)).cast("double") / size(words))

  /** Composite quality score in [0, 1]: length credit + low-stopword
    * credit + lexical-diversity credit. Weights are fixed so the
    * score is reproducible anywhere.
    */
  def qualityScore(words: Column): Column =
    floor4(
      least(size(words).cast("double") / 50.0, lit(1.0)) * 0.4 +
        (lit(1.0) - size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / size(words)) * 0.3 +
        (size(array_distinct(words)).cast("double") / size(words)) * 0.3)

  /** Fixed signature-token profiles for the language-ID heuristic.
    * Deliberately tiny: language ID over word-salad test corpora is a
    * determinism exercise; swap profiles for real char-n-gram tables
    * in production.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("group", "order", "window", "batch"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "table", "row", "line"),
    "fr" -> Seq("key", "value", "merge", "part"),
    "zh" -> Seq("spark", "query", "join", "scan"))

  /** Signature-token count for one language profile. */
  def langScore(words: Column, profile: Seq[String]): Column =
    size(filter(words, w => w.isin(profile: _*)))

  /** Predicted language: argmax profile score, ties broken by
    * alphabetical language code (the LangProfiles order).
    */
  def predictedLang(words: Column): Column = {
    val scores = LangProfiles.map { case (l, p) => l -> langScore(words, p) }
    val m = greatest(scores.map(_._2): _*)
    scores.foldLeft(lit(null).cast("string")) { case (acc, (l, sc)) =>
      coalesce(acc, when(sc === m, lit(l)))
    }
  }
}
