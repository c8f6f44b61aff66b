package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance audits for releasable tables.
  *
  * k-anonymity (Sweeney 2002): a released row is re-identifiable when
  * its quasi-identifier combination is shared by fewer than k rows —
  * the audit every release pipeline runs before shipping a dataset
  * containing indirect identifiers. This measures; it does not
  * suppress/generalize (the remediation is a policy choice the audit
  * informs).
  *
  * Scale shape: one hash aggregate over the quasi-identifier tuple
  * (the equivalence classes), then a bounded per-report-group
  * rollup — class cardinality is data-bounded, and nothing ever
  * sorts or collects rows.
  */
object Privacy {

  /** PII patterns for the scan/redact pair — ASCII-only, expressible
    * identically in Java regex (Spark codegen) and RE2 (DuckDB), so
    * the oracle replays every match. Ordered: redaction applies in
    * this sequence, and the patterns are mutually non-overlapping on
    * the placeholder text each earlier redaction leaves behind
    * (spec-proven: a full redact re-scans to zero in every category).
    * This is detection for the COMMON shapes (the curation-pipeline
    * scrub step), not a compliance guarantee — context-dependent PII
    * (names, addresses) needs NER, which is a model, not a regex.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""",
    "card" -> """\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b""",
    "phone" -> """\b\d{3}[-.]\d{3}[-.]\d{4}\b""",
    "ipv4" -> """\b(?:\d{1,3}\.){3}\d{1,3}\b""")

  /** Per-document match counts for every PII category (long-form:
    * doc_id, category, n_matches > 0 rows only) — one codegen'd
    * regexp_count per pattern per row, no shuffle before the
    * per-category rollup the caller runs.
    */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = docs.select(
      (col(idCol).as("doc_id") +:
        PiiPatterns.map { case (cat, re) =>
          regexp_count(col(textCol), lit(re)).cast("long").as(cat)
        }): _*)
    counted.select(col("doc_id"),
        explode(array(PiiPatterns.map { case (cat, _) =>
          struct(lit(cat).as("category"), col(cat).as("n_matches"))
        }: _*)).as("e"))
      .select(col("doc_id"), col("e.category").as("category"),
        col("e.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** The text with every PII category replaced by its placeholder
    * (`<EMAIL>`, `<CARD>`, ...), applied in [[PiiPatterns]] order —
    * the scrub a training corpus runs before release.
    *
    * NECESSARY-CHARACTER GATES (round 15): every pattern REQUIRES a
    * character a cheap containment test can exclude — the email
    * pattern an `@`, the card/phone/ipv4 patterns a digit — so each
    * expensive regex pass runs only on rows that could possibly
    * match. Gates are judged on the ORIGINAL text, which is exact:
    * replacements only remove characters and the placeholder tokens
    * introduce neither `@` nor digits, so a gate that fails on the
    * original fails on every intermediate too. On a clean corpus
    * (the common case at training scale — most documents carry no
    * PII) the scrub costs one literal `instr` and one
    * character-class scan per row instead of four backtracking
    * regex passes; on a dirty corpus the gated rows pay exactly what
    * they paid before. Provably hash-identical (q277/q279/q186 gates
    * + PiiSpec's positive matches).
    */
  def piiRedact(text: Column): Column = {
    val (emailPats, digitPats) = PiiPatterns.partition(_._1 == "email")
    def fold(start: Column, pats: Seq[(String, String)]): Column =
      pats.foldLeft(start) { case (acc, (cat, re)) =>
        regexp_replace(acc, re, s"<${cat.toUpperCase}>")
      }
    val afterEmail =
      when(text.contains("@"), fold(text, emailPats)).otherwise(text)
    when(text.rlike("[0-9]"), fold(afterEmail, digitPats))
      .otherwise(afterEmail)
  }

  /** Per report group: class count, classes below k, rows at risk,
    * and the at-risk fraction in exact basis points.
    */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], reportBy: Column,
      k: Long): DataFrame = {
    val cls = df.groupBy((reportBy.as("grp") +: qi): _*)
      .agg(count(lit(1)).as("n"))
    cls.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"))
      .withColumn("risk_bp", expr("rows_at_risk * 10000L div n_rows"))
      .select(col("grp"), col("n_classes"), col("n_small_classes"),
        col("n_rows"), col("rows_at_risk"), col("risk_bp"))
  }
}
