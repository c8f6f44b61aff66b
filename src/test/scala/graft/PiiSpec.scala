package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** The PII scan/redact contract: every category found, redaction
  * leaves zero residual, placeholders never re-match, and
  * near-miss shapes are NOT flagged.
  */
class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def scanOne(text: String): Map[String, Long] =
    Privacy.piiScan(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  private def redactOne(text: String): String =
    Seq(text).toDF("t").select(Privacy.piiRedact(col("t"))).head().getString(0)

  test("all four categories in one document; redact leaves zero residual") {
    val text = "mail a.b@x.org then call 555-123-4567 from 192.168.0.1 " +
      "using 4111 1111 1111 1111 twice: c.d@y.co.uk"
    assert(scanOne(text) ===
      Map("email" -> 2L, "phone" -> 1L, "ipv4" -> 1L, "card" -> 1L))
    val red = redactOne(text)
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
      red.contains("<IPV4>") && red.contains("<CARD>"))
    // re-scan of the redacted text: nothing left in any category
    assert(scanOne(red) === Map.empty)
  }

  test("near-miss shapes are not flagged") {
    // 4-digit leading octet, date-like dashes, 3-group card, bare words
    val text = "version 1234.5.6.7 on 2024-01-15 ref 1111 2222 3333 " +
      "ticket abc-def-ghij at example.com"
    assert(scanOne(text) === Map.empty)
  }

  test("redaction order resolves overlapping categories: the earlier pattern wins whole") {
    // a digit-heavy email local part ALSO matches the phone shape —
    // the scan reports each category independently (overlaps are
    // both counted; a reviewer wants both flags), but redaction
    // applies email first, so the text collapses to ONE placeholder
    // with no phone-shaped remnant
    val text = "reach 555.123.4567@ops.example.net now"
    assert(scanOne(text) === Map("email" -> 1L, "phone" -> 1L))
    assert(redactOne(text) === "reach <EMAIL> now")
    assert(scanOne(redactOne(text)) === Map.empty)
  }
}
