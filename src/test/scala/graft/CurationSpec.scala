package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curation annotates first-failing reason and filter keeps clean docs") {
    val docs = Seq(
      (1L, "one two three", "en"),                       // too short (< 5)
      (2L, "the the the the the the the the", "en"),     // stopword heavy
      (3L, "alpha beta gamma delta epsilon zeta", "en"), // keep
      (4L, "alpha beta gamma delta epsilon zeta", "xx")) // lang
      .toDF("doc_id", "text", "lang")
    val t = Curation.Thresholds(minTokens = 5, maxTokens = 100,
      maxStopwordRatio = 0.5, minUniqueRatio = 0.3,
      allowedLangs = Seq("en"))
    val ann = Curation.annotate(docs, "text", "lang", t)
    val reasons = ann.select("doc_id", "drop_reason")
      .as[(Long, Option[String])].collect().toMap
    assert(reasons(1L) === Some("too_short"))
    assert(reasons(2L) === Some("stopword_heavy"))
    assert(reasons(3L) === None)
    assert(reasons(4L) === Some("lang_not_allowed"))
    assert(Curation.filter(docs, "text", "lang", t)
      .select("doc_id").as[Long].collect().toSeq === Seq(3L))
    val stats = Curation.dropStats(ann).as[(String, Long)].collect().toMap
    assert(stats("kept") === 1 && stats("too_short") === 1)
  }

  test("vocabulary overlap reports exact shingle-set jaccard per group pair") {
    // a and b share exactly the shingle "x y z" (a: 2 shingles, b: 2);
    // c is disjoint from both -> no row for (a,c)/(b,c)
    val d = Seq(
      (1L, "a", "w x y z"),     // shingles: "w x y", "x y z"
      (2L, "b", "x y z q"),     // shingles: "x y z", "y z q"
      (3L, "c", "m n o p"))
      .toDF("doc_id", "grp", "text")
    val got = Curation.vocabularyOverlap(d, "grp", "text", n = 3)
      .select("g1", "g2", "inter", "v1", "v2", "jac_bp")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("a", "b", 1L, 2L, 2L, 3333L)))
  }
}
