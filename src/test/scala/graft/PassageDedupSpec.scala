package graft

import graft.operators.PassageDedup

class PassageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f"),   // chunks (w=3): "a b c", "d e f"
    (2L, "a b c x y z"),   // first chunk duplicates doc 1's -> dropped
    (3L, "a b c d e f"),   // every chunk duplicated -> doc disappears
    (4L, "x y z"))         // duplicates doc 2's SECOND chunk -> doc 2 wins (earlier)
    .toDF("doc_id", "text")

  private def run = PassageDedup.dedupPassages(docs, "doc_id", "text", window = 3)
    .select("doc_id", "n_total", "n_kept", "text_deduped")
    .as[(Long, Long, Long, String)].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("keeps corpus-wide first occurrence of each passage window") {
    val got = run
    assert(got(1L) === ((2L, 2L, "a b c d e f")))
    assert(got(2L) === ((2L, 1L, "x y z")), "doc 2 should lose its first chunk only")
    assert(!got.contains(3L), "fully-duplicated doc must disappear")
    assert(!got.contains(4L), "doc 4's only chunk was first seen in doc 2")
  }

  test("short tail windows are compared as their own passages") {
    val d = Seq((1L, "p q r s t"), (2L, "s t")).toDF("doc_id", "text")
    val got = PassageDedup.dedupPassages(d, "doc_id", "text", window = 3)
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
    // doc 1 tail is "s t" -> doc 2's single chunk is a duplicate
    assert(got(1L) === 2L && !got.contains(2L))
  }

  test("no duplicates means identity reassembly") {
    val d = Seq((7L, "m n o p q")).toDF("doc_id", "text")
    val got = PassageDedup.dedupPassages(d, "doc_id", "text", window = 2)
      .select("text_deduped").as[String].head()
    assert(got === "m n o p q")
  }

  test("boilerplate removal drops EVERY occurrence past the df gate") {
    val d = Seq(
      (1L, "a b c d e f"),   // "a b c" hits df=3 -> dropped everywhere
      (2L, "a b c x y z"),
      (3L, "a b c a b c"),   // within-doc repeat counts once toward df
      (4L, "x y z"))         // "x y z" df=2 -> survives (unlike keep-first)
      .toDF("doc_id", "text")
    val got = PassageDedup.removeBoilerplate(d, "doc_id", "text",
        window = 3, minDf = 3)
      .select("doc_id", "n_total", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, "d e f")))
    assert(got(2L) === ((2L, 1L, "x y z")))
    assert(got(3L) === ((2L, 0L, "")), "fully-boilerplate doc survives empty")
    assert(got(4L) === ((1L, 1L, "x y z")), "df=2 window is NOT boilerplate at minDf=3")
  }
}
