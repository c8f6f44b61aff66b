package graft

import org.apache.spark.sql.functions._
import graft.operators.Encoding

class EncodingSpec extends SparkTestBase {
  import spark.implicits._

  test("dictionary codes rank by frequency with deterministic ties") {
    val df = Seq("b", "b", "b", "a", "a", "c", "d", "d").toDF("cat")
    val dict = Encoding.dictionary(df, "cat", maxVocab = 10)
      .as[(String, Long, Long)].collect().toSeq
    // b (3) first; a and d tie at 2 -> value order; c (1) last
    assert(dict === Seq(("b", 0L, 3L), ("a", 1L, 2L), ("d", 2L, 2L), ("c", 3L, 1L)))
  }

  test("encode joins codes back and the maxVocab guard throws, not OOMs") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "cat")
    val dict = Encoding.dictionary(df, "cat", maxVocab = 5)
    val enc = Encoding.encode(df, dict, "cat", "cat_code")
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    assert(enc === Seq((1L, 0L), (2L, 1L), (3L, 0L)))
    val wide = spark.range(0, 100).select(concat(lit("v"), col("id")).as("cat"))
    val ex = intercept[IllegalArgumentException] {
      Encoding.dictionary(wide, "cat", maxVocab = 50)
    }
    assert(ex.getMessage.contains("featureHash"))
  }

  test("feature hashing is vocabulary-free, bounded by dim, and collision-additive") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "")).toDF("doc_id", "text")
    val hashed = Encoding.featureHash(docs, "doc_id", "text", dim = 16)
    val rows = hashed.as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, idx, _) => idx >= 0 && idx < 16 })
    // empty doc contributes nothing
    assert(!rows.exists(_._1 == 3L))
    // doc 1: "apple" twice -> its bucket count is 2 (or 3 on a
    // 16-bucket collision with banana — still additive, never lost)
    val doc1Total = rows.filter(_._1 == 1L).map(_._3).sum
    assert(doc1Total === 3L)
    val doc2Total = rows.filter(_._1 == 2L).map(_._3).sum
    assert(doc2Total === 2L)
    // same token -> same bucket across docs
    val bananaBucket = graft.functions.TextFunctions.md5Int32(lit("banana"))
    val b = docs.sparkSession.range(1).select(pmod(bananaBucket, lit(16L)))
      .as[Long].head()
    assert(rows.filter(_._1 == 2L).map(_._2).contains(b))
  }
}
