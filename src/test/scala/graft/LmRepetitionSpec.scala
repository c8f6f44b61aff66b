package graft

import graft.operators.{LanguageModel, Repetition}

class LmRepetitionSpec extends SparkTestBase {
  import spark.implicits._

  // --- bigram LM ---

  private def lmDocs = Seq(
    (1L, "a b a b"), // bigrams (a,b) x2, (b,a) x1
    (2L, "a b"),     // bigram (a,b) x1
    (3L, "c"))       // no bigrams -> dropped, but counts toward V
    .toDF("doc_id", "text")

  test("bigramScore matches hand-computed add-one-smoothed logprobs") {
    // V = |{a,b,c}| = 3; cb(a,b)=3, cb(b,a)=1; cu(a)=3, cu(b)=1
    // lp(a,b) = ln(4/6), lp(b,a) = ln(2/4)
    val byId = LanguageModel.bigramScore(lmDocs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!byId.contains(3L), "sub-bigram doc must be dropped")
    val lpAB = math.log(4.0 / 6.0)
    val lpBA = math.log(2.0 / 4.0)
    def floor4(x: Double) = math.floor(x * 10000) / 10000
    assert(byId(1L)._1 === 3L)
    assert(byId(1L)._2 === floor4((2 * lpAB + lpBA) / 3.0))
    assert(byId(2L)._1 === 1L)
    assert(byId(2L)._2 === floor4(lpAB))
  }

  test("bigramScore smoothing uses corpus-wide vocabulary including bigram-less docs") {
    // Without doc 3, V would be 2 and lp(a,b) = ln(4/5) != ln(4/6).
    val withoutC = LanguageModel.bigramScore(
      lmDocs.filter($"doc_id" =!= 3L), "doc_id", "text")
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(withoutC(2L) === math.floor(math.log(4.0 / 5.0) * 10000) / 10000)
  }

  // --- repetition profile ---

  private def repDocs = Seq(
    (1L, "x y x y x y"),   // looping text: top bigram 3/5, dup trigrams 4/4
    (2L, "a b c d e f"))   // clean text: top bigram 1/5, dup trigrams 0
    .toDF("doc_id", "text")

  test("repetitionProfile computes fractions and keep flags per Gopher thresholds") {
    val got = Repetition.repetitionProfile(repDocs, "doc_id", "text")
      .select("doc_id", "top_bigram_frac", "dup_trigram_frac", "keep")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((0.6, 1.0, false)))
    assert(got(2L) === ((0.2, 0.0, true)))
  }

  test("repetitionProfile drops docs too short for trigrams") {
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Repetition.repetitionProfile(short, "doc_id", "text").count() === 0)
  }
}
