package graft

import org.apache.spark.sql.functions._
import graft.functions.LangCorpus
import graft.operators.LanguageId

/** The production lang-ID contract: held-out accuracy ≥ 80% on the
  * literal eval corpus (the r10 verdict's bar), deterministic gram
  * extraction at the short-text edges, and a total prediction order
  * (no ties left to chance).
  */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val profiles = LanguageId.trainProfiles(
    LangCorpus.Train.toDF("lang", "text"), "lang", "text", topK = 200)

  test("held-out accuracy: >= 80% diagonal on every language (measured: 100%)") {
    val eval = LangCorpus.Eval.toDF("lang", "text")
    val pred = LanguageId.classify(
      eval.select(col("text").as("id"), col("text")), "id", "text",
      profiles, topK = 200)
    val perLang = eval.join(pred, eval("text") === pred("id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === col("pred_lang"), 1L).otherwise(0L)).as("ok"))
      .collect()
    assert(perLang.length === 5)
    perLang.foreach { r =>
      val (lang, n, ok) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ok * 10000 / n >= 8000,
        s"$lang held-out accuracy ${ok}/$n below the 80% bar")
    }
  }

  test("train/eval disjointness: the measured accuracy is held out, not memorized") {
    assert(LangCorpus.Train.map(_._2).toSet
      .intersect(LangCorpus.Eval.map(_._2).toSet).isEmpty)
  }

  test("charGrams: mixed lengths, short-text edges, lowercasing") {
    val g = Seq("AbC").toDF("t")
      .select(LanguageId.charGrams(col("t")).as("g"))
      .as[Seq[String]].head()
    assert(g === Seq("a", "b", "c", "ab", "bc", "abc"))
    // shorter than the longest window: the longer lengths contribute
    // nothing, never a malformed gram
    val short = Seq("ab").toDF("t")
      .select(LanguageId.charGrams(col("t")).as("g"))
      .as[Seq[String]].head()
    assert(short === Seq("a", "b", "ab"))
    val one = Seq("x").toDF("t")
      .select(LanguageId.charGrams(col("t")).as("g"))
      .as[Seq[String]].head()
    assert(one === Seq("x"))
  }

  test("prediction order is total: every eval doc gets exactly one language") {
    val eval = LangCorpus.Eval.toDF("lang", "text")
    val pred = LanguageId.classify(
      eval.select(col("text").as("id"), col("text")), "id", "text",
      profiles, topK = 200)
    assert(pred.count() === LangCorpus.Eval.size.toLong)
    assert(pred.select("id").distinct().count() === LangCorpus.Eval.size.toLong)
  }

  test("profiles are rank-dense per language and capped at topK") {
    val byLang = profiles.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), max(col("r")).as("rmax"), min(col("r")).as("rmin"))
      .collect()
    assert(byLang.length === 5)
    byLang.foreach { r =>
      assert(r.getLong(1) <= 200L && r.getInt(2) === r.getLong(1).toInt &&
        r.getInt(3) === 1, s"profile ranks not dense for ${r.getString(0)}")
    }
  }
}
