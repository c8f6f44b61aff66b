package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}
import graft.operators.{Chunking, PassageDedup}

/** Property tests for the round-4 text operators: invariants that
  * must hold on ANY corpus, checked over generated word-salad docs.
  */
class Round4PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy")
  private val doc = Gen.chooseNum(1, 30)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, doc))

  private def run(prop: Prop): Unit = {
    val r = scCheck(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  test("passage dedup: kept text is a subsequence of the original and counts are sane") {
    run(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = PassageDedup.dedupPassages(docs, "doc_id", "text", window = 3)
        .select("doc_id", "n_total", "n_kept", "text_deduped")
        .as[(Long, Long, Long, String)].collect()
      def isSubseq(sub: Seq[String], sup: Seq[String]): Boolean = {
        var rest = sup
        sub.forall { tok =>
          val i = rest.indexOf(tok)
          if (i < 0) false else { rest = rest.drop(i + 1); true }
        }
      }
      out.forall { case (id, total, kept, text) =>
        // kept tokens appear in the original in order (subsequence)
        kept >= 1 && kept <= total &&
          isSubseq(text.split(" ").toSeq, texts(id.toInt).split(" ").toSeq)
      }
    })
  }

  test("passage dedup: distinct passages across survivors equal distinct corpus passages") {
    run(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def windows(t: String): Seq[String] =
        t.split(" ").grouped(3).map(_.mkString(" ")).toSeq
      val corpusPassages = texts.flatMap(windows).toSet
      val survivorPassages = PassageDedup
        .dedupPassages(docs, "doc_id", "text", window = 3)
        .select("text_deduped").as[String].collect()
        .flatMap(windows).toSet
      // every distinct passage survives exactly somewhere, none invented
      survivorPassages == corpusPassages
    })
  }

  test("chunking: disjoint tiling reassembles the original text") {
    run(Prop.forAll(doc) { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val back = Chunking.chunkTokens(df, "doc_id", "text", 4, 4)
        .orderBy("chunk_idx").select("chunk_text").as[String].collect()
        .mkString(" ")
      back == t
    })
  }

  test("chunking: overlapping windows cover every token position") {
    run(Prop.forAll(doc) { t =>
      val n = t.split(" ").length
      val covered = Chunking.chunkTokens(Seq((1L, t)).toDF("doc_id", "text"), "doc_id", "text", 5, 2)
        .select("start_token", "n_tokens").as[(Long, Long)].collect()
        .flatMap { case (s, len) => s until (s + len) }.toSet
      covered == (1L to n.toLong).toSet
    })
  }
}
