package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("overlapping chunks cover every token and respect the stride") {
    // 7 tokens, size 4, stride 2 -> windows at 1, 3, 5: tail emitted short
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, "doc_id", "text", 4, 2)
      .select("chunk_idx", "start_token", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 1L, 4L, "a b c d"),
      (1L, 3L, 4L, "c d e f"),
      (2L, 5L, 3L, "e f g")))
  }

  test("doc shorter than one window yields a single short chunk") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, "doc_id", "text", 8, 4)
      .select("chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq === Seq((0L, 2L, "x y")))
  }

  test("whitespace-only and empty docs emit no chunks") {
    val docs = Seq((1L, ""), (2L, "   "), (4L, "real text here"))
      .toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, "doc_id", "text", 4, 2)
      .select("doc_id", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq === Seq((4L, 3L, "real text here")))
  }

  test("stride == size gives disjoint tiling") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val texts = Chunking.chunkTokens(docs, "doc_id", "text", 3, 3)
      .select("chunk_text").as[String].collect().toSeq
    assert(texts.sorted === Seq("a b c", "d e f"))
  }
}
