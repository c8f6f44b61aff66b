package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** RAG-ingestion chunking: overlapping token windows with a stride —
  * the retrieval-granularity transform between raw documents and an
  * embedding index. Overlap (stride < size) keeps answers that
  * straddle a boundary retrievable from at least one chunk.
  *
  * Pure per-row explode — no shuffle, no state; chunk ids are
  * (doc_id, chunk_idx) so downstream dedup/embedding stages key
  * deterministically.
  */
object Chunking {

  /** Explode into chunks of `size` tokens every `stride` tokens
    * (stride <= size gives overlap size - stride). The final window
    * starts at the last stride position that still covers unseen
    * tokens; short tails are emitted, not padded. Output: (doc_id,
    * chunk_idx, start_token, n_tokens, chunk_text).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= chunkSize, "need 0 < stride <= chunkSize")
    val words = T.tokens(col(textCol))
    // number of windows: 1 + ceil(max(0, n - size) / stride)
    val n = size(words)
    val nChunks = lit(1) + ceil(
      greatest(n - chunkSize, lit(0)).cast("double") / stride).cast("int")
    // trim gate: a whitespace-only doc splits to [""] (n = 1), which
    // would emit a degenerate 1-token empty chunk
    docs.filter(length(trim(col(textCol))) > 0 && n > 0)
      .select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => struct(
            (i * stride + 1).cast("long").as("start_token"),
            slice(words, (i * stride + 1).cast("int"), lit(chunkSize))
              .as("toks")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.start_token"),
        size(col("col.toks")).cast("long").as("n_tokens"),
        array_join(col("col.toks"), " ").as("chunk_text"))
  }
}
