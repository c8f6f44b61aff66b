package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Passage-window deduplication — the RefinedWeb/C4-style substring
  * dedup that exact document dedup misses: chunk each document into
  * fixed token windows, keep only the corpus-wide first occurrence of
  * each distinct window, and reassemble the surviving text.
  *
  * Scale shape: the only wide stage is one shuffle keyed by passage
  * text (first-occurrence ranking), whose key space is bounded by the
  * distinct-passage count, then one per-document aggregation for
  * reassembly. Nothing is quadratic and nothing collects to the
  * driver; a hot passage (billions of repeats) lands on one ranking
  * partition but emits a single survivor row.
  */
object PassageDedup {

  /** Chunk into `window`-token passages, keep the first occurrence
    * (lowest (doc_id, idx)) of each distinct passage, reassemble per
    * document in original order. Output: (doc_id, n_total, n_kept,
    * text_deduped); documents whose every passage is a duplicate of
    * an earlier document disappear.
    */
  def dedupPassages(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 16): DataFrame = {
    val words = T.tokens(col(textCol))
    val nChunks = floor((size(words).cast("double") + (window - 1)) / window)
      .cast("long")
    val chunks = docs.filter(size(words) > 0)
      .select(col(idCol).as("doc_id"),
        posexplode(transform(
          sequence(lit(0L), nChunks - 1),
          i => array_join(
            slice(words, (i * window + 1).cast("int"), lit(window)), " "))))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "passage")
    val firstSeen = Window.partitionBy(col("passage"))
      .orderBy(col("doc_id"), col("idx"))
    val kept = chunks
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
    val totals = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_total"))
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("passage")))),
            s => s.getField("passage")), " ").as("text_deduped"))
      .join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("n_total"), col("n_kept"), col("text_deduped"))
  }
}
