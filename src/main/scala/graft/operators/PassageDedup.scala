package graft.operators

import org.apache.spark.sql.DataFrame
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
    // spread + cache + materialize (r19, Par scaladoc): the chunk
    // explode feeds first-occurrence, join-back AND totals — it ran
    // three times on a single-split scan. The emptiness guard became
    // an empty-array branch (a filter is pushed below the spread
    // exchange and re-tokenizes single-task); posexplode of an empty
    // array drops the row — identical row set.
    val words = col("ws")
    val nChunks = floor((size(words).cast("double") + (window - 1)) / window)
      .cast("long")
    val chunks = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), T.tokens(col("txt")).as("ws"))
        .select(col("doc_id"),
          posexplode(when(size(words) > 0, transform(
              sequence(lit(0L), nChunks - 1),
              i => array_join(
                slice(words, (i * window + 1).cast("int"), lit(window)), " ")))
            .otherwise(array().cast("array<string>"))))
        .withColumnRenamed("pos", "idx")
        .withColumnRenamed("col", "passage")
        .cache())
    // first occurrence via min(struct) — an associative aggregate, so
    // partial aggregation combines map-side and a passage duplicated
    // a billion times reaches the reducer as one row per map task. (A
    // row_number window here would sort ALL copies of a hot passage
    // in a single partition.) The join-back keys on the full
    // (passage, doc_id, idx) triple, unique on both sides, so the hot
    // passage never concentrates in the join either.
    val first = chunks.groupBy(col("passage"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
      .select(col("passage"), col("first.doc_id").as("doc_id"),
        col("first.idx").as("idx"))
    val kept = chunks.join(first, Seq("passage", "doc_id", "idx"))
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

  /** CCNet-style boilerplate removal — the complement of
    * [[dedupPassages]]: instead of keeping each duplicated window's
    * FIRST occurrence, drop EVERY occurrence of windows whose
    * corpus-wide document frequency reaches `minDf` (nav menus,
    * cookie banners, license headers — text that is boilerplate
    * precisely because many unrelated documents share it). Documents
    * reduced to nothing survive with empty text and n_kept = 0 so the
    * caller can apply its own length gate afterwards.
    *
    * Scale shape: df is two map-side-combinable hash aggregations
    * ((passage, doc) distinct, then per-passage count) — a window
    * shared by a billion docs reaches the second stage as one row per
    * map task. The drop itself is a left-anti join keyed on the
    * passage; the hot boilerplate key is one build-side row however
    * many probe rows carry it.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, minDf: Int = 3): DataFrame = {
    // spread + cache + materialize + explode-drops-empties: see
    // dedupPassages (r19)
    val words = col("ws")
    val nChunks = floor((size(words).cast("double") + (window - 1)) / window)
      .cast("long")
    val chunks = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), T.tokens(col("txt")).as("ws"))
        .select(col("doc_id"),
          posexplode(when(size(words) > 0, transform(
              sequence(lit(0L), nChunks - 1),
              i => array_join(
                slice(words, (i * window + 1).cast("int"), lit(window)), " ")))
            .otherwise(array().cast("array<string>"))))
        .withColumnRenamed("pos", "idx")
        .withColumnRenamed("col", "passage")
        .cache())
    val boilerplate = chunks.select(col("passage"), col("doc_id")).distinct()
      .groupBy(col("passage")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("passage"))
    val kept = chunks.join(boilerplate, Seq("passage"), "left_anti")
    val totals = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_total"))
    totals.join(
        kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            array_join(
              transform(array_sort(collect_list(struct(col("idx"), col("passage")))),
                s => s.getField("passage")), " ").as("text_clean")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
