package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document
  * by how much more likely its hashed-token features are under a
  * TARGET distribution (the clean/in-domain slice you want more of)
  * than under the SOURCE distribution (the raw corpus), then keep the
  * top-k. This is the standard pretraining-data recipe for "make the
  * crawl look like the target" without training a classifier.
  *
  * Scale shape: the only corpus-sized work is one tokenize + one
  * hash-aggregate per document; everything distributional lives in a
  * BUCKETS-row table (hashed feature space — bounded by construction,
  * not by vocabulary), which broadcasts. The per-bucket log-ratio is
  * computed ONCE on that bounded table and floor-quantized to e6
  * integer units BEFORE it touches the corpus, so each document's
  * score is an exact integer sum — order-independent, replayable in
  * any engine (the q76 discipline, tightened: here only B log() calls
  * ever happen, not one per token). Selection is a TakeOrdered heap
  * under a total order, never a global sort.
  *
  * Determinism note vs the paper: DSIR samples with Gumbel noise;
  * this operator takes the deterministic top-k of the same importance
  * weights (score ties broken by doc id), which is the replayable
  * variant a data pipeline can re-run idempotently. Hash buckets use
  * the repo's md5 convention so the features are engine-reproducible.
  * At extreme counts the exact rational (c+1)(N'+B) products leave
  * the 2^53 double-exact range — a 100 TB run divides first (the
  * ratio stays O(1)) at the cost of one extra rounding, or keeps
  * counts per shard.
  */
object ImportanceResampling {

  /** The bounded per-bucket table: source count, target count, and
    * the add-one-smoothed integer log-ratio
    * floor(1e6 * ln( ((c_t+1)/(N_t+B)) / ((c_s+1)/(N_s+B)) )).
    */
  def bucketLogRatios(docs: DataFrame, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    // spread (r19, Par scaladoc): tokenize + per-token md5 must not
    // run on a single-split scan
    val tok = Par.spread(
        docs.select(isTarget.as("is_target"), col(textCol).as("txt")),
        col("txt"))
      .select(col("is_target"), explode(T.tokens(col("txt"))).as("t"))
      .withColumn("b", pmod(T.md5Int32(col("t")), lit(buckets.toLong)))
    val counts = tok.groupBy(col("b"))
      .agg(count(lit(1)).as("c_s"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"))
    val tot = counts.agg(sum(col("c_s")).as("n_s"), sum(col("c_t")).as("n_t"))
    counts.crossJoin(broadcast(tot))
      // each factor cast to double BEFORE the multiply: the products
      // can pass 2^63 at extreme token counts, and a signed wraparound
      // would produce garbage log-ratios — as doubles the failure mode
      // is rounding (the scaladoc's 2^53 note), never overflow
      .withColumn("lr_e6",
        floor(log(
          ((col("c_t") + 1L).cast("double") * (col("n_s") + buckets.toLong).cast("double")) /
            ((col("c_s") + 1L).cast("double") * (col("n_t") + buckets.toLong).cast("double")))
          * 1e6).cast("long"))
      .select(col("b"), col("c_s"), col("c_t"), col("lr_e6"))
  }

  /** Top-k documents by summed integer importance weight. Output:
    * (doc_id, n_tokens, score_e6), the exact per-document evidence a
    * curation report needs.
    */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, k: Int): DataFrame = {
    val lr = bucketLogRatios(docs, textCol, isTarget, buckets)
      .select(col("b"), col("lr_e6"))
    Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
        col("doc_id"))
      .select(col("doc_id"), explode(T.tokens(col("txt"))).as("t"))
      .withColumn("b", pmod(T.md5Int32(col("t")), lit(buckets.toLong)))
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)
  }
}
