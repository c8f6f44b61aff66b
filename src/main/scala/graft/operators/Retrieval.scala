package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index keyword retrieval with BM25 ranking — the lexical
  * half of a corpus-curation search stack (the embedding half is
  * `Similarity`). Built entirely from codegen'd built-ins:
  *
  *  - tokenize -> explode -> per-(doc, term) tf: one shuffle, with
  *    map-side partial counts;
  *  - the query-term set is filtered FIRST, so document frequencies
  *    and scores are computed only for the handful of query terms —
  *    at 100 TB the posting lists for k query terms are a vanishing
  *    fraction of the corpus and the per-term df aggregate is k rows;
  *  - corpus-level stats (N, avgdl) are a 1-row aggregate broadcast
  *    by the cross join;
  *  - final ranking is a top-k window over scored docs.
  *
  * Scores are emitted floor-rounded to basis points so independent
  * engines agree despite summation-order ulps.
  */
object Retrieval {

  /** Lowercased alphanumeric tokens (runs of [a-z0-9] after lower). */
  def tokensOf(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** BM25 top-k: the `k` best docs for one query-term bag.
    * Output: (doc_id, score_bp, rn) — rank by score desc, id asc.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      tokensOf(col(textCol)).as("ts"))
    val dl = tok.select(col("doc_id"), size(col("ts")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val tf = tok.select(col("doc_id"), explode(col("ts")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(floor(sum(col("w")) * 10000).cast("long").as("score_bp"))
    // top-k first (TakeOrderedAndProject — per-partition heaps, no
    // global sort), then rank the k survivors; the window never sees
    // more than k rows.
    val top = scored.orderBy(desc("score_bp"), asc("doc_id")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score_bp"), asc("doc_id"))
    top.withColumn("rn", row_number().over(w).cast("int"))
  }
}
