package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{QualityFunctions => Q, TextFunctions => T}

/** Corpus-trained n-gram language-model scoring — the classic
  * perplexity-style quality signal (score each document by how
  * typical its token transitions are of the corpus).
  *
  * Scale shape: the bigram/unigram count tables are
  * vocabulary-bounded (they stop growing once the corpus covers the
  * domain), so the three aggregations shuffle token-pair counts, not
  * documents; the score-side joins are hash equi-joins on those
  * bounded tables. On a production pipeline the LM tables are
  * trained once, persisted, and broadcast when small; here train and
  * score run in one plan so the oracle can replay both.
  */
object LanguageModel {

  /** Add-one-smoothed bigram log-probability per document:
    * P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = distinct tokens.
    * Output: (doc_id, n_bigrams, avg_logprob floor4). Documents with
    * fewer than two tokens produce no bigrams and are dropped.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = col("ws")
    // spread + cache + materialize (r19, Par scaladoc): the bigram
    // explode feeds the bigram count, the unigram count AND the score
    // join — uncached it ran three times on a single-split scan. The
    // under-2-tokens guard became an empty-array branch (a filter here
    // would be pushed below the spread exchange and re-tokenize
    // single-task); explode of an empty array drops the row, so the
    // row set is unchanged.
    val bg = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), T.tokens(col("txt")).as("ws"))
        .select(col("doc_id"), explode(when(size(ws) >= 2,
            transform(sequence(lit(1), size(ws) - 1),
              i => struct(element_at(ws, i).as("w1"),
                element_at(ws, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .cache())
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val v = Par.spread(docs.select(col(textCol).as("txt")), col("txt"))
      .select(explode(T.tokens(col("txt"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    // score each DISTINCT bigram once (all inputs vocabulary-bounded),
    // then join the big per-doc bigram stream a single time against
    // the finished score table — one stream-side shuffle instead of
    // two joins plus a cross join over the full stream
    val pairScores = cb
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("lp", log((col("cb") + 1.0) / (col("cu") + col("v"))))
      .select(col("w1"), col("w2"), col("lp"))
    bg.join(pairScores, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Q.floor4(avg(col("lp"))).as("avg_logprob"))
  }
}
