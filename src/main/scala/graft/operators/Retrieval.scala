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
    // spread + cache + materialize (r19, Par scaladoc): ONE tokenize
    // pass feeds doc lengths, corpus stats and the tf stream (it ran
    // per consumer, on a single-split scan each time)
    val tok = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), tokensOf(col("txt")).as("ts"))
        .cache())
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
    // BOUNDED window: k-sized by the limit above
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score_bp"), asc("doc_id"))
    top.withColumn("rn", row_number().over(w).cast("int"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09) — combine
    * heterogeneous rankers (BM25, ANN, ...) without score
    * calibration: each ranker contributes 1/(kRrf + rank) per doc,
    * fused docs sort by the summed contribution. Scores here are
    * exact INTEGER micro-units (1e6 div (kRrf + rank)) so fusion is
    * order-independent and engine-portable — no floating sum over a
    * ranker-count that may grow.
    *
    * Inputs: each ranking is (idCol, rankCol) with rank 1-based and
    * already top-k-bounded, so the union is rankers x k rows — the
    * fusion aggregate is tiny no matter how large the corpus that
    * produced the rankings. Output: (id, rrf_e6, n_rankers).
    */
  def reciprocalRankFusion(rankings: Seq[DataFrame], idCol: String,
      rankCol: String, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings
      .map(_.select(col(idCol).as("id"), col(rankCol).cast("long").as("r")))
      .reduce(_ unionAll _)
      // exact integer division — never a double on the score path
      .select(col("id"), expr(s"1000000L div (r + $kRrf)").as("contrib"))
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("rrf_e6"),
        count(lit(1)).as("n_rankers"))
  }

  /** Cross-engine term bucket: md5-derived so the partition layout is
    * reproducible from SQL (Spark's Murmur3 `hash` is not).
    */
  def termBucket(term: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(term), 1, 8), 16, 10).cast("long"), lit(nBuckets))

  /** Driver-side twin of [[termBucket]] for computing the probe set. */
  def termBucketOf(term: String, nBuckets: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % nBuckets
  }

  /** Materialize the inverted index: `path/postings` holds (term,
    * doc_id, tf) parquet partitioned by the md5 term bucket —
    * searches prune to the buckets their terms hash into before any
    * file opens; `path/docstats` holds (doc_id, dl) plus the corpus
    * constants (n_docs, avgdl) denormalized onto each row so search
    * never re-scans the corpus. Build is one tokenize pass + one
    * (doc, term) shuffle; files per bucket follow data size via the
    * bucket-column repartition (AQE coalesces small ones).
    */
  def invertedIndexWrite(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 16): Unit = {
    // spread + cache + materialize: see bm25TopK (r19)
    val tok = Par.materialize(
      Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
          col("doc_id"))
        .select(col("doc_id"), tokensOf(col("txt")).as("ts"))
        .cache())
    val dl = tok.select(col("doc_id"), size(col("ts")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    dl.crossJoin(broadcast(stats))
      .write.mode("overwrite").parquet(path + "/docstats")
    tok.select(col("doc_id"), explode(col("ts")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucket(col("term"), nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path + "/postings")
    tok.unpersist(false)
  }

  /** BM25 search over the written index: identical output to
    * [[bm25TopK]] through a physically different plan — the postings
    * scan carries a static partition filter (only the query terms'
    * buckets open) plus a pushed term filter, and document length /
    * corpus stats come from the tiny docstats side, not a corpus
    * re-tokenize.
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int, nBuckets: Int = 16,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val buckets = queryTerms.map(termBucketOf(_, nBuckets)).distinct
    val tf = spark.read.parquet(path + "/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(path + "/docstats")
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(floor(sum(col("w")) * 10000).cast("long").as("score_bp"))
    val top = scored.orderBy(desc("score_bp"), asc("doc_id")).limit(k)
    // BOUNDED window: k-sized by the limit above (see bm25Search)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score_bp"), asc("doc_id"))
    top.withColumn("rn", row_number().over(w).cast("int"))
  }
}
