package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Approximate/exact nearest-neighbor search over embedding columns.
  *
  * Scale design: the query side is broadcast (queries are few); the
  * corpus is scanned once with per-row cosine compute inside codegen.
  * The IVF variant prunes the scan to the probed clusters — at 100 TB
  * the corpus would be written partitioned by cluster id so Catalyst
  * partition-prunes the parquet scan to the probe set.
  */
object Similarity {

  /** Exact brute-force top-k by cosine: every query against the full
    * corpus. Deterministic output: ties on the rounded similarity are
    * broken by corpus id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(V.cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rn"))
  }

  /** IVF assignment: each vector is assigned to its nearest centroid
    * (by squared L2; ties broken by centroid id). Centroids are a
    * small DataFrame — broadcast. At scale, write the corpus
    * partitioned by cluster_id and probe-prune.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cent = centroids.select(col(centroidIdCol).as("centroid_id"),
      col(centroidVecCol).as("cv"))
    val scored = c.join(broadcast(cent))
      .withColumn("dist2", round(V.l2Squared(col("v"), col("cv")), 6))
    val w = Window.partitionBy(col("id"))
      .orderBy(asc("dist2"), asc("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("centroid_id").as("cluster_id"), col("dist2"))
  }

  /** IVF top-k with nprobe: search only the query's nearest `nprobe`
    * clusters. Approximate — recall depends on nprobe.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val corpusAssigned = ivfAssign(corpus, centroids, idCol, vecCol,
      centroidIdCol, centroidVecCol)
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cv_full")), Seq("id"))
    val cent = centroids.select(col(centroidIdCol).as("centroid_id"),
      col(centroidVecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probe = broadcast(q).join(broadcast(cent))
      .withColumn("dist2", round(V.l2Squared(col("qv"), col("cv")), 6))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(asc("dist2"), asc("centroid_id"))
    val probed = probe.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("cluster_id"))
    val scored = probed.join(corpusAssigned, Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", round(V.cosine(col("qv"), col("cv_full")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"))
  }

  /** Random-hyperplane LSH bucketing for cosine: sign bits of dot
    * products against fixed hyperplanes form a bucket key; near
    * vectors collide with high probability. Hyperplane values are
    * deterministic constants so results are reproducible anywhere.
    */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
      hyperplanes: Seq[Seq[Double]]): DataFrame = {
    val bits = hyperplanes.zipWithIndex.map { case (h, i) =>
      val hv = array(h.map(lit): _*)
      when(V.dot(col(vecCol), hv) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      bits.reduce(_ + _).as("bucket"))
  }
}
