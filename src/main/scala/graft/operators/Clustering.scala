package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) for IVF centroid training.
  *
  * The IVF operators (`Similarity.ivfAssign`/`ivfTopK`) take centroids
  * as an input; until now the declared queries seeded them with the
  * first k vectors. This trains real centroids, in the canonical
  * Spark shape (the same structure MLlib's KMeans uses):
  *
  *  - **Assignment** is a broadcast join against the k centroids —
  *    the corpus never shuffles; each row computes k squared-L2
  *    distances and keeps the argmin (ties broken by centroid id;
  *    distances rounded to 6dp so the argmin is reproducible across
  *    engines — same discipline as `Similarity.ivfAssign`).
  *  - **Update** is a per-(cluster, dimension) two-phase average:
  *    `posexplode` fans each vector into (cluster, pos, x) rows whose
  *    partial sums combine map-side, so the shuffle moves only
  *    k x dim x tasks partial states, not the corpus. The new
  *    centroids are reassembled with a sorted `collect_list`.
  *  - Each round's centroids are ~k x dim doubles — collected to the
  *    driver (bounded, documented: 8 x 64 here) and re-broadcast,
  *    which also truncates the iteration's lineage the way the
  *    driver-side loop in MLlib does.
  *
  * Empty clusters are dropped (no members -> no average), matching
  * the SQL formulation in the oracle.
  */
object Clustering {

  /** Train k centroids with `iters` Lloyd rounds from a deterministic
    * seed (the k lowest-id vectors, centroid ids 0..k-1 in id order).
    * Returns the final assignment: (id, cluster_id, dist2).
    */
  def kmeansAssign(spark: SparkSession, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    Similarity.ivfAssign(c,
      kmeansCentroids(spark, corpus, idCol, vecCol, k, iters),
      "id", "v", "centroid_id", "cv")
  }

  /** The TRAINED centroids themselves — (centroid_id, cv) after
    * `iters` Lloyd rounds. The IVF family takes centroids as an
    * input, so this is the piece that upgrades an index from
    * arbitrary seed vectors to real coarse centroids (which is what
    * makes residual PQ coding pay — see ResidualRecallProbe /
    * PLANS.md).
    */
  def kmeansCentroids(spark: SparkSession, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    // deterministic seed: k lowest ids, centroid_id = rank in id order.
    // BOUNDED window: ranks the k seed rows AFTER limit(k) — k-sized,
    // never corpus-sized (a constant partition key cannot state this:
    // Spark 4's EliminateWindowPartitions folds it away; GraftSession
    // documents the engine-wide suppression of this warning class)
    val seedW = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    var cents: DataFrame = c.orderBy(col("id")).limit(k)
      .withColumn("centroid_id", (row_number().over(seedW) - 1).cast("long"))
      .select(col("centroid_id"),
        transform(col("v"), x => x.cast("double")).as("cv"))
    for (_ <- 1 to iters) {
      val assign =
        Similarity.ivfAssign(c, cents, "id", "v", "centroid_id", "cv")
      val sums = assign.join(c, "id")
        .select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
      val next = sums.groupBy(col("cluster_id").as("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s("m")).as("cv"))
      // k x dim doubles: bounded driver hop, breaks the loop's lineage
      val rows = next.collect()
      cents = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), next.schema)
    }
    cents
  }

  /** Per-cluster training summary: size and floor(within-cluster sum
    * of squares) — the convergence diagnostic a training loop tracks.
    */
  def kmeansSummary(spark: SparkSession, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int): DataFrame =
    kmeansAssign(spark, corpus, idCol, vecCol, k, iters)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        floor(sum(col("dist2"))).cast("long").as("wcss_floor"))

  /** Per-group embedding centroid in long form (grp, dim, n_vectors,
    * value): one shuffle carrying (grp, dim) partial sums with
    * map-side combine — output cardinality is |groups| x dims no
    * matter the corpus size. The group-profile primitive (per-source
    * drift, per-cluster summaries) for embedding analytics.
    */
  def groupCentroids(vecs: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vecs.select(col(groupCol).as("grp"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n_vectors"),
        (floor(avg(col("col")) * 10000) / 10000.0).as("value"))
      .select(col("grp"), col("pos").cast("long").as("dim"),
        col("n_vectors"), col("value"))
}
