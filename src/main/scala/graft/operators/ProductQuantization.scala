package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the canonical
  * vector-compression layer for billion-scale ANN: split each d-dim
  * vector into m subspaces, k-means each subspace independently, and
  * store per-vector only the m one-byte code ids. A 64-float
  * embedding (256 B) becomes m=4 codes (4 B); search runs against an
  * m x k distance TABLE computed once per query (asymmetric distance
  * computation, ADC), never against the original floats.
  *
  * Scale shape: all m subspaces train SIMULTANEOUSLY in one pipeline
  * — the subspace id is a column, not a loop, so one corpus scan per
  * Lloyd round covers every subspace. Assignment broadcasts the
  * m x k codebook (bounded: 4 x 16 x 16 doubles here); the corpus
  * never shuffles. The update shuffles (sub, code, pos) partial
  * averages — m x k x subDim keys regardless of corpus size — and
  * the per-round driver hop is the reassembled codebook (the q70
  * kmeans discipline: bounded, and it truncates the loop's lineage).
  * ADC joins the encoded corpus (m longs per row) to a broadcast
  * m x k distance table and sums EXACT integer micro-units, so
  * ranking is reproducible across engines and summation orders.
  */
object ProductQuantization {

  /** (id, sub, sv): the corpus exploded into m subvector rows. */
  private[graft] def subspaces(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, subDim: Int): DataFrame =
    // spread (r19, Par scaladoc): the m-way subvector explode must not
    // run on a single-split scan
    Par.spread(corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
        col("id"))
      .select(col("id"), explode(transform(
        sequence(lit(0L), lit(m - 1L)),
        j => struct(j.as("sub"),
          slice(col("v"), (j * subDim + 1).cast("int"), lit(subDim)).as("sv"))))
        .as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** Nearest code per (vector, subspace): distances rounded to 6dp
    * with (dist2, code) min-struct tie-break — the ivfAssign
    * reproducibility discipline, as one hash aggregate (no window).
    */
  private[graft] def assignCodes(cs: DataFrame, cb: DataFrame): DataFrame =
    cs.join(broadcast(cb), Seq("sub"))
      .withColumn("dist2", round(V.l2Squared(col("sv"), col("cv")), 6))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("dist2"), col("code"))).as("best"))
      .select(col("id"), col("sub"),
        col("best.code").as("code"), col("best.dist2").as("dist2"))

  /** Train the m x k codebook with `iters` Lloyd rounds per subspace,
    * seeded per subspace from the k lowest-id vectors' subvectors
    * (code = rank in id order — fully deterministic). Returns
    * (sub, code, cv: array<double>).
    */
  def trainCodebooks(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, subDim: Int, iters: Int): DataFrame = {
    val cs = Par.materialize(
      subspaces(corpus, idCol, vecCol, m, subDim).cache())
    // BOUNDED window: ranks only the k seed rows selected by
    // limit(k) below — k-sized, never the corpus
    val seedW = Window.orderBy(col("id"))
    val seeds = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(k)
      .withColumn("code", (row_number().over(seedW) - 1).cast("long"))
    var cb: DataFrame = subspaces(seeds, "id", "v", m, subDim)
      .join(seeds.select(col("id"), col("code")), Seq("id"))
      .select(col("sub"), col("code"),
        transform(col("sv"), x => x.cast("double")).as("cv"))
    for (_ <- 1 to iters) {
      // carry sv THROUGH the argmin aggregate (first() — sv is
      // functionally dependent on the (id, sub) group key) instead of
      // re-joining the assignment back to the corpus: that join is a
      // corpus-wide (id, sub) shuffle per Lloyd round, and it's pure
      // waste — the rows already flowed through the aggregate
      val assignSv = cs.join(broadcast(cb), Seq("sub"))
        .withColumn("dist2", round(V.l2Squared(col("sv"), col("cv")), 6))
        .groupBy(col("id"), col("sub"))
        .agg(min(struct(col("dist2"), col("code"))).as("best"),
          first(col("sv")).as("sv"))
      val sums = assignSv
        .select(col("sub"), col("best.code").as("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("x").cast("double")).as("mv"))
      val next = sums.groupBy(col("sub"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s("mv")).as("cv"))
      // m x k x subDim doubles: bounded driver hop, breaks lineage
      val rows = next.collect()
      cb = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), next.schema)
    }
    cb
  }

  /** Training diagnostic: per-(subspace, code) member count and
    * floored within-cell sum of squares over the FINAL encoding.
    */
  def trainSummary(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, subDim: Int, iters: Int): DataFrame = {
    val cb = trainCodebooks(spark, corpus, idCol, vecCol, m, k, subDim, iters)
    val cs = subspaces(corpus, idCol, vecCol, m, subDim)
    assignCodes(cs, cb)
      .groupBy(col("sub"), col("code"))
      .agg(count(lit(1)).as("n_vecs"),
        floor(sum(col("dist2"))).cast("long").as("wcss_floor"))
  }

  /** ADC top-k: encode the corpus, build the query's m x k distance
    * table in integer micro-units (round-6dp then x 1e6 — exact longs,
    * so the per-vector sum over m cells is order-independent), and
    * rank by (adc_u, id). The table is m x k rows — broadcast; the
    * only per-corpus work is an m-row-per-vector sum that map-side
    * combines.
    */
  def adcTopK(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, subDim: Int, iters: Int,
      queryId: Long, topK: Int): DataFrame = {
    val cb = trainCodebooks(spark, corpus, idCol, vecCol, m, k, subDim, iters)
    val cs = Par.materialize(
      subspaces(corpus, idCol, vecCol, m, subDim).cache())
    val enc = assignCodes(cs, cb).select(col("id"), col("sub"), col("code"))
    val qSub = cs.filter(col("id") === queryId)
      .select(col("sub"), transform(col("sv"), x => x.cast("double")).as("qv"))
    val dt = broadcast(cb).join(broadcast(qSub), Seq("sub"))
      .withColumn("d6", round(V.l2Squared(col("qv"), col("cv")), 6))
      .select(col("sub"), col("code"),
        round(col("d6") * 1e6).cast("long").as("d_u"))
    enc.join(broadcast(dt), Seq("sub", "code"))
      .groupBy(col("id")).agg(sum(col("d_u")).as("adc_u"))
      .filter(col("id") =!= queryId)
      .orderBy(asc("adc_u"), asc("id")).limit(topK)
      .select(col("id").as("neighbor_id"), col("adc_u"))
  }
}
