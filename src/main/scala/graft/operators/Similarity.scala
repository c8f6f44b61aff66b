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
    // spread (r19, Par scaladoc): the broadcast join parallelizes over
    // the STREAM (corpus) side's partitions — a single-split scan
    // would run every query x corpus cosine on one core
    val c = Par.spread(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      col("neighbor_id"))
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
    // spread (r19): the per-(vector, centroid) distance grid runs on
    // the corpus side's partitions (Par scaladoc)
    val c = Par.spread(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), col("id"))
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

  /** Write the corpus as an IVF index: each vector assigned to its
    * nearest centroid and the table written partitioned by
    * cluster_id. This is the layout that makes probe-pruned search a
    * partition-pruned scan: at 100 TB a 2-of-1024-probe query reads
    * ~0.2% of the files.
    *
    * Files per cluster are proportional to cluster size
    * (ceil(rows / targetRowsPerFile), hash-salted within the
    * cluster): real IVF cluster sizes are Zipf-ish, and a plain
    * repartition(cluster_id) would funnel the hot cluster into one
    * straggler task writing one monster file. The narrow
    * (id, cluster_id) assignment is cached as the materialization
    * boundary so the count pass and the write pass assign only once;
    * a cluster deployment writes the assignment to a table instead.
    */
  def ivfIndexWrite(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String, path: String,
      targetRowsPerFile: Long = 1L << 20): Unit =
    writeAssigned(corpus, centroids, idCol, vecCol, centroidIdCol,
      centroidVecCol, path, targetRowsPerFile, "overwrite")

  /** Incremental index maintenance: assign NEW vectors against the
    * centroids the index was built with and APPEND them into the
    * partitioned layout — cluster directories gain files, nothing is
    * rewritten, and the unchanged search path prunes over the union.
    * Centroid retraining means a new index version (the
    * signature-store lifecycle analog), never an in-place mix.
    */
  def ivfIndexAppend(newVecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String, path: String,
      targetRowsPerFile: Long = 1L << 20): Unit =
    writeAssigned(newVecs, centroids, idCol, vecCol, centroidIdCol,
      centroidVecCol, path, targetRowsPerFile, "append")

  private def writeAssigned(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String, path: String,
      targetRowsPerFile: Long, mode: String,
      extra: Option[DataFrame] = None): Unit = {
    val assign = Par.materialize(
      ivfAssign(corpus, centroids, idCol, vecCol,
          centroidIdCol, centroidVecCol)
        .select(col("id"), col("cluster_id"))
        .cache())
    // optional per-id payload columns (e.g. PQ codes) stored alongside
    // the vector inside the partitioned layout
    val extraCols = extra.toSeq.flatMap(_.columns).filterNot(_ == "id")
    try {
      val counts = assign.groupBy(col("cluster_id"))
        .agg(ceil(count(lit(1)) / targetRowsPerFile.toDouble)
          .cast("int").as("__n_files"))
      val base = assign
        .join(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
      val salted = extra.fold(base)(e => base.join(e, Seq("id")))
        .join(broadcast(counts), Seq("cluster_id"))
        .withColumn("__salt",
          pmod(hash(col("id")), greatest(col("__n_files"), lit(1))))
      // explicit partition count: AQE coalescing would merge the salt
      // buckets back into few tasks and re-create the straggler file
      val nShuffle = math.max(
        corpus.sparkSession.sessionState.conf.numShufflePartitions,
        counts.agg(sum(col("__n_files"))).head().getLong(0).toInt)
      salted
        .repartition(nShuffle, col("cluster_id"), col("__salt"))
        .select((Seq(col("id"), col("v")) ++ extraCols.map(col) :+
          col("cluster_id")): _*)
        .write.mode(mode).partitionBy("cluster_id").parquet(path)
    } finally assign.unpersist()
  }

  /** IVF x PQ composed index — the layout a 100 TB ANN deployment
    * actually runs (Jegou et al. 2011 §V, "IVFADC"): the corpus is
    * partitioned by IVF cluster (ivfIndexWrite's pruned layout) and
    * each row additionally stores its m-byte PQ code array, so the
    * search path never scores raw floats until the final re-rank.
    * Layout under `path`: `index/cluster_id=<c>` (id, v, codes),
    * `codebook` (sub, code, cv), `centroids` (centroid_id, cv) —
    * codebook and centroids persist WITH the index because codes are
    * meaningless under any other codebook (the signature-store
    * params-marker discipline, expressed as co-located tables).
    */
  private def pqStoreParams(m: Int, kCodes: Int, subDim: Int,
      residual: Boolean = false): String =
    s"m=$m,kCodes=$kCodes,subDim=$subDim" +
      (if (residual) ",residual" else "")

  /** (id, rv): each vector minus its assigned IVF centroid — the
    * residual Jégou et al. 2011 §V actually quantizes. The published
    * rationale: displacements from TRAINED coarse centroids are small
    * and share one codebook across clusters. Whether that pays is a
    * property of the DATA — on this repo's near-isotropic synthetic
    * embeddings the measured recall gain is noise-to-negative
    * (q244 vs q235; tools.ResidualRecallProbe sweeps the full
    * centroid-kind x coding 2x2 — PLANS.md) — which is exactly why
    * both codings exist behind one flag and one audit. Components are
    * exact double differences of the float inputs, so both engines
    * reproduce them bit-for-bit.
    */
  private[graft] def residualVectors(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String): DataFrame = {
    val cent = centroids.select(col(centroidIdCol).as("cluster_id"),
      col(centroidVecCol).as("ccv"))
    ivfAssign(corpus, centroids, idCol, vecCol, centroidIdCol,
        centroidVecCol)
      .select(col("id"), col("cluster_id"))
      .join(broadcast(cent), Seq("cluster_id"))
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
        Seq("id"))
      .select(col("id"),
        zip_with(col("v"), col("ccv"),
          (x, y) => x.cast("double") - y.cast("double")).as("rv"))
  }

  def ivfPqIndexWrite(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String,
      m: Int, kCodes: Int, subDim: Int, iters: Int,
      path: String, targetRowsPerFile: Long = 1L << 20,
      residual: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    // invalidate FIRST (the signature-store markerDelete-first
    // discipline): codebook, centroids, and index are three separate
    // overwrites, and a crash between any two would otherwise leave a
    // mixed-generation store whose per-table _SUCCESS files all look
    // valid — e.g. an old index decoded against a new codebook. With
    // the marker dropped up front, any partial write fails
    // ivfPqIndexComplete and forces a rebuild.
    Dedup.markerDelete(path)
    // residual mode trains AND encodes on (v - centroid(v)); the
    // stored codes are then displacement codes, and search must build
    // its distance tables from the query's residual per probed cluster
    val (codeCorpus, cIdCol, cVecCol) =
      if (residual)
        (residualVectors(corpus, centroids, idCol, vecCol,
          centroidIdCol, centroidVecCol), "id", "rv")
      else (corpus, idCol, vecCol)
    val cb = ProductQuantization.trainCodebooks(
      spark, codeCorpus, cIdCol, cVecCol, m, kCodes, subDim, iters)
    cb.write.mode("overwrite").parquet(s"$path/codebook")
    centroids.select(col(centroidIdCol).as("centroid_id"),
        col(centroidVecCol).as("cv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    // per-id code array ordered by subspace (sub = array position)
    val codes = ProductQuantization.assignCodes(
        ProductQuantization.subspaces(codeCorpus, cIdCol, cVecCol, m, subDim), cb)
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s("code")).as("codes"))
    writeAssigned(corpus, centroids, idCol, vecCol, centroidIdCol,
      centroidVecCol, s"$path/index", targetRowsPerFile, "overwrite",
      extra = Some(codes))
    // all three tables committed: publish the store-level marker
    Dedup.markerWrite(path, pqStoreParams(m, kCodes, subDim, residual))
  }

  /** Build-if-absent guard for ivfPqIndexWrite: all three tables are
    * committed AND the store-level marker carries the requested
    * (m, kCodes, subDim) — the signature-store params-marker
    * discipline. The params live in the marker, written after the
    * last table commit, not reverse-engineered from the stored
    * codebook: inference via countDistinct(code) falsely rejects a
    * valid store whose Lloyd round dropped an empty cell (legal for
    * kCodes > corpus diversity), and per-table _SUCCESS files alone
    * cannot detect a crash between the three overwrites. A stale or
    * partial store must trigger a rebuild, never a silently-reused
    * mismatched one.
    */
  def ivfPqIndexComplete(spark: org.apache.spark.sql.SparkSession,
      path: String, m: Int, kCodes: Int, subDim: Int,
      residual: Boolean = false): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("index", "codebook", "centroids").forall(t =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$t/_SUCCESS"))) &&
      Dedup.markerRead(path).exists(
        _.trim == pqStoreParams(m, kCodes, subDim, residual))
  }

  /** Incremental maintenance for the IVFADC index — the append leg:
    * new vectors are PQ-encoded against the STORED codebook and
    * cluster-assigned against the STORED centroids, then appended
    * into the partitioned layout (cluster directories gain files,
    * nothing is rewritten) — so the streamed-into index is
    * search-ready immediately, with no re-encode pass. The geometry
    * guard refuses a store whose marker does not carry the requested
    * (m, kCodes, subDim): codes encoded under one codebook are
    * meaningless under another, and codebook retraining means a new
    * index version (the signature-store lifecycle), never an
    * in-place mix. Ids must be new to the index (the admission
    * contract, as for signatureStoreAppend); the caller dedups —
    * e.g. an at-least-once micro-batch anti-joins against stored ids
    * before appending.
    */
  def ivfPqIndexAppend(spark: org.apache.spark.sql.SparkSession,
      newVecs: DataFrame, idCol: String, vecCol: String,
      m: Int, kCodes: Int, subDim: Int, path: String,
      targetRowsPerFile: Long = 1L << 20,
      residual: Boolean = false): Unit = {
    require(ivfPqIndexComplete(spark, path, m, kCodes, subDim, residual),
      s"IVFADC index at $path is incomplete or was built with different " +
        s"parameters than (${pqStoreParams(m, kCodes, subDim, residual)}) — refusing to append")
    val cb = spark.read.parquet(s"$path/codebook")
    val cents = spark.read.parquet(s"$path/centroids")
    val (codeVecs, cIdCol, cVecCol) =
      if (residual)
        (residualVectors(newVecs, cents, idCol, vecCol,
          "centroid_id", "cv"), "id", "rv")
      else (newVecs, idCol, vecCol)
    val codes = ProductQuantization.assignCodes(
        ProductQuantization.subspaces(codeVecs, cIdCol, cVecCol, m, subDim), cb)
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s("code")).as("codes"))
    writeAssigned(newVecs, cents, idCol, vecCol, "centroid_id", "cv",
      s"$path/index", targetRowsPerFile, "append", extra = Some(codes))
  }

  /** Retention maintenance for the IVFADC index — the delete leg of
    * the lifecycle (write / append / search / vacuum): vectors of
    * deleted or re-embedded documents are removed so they stop
    * appearing in top-k lists, WITHOUT a full rebuild. The index is
    * partitioned by cluster_id, so deletion is partition-local:
    *
    *  1. a column-pruned (id, cluster_id) scan joined against the
    *     delete set finds the AFFECTED clusters (bounded driver hop —
    *     at most one cluster id per deleted key);
    *  2. survivors of only those clusters stage to a sibling dir
    *     (partition-pruned scan: untouched clusters are never read);
    *  3. the affected cluster directories swap under the dropped
    *     store marker, CHECKING every FileSystem return (the
    *     signature-store vacuum discipline) — a failed delete/rename
    *     throws with the marker still dropped, so the next reader is
    *     forced into the documented fallback: rebuild.
    *
    * Untouched cluster directories are never read, staged, or
    * renamed — byte-identical before and after. Codes and the
    * codebook are untouched: deletion never re-encodes. Cost: one
    * narrow scan of (id, cluster_id) plus a rewrite of the affected
    * clusters only — at 100 TB with 1024 clusters, deleting a batch
    * touching 10 clusters rewrites ~1% of the index.
    */
  def ivfPqIndexVacuum(spark: org.apache.spark.sql.SparkSession,
      removedIds: DataFrame, idCol: String,
      m: Int, kCodes: Int, subDim: Int, path: String,
      residual: Boolean = false): Unit = {
    require(ivfPqIndexComplete(spark, path, m, kCodes, subDim, residual),
      s"IVFADC index at $path is incomplete or was built with different " +
        s"parameters than (${pqStoreParams(m, kCodes, subDim, residual)}) — refusing to vacuum")
    val ids = removedIds.select(col(idCol).as("id"))
    // narrow (id, cluster_id) scan: the codes and the 16x-wider float
    // vector column stay columnar-pruned out of the affected-cluster
    // probe; the delete set broadcasts (it is batch-sized by nature)
    val affected = spark.read.parquet(s"$path/index")
      .select(col("id"), col("cluster_id").cast("string").as("cluster_id"))
      .join(broadcast(ids), Seq("id"))
      .select(col("cluster_id")).distinct()
      .collect().map(_.getString(0)).sorted
    if (affected.isEmpty) return
    // survivors of affected clusters only — partition-pruned scan
    spark.read.parquet(s"$path/index")
      .filter(col("cluster_id").isin(affected.toSeq: _*))
      .join(broadcast(ids), Seq("id"), "left_anti")
      .write.mode("overwrite").partitionBy("cluster_id")
      .parquet(s"$path/index_stage")
    Dedup.markerDelete(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.foreach { c =>
      val live = new org.apache.hadoop.fs.Path(s"$path/index/cluster_id=$c")
      val stage = new org.apache.hadoop.fs.Path(s"$path/index_stage/cluster_id=$c")
      if (!fs.delete(live, true) && fs.exists(live))
        throw new java.io.IOException(
          s"IVFADC vacuum: delete of $live failed; completion marker " +
            "remains dropped — index requires rebuild")
      // a fully-emptied cluster has no staged dir: the delete IS the swap
      if (fs.exists(stage) && !fs.rename(stage, live))
        throw new java.io.IOException(
          s"IVFADC vacuum: rename $stage -> $live failed; completion " +
            "marker remains dropped — index requires rebuild")
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/index_stage"), true)
    Dedup.markerWrite(path, pqStoreParams(m, kCodes, subDim, residual))
  }

  /** Centroid refresh for the IVFADC index — the REBALANCE leg that
    * completes the lifecycle (write / append / search / vacuum /
    * rebalance): after heavy append+vacuum churn the coarse centroids
    * drift from the data, so fixed-nprobe recall decays (the right
    * neighbors sit in clusters the probe no longer ranks first).
    * Retrains k coarse centroids from the CURRENT stored vectors
    * (Clustering.kmeansCentroids — deterministic seed, `kmIters`
    * Lloyd rounds), reassigns every stored row, and rewrites the
    * partitioned layout.
    *
    * What it deliberately does NOT do: re-encode. Raw-mode PQ codes
    * quantize the vectors themselves, independent of any centroid, so
    * the stored codes (and the codebook) are carried over
    * byte-for-byte — rebalance pays one layout rewrite, never a
    * training+encode pass over the corpus. Residual-coded stores are
    * REFUSED: their codes quantize (v − centroid(v)), so new
    * centroids invalidate every code and the honest operation is a
    * full `ivfPqIndexWrite` rebuild.
    *
    * Commit discipline (the vacuum/signature-store ladder): the new
    * layout and centroids stage to sibling dirs while searchers keep
    * the committed index; the marker drops only when the swap begins,
    * every FileSystem return is checked, and a failure leaves the
    * marker dropped so the next reader is forced into the documented
    * fallback (rebuild) instead of a mixed-generation read.
    *
    * Acceptance is MEASURED, not assumed: q274 runs the q235 recall
    * audit on the same churned corpus under stale vs rebalanced
    * centroids and the driver hash pins both curves.
    *
    * Concurrency contract, stated explicitly (the round-12 OCC work
    * on [[graft.operators.VersionedTable.commitMaintenance]] does
    * NOT apply here, by design): this store commits via the marker
    * ladder, not versioned manifests, so there is no version to
    * conflict-merge against. Rebalance assumes a SINGLE maintainer —
    * two concurrent maintenance runs are a deployment error, and the
    * ladder bounds the damage rather than serializing them: whoever
    * swaps second finds the marker already dropped, every FS return
    * is checked, and any interleaving or crash leaves the marker
    * down, forcing the next reader into the documented rebuild
    * fallback — never a mixed-generation read. Appends/searches
    * racing a rebalance keep reading the committed generation until
    * the swap's marker re-publish, same as vacuum.
    */
  def ivfPqIndexRebalance(spark: org.apache.spark.sql.SparkSession,
      kClusters: Int, kmIters: Int, m: Int, kCodes: Int, subDim: Int,
      path: String, targetRowsPerFile: Long = 1L << 20): Unit = {
    require(ivfPqIndexComplete(spark, path, m, kCodes, subDim, residual = false),
      s"IVFADC index at $path is incomplete, residual-coded, or was built " +
        s"with different parameters than (${pqStoreParams(m, kCodes, subDim)}) " +
        "— refusing to rebalance (residual stores must rebuild: their codes " +
        "quantize against the centroids being replaced)")
    val stored = spark.read.parquet(s"$path/index")
    val vecs = stored.select(col("id"), col("v"))
    val codes = stored.select(col("id"), col("codes"))
    val newCents = Clustering.kmeansCentroids(spark, vecs, "id", "v",
      kClusters, kmIters)
    // stage while the committed index stays searchable
    newCents.select(col("centroid_id"), col("cv"))
      .write.mode("overwrite").parquet(s"$path/centroids_stage")
    writeAssigned(vecs, newCents, "id", "v", "centroid_id", "cv",
      s"$path/index_stage", targetRowsPerFile, "overwrite",
      extra = Some(codes))
    Dedup.markerDelete(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("index", "centroids").foreach { t =>
      val live = new org.apache.hadoop.fs.Path(s"$path/$t")
      val stage = new org.apache.hadoop.fs.Path(s"$path/${t}_stage")
      if (!fs.delete(live, true) && fs.exists(live))
        throw new java.io.IOException(
          s"IVFADC rebalance: delete of $live failed; completion marker " +
            "remains dropped — index requires rebuild")
      if (!fs.rename(stage, live))
        throw new java.io.IOException(
          s"IVFADC rebalance: rename $stage -> $live failed; completion " +
            "marker remains dropped — index requires rebuild")
    }
    Dedup.markerWrite(path, pqStoreParams(m, kCodes, subDim))
  }

  /** Search over an ivfPqIndexWrite index: probe selection becomes a
    * static partition filter (only nprobe cluster directories are
    * opened — the ivfTopKIndexed pruning), candidates are scored by
    * ADC over their STORED codes against a broadcast m x k integer
    * micro-unit distance table (the adcTopK arithmetic — exact longs,
    * order-independent), the per-query shortlist of `shortlistN` best
    * ADC candidates is cut, and only that shortlist is re-ranked by
    * exact cosine over the original vectors. Geometry (m, subDim) is
    * read back from the stored codebook, never re-passed — a caller
    * cannot search with mismatched PQ parameters.
    *
    * Scale shape: per query the scan opens nprobe directories; ADC
    * joins a broadcast table of queries x m x kCodes rows; the only
    * shuffle carries (query_id, id) partial ADC sums; exact cosine
    * touches shortlistN rows per query, not the cluster.
    */
  def ivfPqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, shortlistN: Int,
      residual: Boolean = false): DataFrame =
    ivfPqTopKSweep(spark, path, queries, idCol, vecCol, k,
      Seq((nprobe, shortlistN)), residual).head

  /** (m, subDim) of a committed store, parsed from the params marker
    * (zero Spark jobs), falling back to a 1-row codebook aggregate for
    * marker-less stores. The geometry read was one driver-side job per
    * SEARCH (guide §5: driver actions in query paths) — the recall
    * audits run 5-6 searches per query, each paying it again for the
    * same store.
    */
  private def pqGeometry(path: String, cb: DataFrame): (Int, Int) = {
    val fromMarker = Dedup.markerRead(path).flatMap { s =>
      val kv = s.trim.split(",").iterator.filter(_.contains("="))
        .map { p => val a = p.split("=", 2); a(0).trim -> a(1).trim }.toMap
      try for (m <- kv.get("m").map(_.toInt);
               sd <- kv.get("subDim").map(_.toInt)) yield (m, sd)
      catch { case _: NumberFormatException => None }
    }
    fromMarker.getOrElse {
      val geo = cb.agg(max(col("sub")).as("ms"),
        max(size(col("cv"))).as("sd")).head()
      (geo.getLong(0).toInt + 1, geo.getInt(1))
    }
  }

  /** [[ivfPqTopK]] at SEVERAL (nprobe, shortlistN) operating points
    * over one store and query set — the recall-audit shape (q235/
    * q244/q274). Per-setting results are identical to independent
    * ivfPqTopK calls (same plan tail per setting), but the fixed
    * driver work is paid ONCE for the whole sweep instead of per
    * setting: one geometry read (from the marker — usually no job at
    * all) and ONE probe-ranking collect at max(nprobe), from which
    * every setting's probed-directory set is derived on the driver
    * (cluster c is probed at nprobe=np iff some query ranks c within
    * np, i.e. min-over-queries rank <= np). Before: 2 serial driver
    * jobs per setting; after: <=1 for the sweep (guide §5).
    */
  def ivfPqTopKSweep(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, settings: Seq[(Int, Int)],
      residual: Boolean = false): Seq[DataFrame] = {
    require(settings.nonEmpty, "at least one (nprobe, shortlistN) setting")
    val cb = spark.read.parquet(s"$path/codebook")
    val (m, subDim) = pqGeometry(path, cb)
    val cents = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probe = broadcast(q).join(broadcast(cents))
      .withColumn("dist2", round(V.l2Squared(col("qv"), col("cv")), 6))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(asc("dist2"), asc("centroid_id"))
    val maxNp = settings.map(_._1).max
    val ranked = probe.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= maxNp)
      .select(col("query_id"), col("qv"), col("cv"),
        col("centroid_id").cast("string").as("cluster_id"), col("rn"))
    // bounded driver hop (nQueries x maxNp rows), ONCE for the sweep:
    // per-setting probed sets are derived from the collected ranking
    val clusterMinRn = ranked.groupBy(col("cluster_id"))
      .agg(min(col("rn")).as("mrn"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    // ONE index read shared by every setting's ADC scan and re-rank
    // scan: each spark.read.parquet is a driver file-index build plus
    // a footer/schema job — the sweep previously paid 2 per setting
    // (profiled as a chain of serial ~25 ms single-task jobs)
    val index = spark.read.parquet(s"$path/index")
    settings.map { case (nprobe, shortlistN) =>
      val probed = ranked.filter(col("rn") <= nprobe)
        .select(col("query_id"), col("qv"), col("cv"), col("cluster_id"))
      // static isin partition filter: Catalyst prunes to the probed
      // directories
      val probedIds = clusterMinRn.filter(_._2 <= nprobe).map(_._1)
      val corpus = index.filter(col("cluster_id").isin(probedIds.toSeq: _*))
      // distance table: raw mode keys per query (codes quantize raw
      // positions); residual mode keys per (query, probed cluster) —
      // stored codes quantize (v - centroid), so the query side must be
      // the query's OWN residual against that cluster's centroid. Still
      // broadcast-bounded: nQueries x nprobe x m x kCodes rows.
      val dt =
        if (residual) {
          val qres = probed.select(col("query_id"), col("cluster_id"),
            zip_with(col("qv"), col("cv"),
              (x, y) => x.cast("double") - y.cast("double")).as("rqv"))
          val qSub = qres.select(col("query_id"), col("cluster_id"),
              explode(transform(sequence(lit(0L), lit(m - 1L)),
                j => struct(j.as("sub"),
                  slice(col("rqv"), (j * subDim + 1).cast("int"),
                    lit(subDim)).as("qsv")))).as("e"))
            .select(col("query_id"), col("cluster_id"),
              col("e.sub").as("sub"), col("e.qsv").as("qsv"))
          broadcast(cb).join(broadcast(qSub), Seq("sub"))
            .withColumn("d6", round(V.l2Squared(col("qsv"), col("cv")), 6))
            .select(col("query_id"), col("cluster_id"), col("sub"),
              col("code"), round(col("d6") * 1e6).cast("long").as("d_u"))
        } else {
          val qSub = ProductQuantization.subspaces(q, "query_id", "qv", m, subDim)
            .select(col("id").as("query_id"), col("sub"),
              transform(col("sv"), x => x.cast("double")).as("qsv"))
          broadcast(cb).join(broadcast(qSub), Seq("sub"))
            .withColumn("d6", round(V.l2Squared(col("qsv"), col("cv")), 6))
            .select(col("query_id"), col("sub"), col("code"),
              round(col("d6") * 1e6).cast("long").as("d_u"))
        }
      // ADC branch reads CODES ONLY — the point of PQ at 100 TB: the
      // 64-float vector column (16x the codes) stays columnar-pruned
      // out of this scan (asserted in IvfIndexSpec); the shuffle
      // carries one (query_id, id, partial adc) row per candidate
      val member = probed.select(col("query_id"), col("cluster_id"))
        .join(corpus.select(col("cluster_id"), col("id"), col("codes")),
          Seq("cluster_id"))
        .filter(col("query_id") =!= col("id"))
      val dtKeys =
        if (residual) Seq("query_id", "cluster_id", "sub", "code")
        else Seq("query_id", "sub", "code")
      val adc = member
        .select(col("query_id"), col("cluster_id"), col("id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .join(broadcast(dt), dtKeys)
        .groupBy(col("query_id"), col("id"))
        .agg(sum(col("d_u")).as("adc_u"))
      val ws = Window.partitionBy(col("query_id"))
        .orderBy(asc("adc_u"), asc("id"))
      val short = adc.withColumn("srn", row_number().over(ws))
        .filter(col("srn") <= shortlistN)
        .select(col("query_id"), col("id"), col("adc_u"))
      // exact re-rank: the bounded shortlist (queries x shortlistN rows)
      // broadcasts onto a SECOND pruned scan that reads (id, v) only —
      // the original floats are touched for shortlist rows, never for
      // the whole probed cluster
      val rr = index.filter(col("cluster_id").isin(probedIds.toSeq: _*))
        .select(col("id"), col("v"))
        .join(broadcast(short), Seq("id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("cosine", round(V.cosine(col("qv"), col("v")), 4))
      val wk = Window.partitionBy(col("query_id"))
        .orderBy(desc("cosine"), asc("id"))
      rr.withColumn("rnk", row_number().over(wk))
        .filter(col("rnk") <= k)
        .select(col("query_id"), col("id").as("neighbor_id"),
          col("adc_u"), col("cosine"))
    }
  }

  /** IVF top-k over a written index (see ivfIndexWrite): the probe
    * set comes from the tiny query x centroid table, is collected
    * (bounded by nQueries * nprobe), and becomes a static `isin`
    * partition filter — Catalyst prunes the parquet scan to the
    * probed cluster directories before any file is opened. Same
    * output as ivfTopK.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String,
      k: Int, nprobe: Int): DataFrame = {
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
    // partition values are read back as strings (partition-column type
    // inference is disabled repo-wide), so prune and join on strings
    val probedIds = probed.select(col("cluster_id").cast("string"))
      .distinct().collect().map(_.getString(0))
    val corpus = spark.read.parquet(indexPath)
      .filter(col("cluster_id").isin(probedIds.toSeq: _*))
    val scored = probed.withColumn("cluster_id", col("cluster_id").cast("string"))
      .join(corpus, Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", round(V.cosine(col("qv"), col("v")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"))
  }

  /** Hard-negative mining for contrastive training (dense retriever /
    * embedding-model fine-tuning): for each anchor, the k
    * HIGHEST-cosine candidates strictly BELOW a near-duplicate
    * ceiling. Candidates at or above the ceiling are presumed
    * positives or duplicates — mining them as "negatives" poisons a
    * contrastive loss with false negatives, which is why the band
    * filter is part of the operator, not caller postprocessing.
    *
    * Scale shape: identical to ivfTopKIndexed — the probe set becomes
    * a static partition filter on the written index (only nprobe
    * cluster directories open per anchor), cosine runs in codegen
    * over the pruned scan, the ceiling test compares the ROUNDED
    * basis-point value as an exact long (engine-reproducible), and
    * the per-anchor top-k is a bounded window over probed candidates.
    */
  def hardNegatives(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String,
      k: Int, nprobe: Int, dupCeilingBp: Long): DataFrame = {
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
    val probedIds = probed.select(col("cluster_id").cast("string"))
      .distinct().collect().map(_.getString(0))
    val corpus = spark.read.parquet(indexPath)
      .filter(col("cluster_id").isin(probedIds.toSeq: _*))
    val scored = probed.withColumn("cluster_id", col("cluster_id").cast("string"))
      .join(corpus, Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", round(V.cosine(col("qv"), col("v")), 4))
      .withColumn("cosine_bp", round(col("cosine") * 10000).cast("long"))
      .filter(col("cosine_bp") < dupCeilingBp)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("id").as("negative_id"),
        col("cosine_bp"), col("rnk"))
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

  /** Deterministic md5-derived hyperplane constants in [-0.5, 0.5),
    * indexed (table, bit, dim). md5 mixing matters: a multiplicative
    * congruential stream makes the tables linearly correlated, and
    * pairs missed by one table are then missed by all of them
    * (measured: 80 correlated 4-bit tables leave recall holes that 16
    * independent ones don't).
    */
  def lshHyperplanes(tables: Int, bits: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until tables).map(t => (0 until bits).map(k => (0 until dim).map { j =>
      val hex = md.digest(s"hp:$t:$k:$j".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }))
  }

  /** Bucketed embedding near-dup pairs — the approximate scale path
    * for `Dedup.embeddingNearDupPairs`' exact all-pairs join.
    *
    * `tables` independent `bits`-bit hyperplane keys per vector; the
    * candidate join is an equi-join on (table_idx, bucket) — shuffle-
    * partitionable and AQE-skew-splittable, which is what makes it
    * schedulable at 100 TB where an all-pairs nested loop is not —
    * followed by an exact-cosine verify on candidates only, so
    * precision is always 1.0 and only recall is approximate.
    *
    * Recall economics are threshold-dependent (standard LSH result):
    * per-table collision probability is (1 - theta/pi)^bits. At the
    * real near-dup regime (cosine >= 0.9) a handful of tables gives
    * ~1.0 recall with n^2/2^bits candidate work; at permissive
    * thresholds like 0.4 (66 degrees) no parameterization beats
    * brute force on candidate count — use the exact operator there if
    * completeness is required.
    */
  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): cluster embeddings
    * around centroids, then remove semantic near-duplicates WITHIN
    * each cluster only — pairwise cosine is confined to cluster
    * members, the paper's trick that keeps semantic dedup out of the
    * all-pairs regime at corpus scale (the global all-pairs form is
    * the spec-only all-pairs verifier). Keep rule: a vector is
    * dropped iff some smaller-id member of its cluster is within
    * `threshold` cosine of it (greedy min-id canonical, the repo's
    * dedup convention). Output: one row per vector —
    * (id, cluster_id, is_kept).
    *
    * Scale: assignment is a broadcast-centroid scan; members are
    * pre-partitioned by cluster_id and cached so the within-cluster
    * self-join reuses ONE shuffle; pair volume is bounded by the
    * largest cluster, not the corpus (pick k accordingly — at 100 TB
    * the assignment rides the IVF index layout and each cluster joins
    * inside its own partition).
    */
  def semDedup(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String, centroidVecCol: String,
      threshold: Double): DataFrame = {
    // materialize (r19): the members cache feeds both self-join sides
    // and the final keep projection (Par scaladoc)
    val members = Par.materialize(
      ivfAssign(corpus, centroids, idCol, vecCol,
          centroidIdCol, centroidVecCol)
        .select(col("id"), col("cluster_id"))
        .join(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
        .repartition(col("cluster_id"))
        .cache())
    val dropped = members.as("a")
      .join(members.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("b.id") < col("a.id"))
      .filter(round(V.cosine(col("a.v"), col("b.v")), 4) >= threshold)
      .select(col("a.id").as("id"))
      .distinct()
    members.select(col("id"), col("cluster_id"))
      .join(dropped.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"),
        col("__dropped").isNull.as("is_kept"))
  }

  def lshBucketedPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int, tables: Int, dim: Int = 64): DataFrame = {
    val hps = lshHyperplanes(tables, bits, dim)
    // cache: v + norm feed the key projection and both verify joins.
    // spread + materialize (r19, Par scaladoc): the per-vector norm +
    // number-of-tables hyperplane dots must not run on a single-split
    // scan, and three consumers fan out of this cache concurrently
    val e = Par.materialize(
      Par.spread(emb.select(col(idCol).as("id"), col(vecCol).as("v")),
          col("id"))
        .withColumn("nrm", V.norm(col("v")))
        .cache())
    val keyCols = hps.map { tableHp =>
      tableHp.zipWithIndex.map { case (h, k) =>
        val hv = array(h.map(lit): _*)
        when(V.dot(col("v"), hv) >= 0, lit(1L << k)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    // pre-partitioned + cached: both self-join sides reuse one shuffle
    // (Catalyst does not reuse exchanges across self-join aliases)
    val keyed = Par.materialize(e.select(col("id"),
      posexplode(array(keyCols: _*)).as(Seq("table_idx", "bucket")))
      .repartition(col("table_idx"), col("bucket"))
      .cache())
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(e.select(col("id").as("id1"), col("v").as("v1"), col("nrm").as("nrm1")), Seq("id1"))
      .join(e.select(col("id").as("id2"), col("v").as("v2"), col("nrm").as("nrm2")), Seq("id2"))
      .withColumn("cosine", round(V.dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** Cross-set bucketed near-pair join — the embedding analog of
    * `Dedup.minhashLshPairsAcross`, and the scale path for eval-set
    * DECONTAMINATION by embedding: flag every corpus vector within
    * cosine >= threshold of ANY probe (eval) vector. The probe side
    * is small by nature, so its bucket keys BROADCAST — the corpus
    * pays one scan and zero shuffles for candidate generation; exact-
    * cosine verify touches candidates only (precision 1.0; recall per
    * the LSH economics documented on [[lshBucketedPairs]]). Output:
    * (probe_id, corpus_id, cosine).
    */
  def lshBucketedPairsAcross(probe: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      bits: Int, tables: Int, dim: Int = 64): DataFrame = {
    val hps = lshHyperplanes(tables, bits, dim)
    def prep(df: DataFrame, name: String): DataFrame =
      // spread + materialize (r19): see lshBucketedPairs
      Par.materialize(
        Par.spread(df.select(col(idCol).as(name), col(vecCol).as(s"v_$name")),
            col(name))
          .withColumn(s"nrm_$name", V.norm(col(s"v_$name")))
          .cache())
    def keyed(df: DataFrame, name: String): DataFrame = {
      val keyCols = hps.map { tableHp =>
        tableHp.zipWithIndex.map { case (h, k) =>
          val hv = array(h.map(lit): _*)
          when(V.dot(col(s"v_$name"), hv) >= 0, lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _)
      }
      df.select(col(name),
        posexplode(array(keyCols: _*)).as(Seq("table_idx", "bucket")))
    }
    val p = prep(probe, "probe_id")
    val c = prep(corpus, "corpus_id")
    val cand = broadcast(keyed(p, "probe_id"))
      .join(keyed(c, "corpus_id"), Seq("table_idx", "bucket"))
      .select(col("probe_id"), col("corpus_id"))
      .distinct()
    cand
      .join(p, Seq("probe_id"))
      .join(c, Seq("corpus_id"))
      .withColumn("cosine", round(
        V.dot(col("v_probe_id"), col("v_corpus_id")) /
          (col("nrm_probe_id") * col("nrm_corpus_id")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("probe_id"), col("corpus_id"), col("cosine"))
  }
}
