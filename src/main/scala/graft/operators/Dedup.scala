package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: signature computation (minhash / simhash /
  * fingerprint) is narrow per-row compute — it runs inside
  * whole-stage codegen with no shuffle, so a 100 TB corpus pays one
  * scan. Only the candidate-pair stage shuffles, and it shuffles
  * band keys / fingerprints (tiny) rather than documents. The final
  * verify joins fetch the shingle arrays for candidates only.
  *
  * Cache lifecycle: signature stages .cache() as a materialization
  * boundary (see PLANS.md); the entries live until the session drops
  * them. Callers running many dedup jobs in one session should
  * spark.catalog.clearCache() between jobs (Verify/Bench do); a
  * cluster deployment writes the signature stage to a table instead.
  */
object Dedup {

  /** Exact dedup: group identical content by fingerprint, keep the
    * lowest id as canonical. hash-groupBy — one shuffle of
    * (fingerprint, id) pairs only.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** All pairs with word-n-gram Jaccard similarity >= threshold,
    * found via an exploded shingle equi-join (pairs must share at
    * least one shingle). Quadratic in the per-shingle document
    * frequency, so postings longer than `maxDf` are dropped: one
    * boilerplate stop-shingle shared by 1M docs would otherwise emit
    * an O(df^2) pair blowup on a single key. The cap makes the
    * operator approximate for pairs whose ONLY shared shingles are
    * stop-shingles — those have near-zero Jaccard anyway. Dropped
    * posting counts are observable via the `ngram_df_cap` metric
    * (df.observe; surfaces in QueryExecutionListener / Spark UI).
    * Exact when maxDf exceeds the corpus' true max df (default covers
    * testdata's max of 25 by 40x). At scale, prefer minhashLshPairs
    * and keep this as the verifier.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Int = 1000): DataFrame = {
    // cache: the shingle arrays feed both the posting-list build and
    // the size lookup; without the boundary the split/slice transform
    // runs twice over the corpus. spread: the tokenize+shingle pass is
    // the expensive per-row stage — it must not run on a single-split
    // scan; materialize: three downstream stages fan out of this cache
    // concurrently under AQE (Par scaladoc). The emptiness guard sits
    // ABOVE the cache: below it, Catalyst alias-substitutes and pushes
    // the filter under the spread exchange, recomputing the shingle
    // transform single-task on the narrow scan (measured plan).
    val sh = Par.materialize(
      Par.spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")),
          col("id"))
        .select(col("id"), T.shingles(col("txt"), n).as("sh"))
        .cache())
      .filter(size(col("sh")) > 0)
    // group each shingle's sorted posting list once, then emit the
    // per-shingle id pairs directly — one shuffle (on shingle) plus
    // the pair-count aggregation, instead of a self-equi-join whose
    // both sides shuffle the exploded table
    // array_distinct: a duplicated id (degenerate input) would emit
    // self-pairs and double counts; distinct+sorted posting lists make
    // every emitted pair strictly increasing
    val postings = sh.select(col("id"), explode(col("sh")).as("s"))
      .groupBy(col("s")).agg(sort_array(array_distinct(collect_list(col("id")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .observe("ngram_df_cap",
        sum(when(size(col("ids")) > maxDf, 1L).otherwise(0L)).as("dropped_postings"),
        max(size(col("ids"))).as("max_df_seen"))
      .filter(size(col("ids")) <= maxDf)
    val cand = postings
      .select(posexplode(col("ids")).as(Seq("i", "id1")), col("ids"))
      .select(col("id1"), explode(slice(col("ids"), col("i") + 2,
        size(col("ids")))).as("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n_sh"))
    cand
      .join(sizes.as("s1"), col("id1") === col("s1.id"))
      .join(sizes.as("s2"), col("id2") === col("s2.id"))
      .withColumn("jaccard",
        floor(col("inter") / (col("s1.n_sh") + col("s2.n_sh") - col("inter")) * 10000) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Prefix-filtered n-gram Jaccard pairs (PPJoin-style, Xiao et al.,
    * "Efficient Similarity Joins for Near Duplicate Detection"):
    * identical output to [[ngramJaccardPairs]] — same pairs, same
    * scores — through a candidate stage that is EXACT yet far
    * smaller. Rank each document's shingles in the global
    * rarest-first canonical order (df asc, shingle asc) and index
    * only the first |s| - ceil(t*|s|) + 1 of them: any pair with
    * Jaccard >= t provably shares a shingle inside both prefixes
    * (their overlap o >= ceil(t*|s|) on both sides, and the smallest
    * common shingle in canonical order cannot sit in either suffix,
    * which holds only ceil(t*|s|)-1 elements). Posting lists are
    * built over prefixes only, so the quadratic per-shingle pair
    * blowup runs on each document's RAREST shingles — exactly where
    * df is smallest — instead of on every posting. No df cap is
    * needed: a boilerplate stop-shingle shared by 1M docs is by
    * construction in nobody's prefix (highest df = last in canonical
    * order) unless the threshold is so low the pair would verify
    * anyway. Verification joins the cached shingle arrays on the
    * candidate rows only (array_intersect — the q22 pattern).
    */
  def ngramJaccardPrefixPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    // spread + materialize + guard-above-cache: see ngramJaccardPairs
    val sh = Par.materialize(
      Par.spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")),
          col("id"))
        .select(col("id"), T.shingles(col("txt"), n).as("sh"))
        .cache())
      .filter(size(col("sh")) > 0)
    // Document frequencies come from a COUNT aggregate over the
    // exploded corpus — never a collected posting array: a boilerplate
    // stop-shingle shared by ~1M docs would make one multi-MB
    // collect_list row (the skew/OOM hazard a df cap exists to avoid
    // elsewhere), while its count row stays a dozen bytes and
    // map-side-combines. The df table joins back onto the exploded
    // corpus co-partitioned on the shingle, so the per-doc
    // rarest-first prefix selection costs one more (id-keyed) shuffle:
    // collect the (df, shingle) pairs, array_sort gives the canonical
    // (df asc, shingle asc) order, slice keeps the
    // |s| - ceil(t*|s|) + 1 prefix — no row_number window re-sort of
    // the exploded corpus anywhere. count(*) IS the distinct df here:
    // shingle arrays are distinct per doc (T.shingles) and ids are
    // unique (the corpus contract), so the exploded stream has one row
    // per (id, s) — a countDistinct would add an (s, id)-keyed
    // exchange for nothing.
    val exploded = sh.select(col("id"), explode(col("sh")).as("s"))
    val dfTable = exploded.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
    val prefix = exploded.join(dfTable, Seq("s"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("ranked"))
      // sh arrays are distinct, so size(ranked) = |s| exactly
      .select(col("id"), explode(slice(col("ranked"), lit(1),
        (size(col("ranked")) - ceil(size(col("ranked")) * threshold) + 1)
          .cast("int"))).as("e"))
      .select(col("id"), col("e").getField("s").as("s"))
    // posting lists over prefixes only; emit strictly-increasing pairs
    val cand = prefix
      .groupBy(col("s"))
      .agg(sort_array(array_distinct(collect_list(col("id")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(posexplode(col("ids")).as(Seq("i", "id1")), col("ids"))
      .select(col("id1"), explode(slice(col("ids"), col("i") + 2,
        size(col("ids")))).as("id2"))
      .distinct()
    // pin the verify join's parallelism with EXPLICIT repartitions
    // (r20): the candidate rows are tiny in bytes but each output row
    // pays an array_intersect over two full shingle arrays, so AQE's
    // byte-based coalescing squeezes the stage to 1-3 tasks while the
    // rest of the box idles (measured: q82 6.6 s with the default 1m
    // floor vs 2.5 s pinned). A user-specified partition count is
    // exempt from AQE coalescing, and matching the session shuffle
    // partitioning means the joins reuse these exchanges — no extra
    // shuffle, the verify stage just keeps its width.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    cand.repartition(par, col("id1"))
      .join(sh.as("a"), col("id1") === col("a.id"))
      .repartition(par, col("id2"))
      .join(sh.as("b"), col("id2") === col("b.id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("jaccard",
        floor(col("inter") /
          (size(col("a.sh")) + size(col("b.sh")) - col("inter")) * 10000) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** All pairs with n-gram CONTAINMENT >= threshold, where
    * C(A,B) = |A∩B| / min(|A|,|B|) (Broder's containment coefficient,
    * "On the resemblance and containment of documents", 1997). This
    * catches the doc-in-doc duplication Jaccard misses: a document
    * quoted whole inside a 10x-larger page has Jaccard <= 0.1 but
    * containment ~1.0 — the dominant near-dup mode in web-scraped
    * training corpora (boilerplate-wrapped article copies).
    *
    * Same physical shape as [[ngramJaccardPairs]]: one posting-list
    * shuffle on the shingle, pair-count aggregation, then a size
    * lookup join — candidates shuffle (shingle, id) pairs, never
    * documents. The df cap bounds the per-shingle quadratic blowup;
    * pairs whose only shared shingles are stop-shingles are the ones
    * a containment filter must NOT be trusted on anyway (boilerplate
    * containment is what the cap deliberately ignores).
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Int = 1000): DataFrame = {
    // spread + materialize + guard-above-cache: see ngramJaccardPairs
    val sh = Par.materialize(
      Par.spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")),
          col("id"))
        .select(col("id"), T.shingles(col("txt"), n).as("sh"))
        .cache())
      .filter(size(col("sh")) > 0)
    val postings = sh.select(col("id"), explode(col("sh")).as("s"))
      .groupBy(col("s")).agg(sort_array(array_distinct(collect_list(col("id")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .observe("containment_df_cap",
        sum(when(size(col("ids")) > maxDf, 1L).otherwise(0L)).as("dropped_postings"))
      .filter(size(col("ids")) <= maxDf)
    val cand = postings
      .select(posexplode(col("ids")).as(Seq("i", "id1")), col("ids"))
      .select(col("id1"), explode(slice(col("ids"), col("i") + 2,
        size(col("ids")))).as("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n_sh"))
    // inter*10000 and the min size are exact longs; their IEEE quotient
    // is correctly rounded, so floor lands on the integer grid the
    // oracle replays (the q21 discipline)
    cand
      .join(sizes.as("s1"), col("id1") === col("s1.id"))
      .join(sizes.as("s2"), col("id2") === col("s2.id"))
      .withColumn("containment",
        floor(col("inter") * 10000 / least(col("s1.n_sh"), col("s2.n_sh"))) / 10000.0)
      .filter(col("containment") >= threshold)
      .select(col("id1"), col("id2"), col("containment"))
  }

  /** MinHash + LSH near-dup pairs: shingle -> 16-hash signature ->
    * band buckets -> candidate pairs -> exact-Jaccard verify on the
    * candidates only (via array_intersect — no exploded join).
    *
    * This is the 100 TB path: signatures are a narrow map; the only
    * shuffle carries (band_key, id); the verify join touches candidate
    * rows only.
    */
  /** idCol must be unique (the standard corpus contract); duplicate
    * ids would duplicate verify-join rows.
    */
  /** Cached (id, sh, xi) signature stage shared by the LSH variants.
    * The cache is the materialization boundary: without it
    * CollapseProject inlines the md5 transform into every downstream
    * use and the hash runs k times per row (at cluster scale: write
    * the signature stage to a table instead).
    */
  private def minhashStage(docs: DataFrame, idCol: String, textCol: String,
      n: Int, corpusSized: Boolean = true): DataFrame = {
    // spread + materialize + guard-above-cache: see ngramJaccardPairs.
    // Returns the CACHED, unfiltered stage — callers owning the cache
    // lifecycle (the store writers) unpersist THIS frame; everything
    // else consumes the filtered view via minhashHashed.
    // corpusSized=false is the incremental/micro-batch leg: a spread
    // exchange + eager count on a dozen-row ingest batch is pure
    // per-batch overhead (measured +2 s on the streaming store dedup),
    // so batch-sized inputs keep the plain lazy cache.
    val base = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    val stage = (if (corpusSized) Par.spread(base, col("id")) else base)
      .select(col("id"), T.shingles(col("txt"), n).as("sh"))
      .withColumn("xi",
        graft.expressions.HashFunctions.md5_int_array32(col("sh")))
      .cache()
    if (corpusSized) Par.materialize(stage) else stage
  }

  private def emptyShGuard(stage: DataFrame): DataFrame =
    stage.filter(size(col("sh")) > 0)

  private def minhashHashed(docs: DataFrame, idCol: String, textCol: String,
      n: Int, corpusSized: Boolean = true): DataFrame =
    emptyShGuard(minhashStage(docs, idCol, textCol, n, corpusSized))

  /** (id, band_idx, band_key) rows from a hashed signature stage. */
  private def minhashBanded(hashed: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    hashed.withColumn("sig", T.minhashSignatureFromInts(col("xi")))
      .withColumn("bands", T.minhashBands(col("sig"), bands, rowsPerBand))
      .select(col("id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))

  /** Drop band buckets whose cardinality exceeds `maxBandDf` — the
    * skew guard for LSH candidate generation. A degenerate band key
    * (near-empty docs sharing a signature, boilerplate corpora)
    * otherwise emits an O(df²) candidate blowup on ONE key: the first
    * skew incident at 100 TB. The df is computed with a count
    * aggregate (no posting arrays — the shuffle carries one row per
    * distinct band key, map-side combined) and removed with an
    * anti-join against the (small by construction: at most
    * rows/maxBandDf keys) hot set. Dropped volume is observable via
    * the `lsh_band_cap` metric, mirroring `ngramJaccardPairs`'s
    * `ngram_df_cap`. Pairs whose ONLY shared bands are hot are lost —
    * the standard LSH cap approximation; exact when maxBandDf exceeds
    * the true max band df.
    */
  private def antiJoinHotBands(banded: DataFrame, maxBandDf: Int): DataFrame = {
    if (maxBandDf == Int.MaxValue) return banded
    val hot = banded.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("band_df"))
      .observe("lsh_band_cap",
        sum(when(col("band_df") > maxBandDf, col("band_df")).otherwise(0L))
          .as("dropped_band_rows"),
        max(col("band_df")).as("max_band_df_seen"))
      .filter(col("band_df") > maxBandDf)
      .select(col("band_idx"), col("band_key"))
    banded.join(hot, Seq("band_idx", "band_key"), "left_anti")
  }

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBandDf: Int = 1000): DataFrame = {
    val hashed = minhashHashed(docs, idCol, textCol, n)
    val sig = hashed.withColumn("sig", T.minhashSignatureFromInts(col("xi")))
      .withColumn("bands", T.minhashBands(col("sig"), bands, rowsPerBand))
    // pre-partition on the join keys and cache: the self-join's two
    // sides then BOTH satisfy the join's required distribution from
    // the one cached shuffle — without this, Catalyst does not reuse
    // the exchange across the a/b aliases and shuffles twice. The
    // hot-band count aggregate and its anti-join are both keyed on the
    // cached partitioning, so the cap adds no exchange.
    val banded = Par.materialize(sig.select(col("id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .repartition(col("band_idx"), col("band_key"))
      .cache())
    val kept = antiJoinHotBands(banded, maxBandDf)
    val cand = kept.as("a")
      .join(kept.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    // reuse the cached hashed frame for the verify joins (sh would
    // recompute shingling per join otherwise)
    val shCached = hashed.select(col("id"), col("sh"))
    val withSets = cand
      .join(shCached.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(shCached.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
    withSets
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        floor(col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")) * 10000) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Incremental cross-corpus dedup: near-dup pairs between a NEW
    * batch and an EXISTING corpus — the production shape at 100 TB,
    * where the daily ingest (GBs) is deduped against the accumulated
    * corpus (TBs) without ever self-joining the corpus.
    *
    * The new batch's band keys are BROADCAST, so the corpus pays one
    * scan and zero shuffles for candidate generation; only candidate
    * pairs (new_id, corpus_id) shuffle into the distinct + verify
    * stage. The corpus-side verify join is keyed on the (selective)
    * candidate ids — exactly the shape the session's runtime
    * bloom-filter injection prunes at cluster scale. On a real
    * deployment the corpus signature stage is precomputed and stored,
    * so the incremental run computes signatures for the batch only.
    *
    * Ids must be unique across BOTH inputs (the standard corpus
    * contract). Output: (new_id, corpus_id, jaccard >= threshold).
    */
  /** Broadcast the batch's band rows only when the batch is verifiably
    * small: the hint is gated on the (cached, so already-materialized)
    * batch row count instead of being forced. An oversized backfill
    * batch routed through the incremental path then degrades to a
    * shuffle join instead of OOMing the driver. Default gate:
    * 4M band rows ≈ low hundreds of MB — inside a healthy driver, far
    * beyond any sane incremental batch.
    */
  private def maybeBroadcastBatch(batchBands: DataFrame, hashedBatch: DataFrame,
      bands: Int, broadcastMaxBandRows: Long): DataFrame =
    if (hashedBatch.count() * bands <= broadcastMaxBandRows) broadcast(batchBands)
    else batchBands

  def minhashLshPairsAcross(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBandDf: Int = 1000,
      broadcastMaxBandRows: Long = 4000000L): DataFrame = {
    val hashedNew = minhashHashed(newDocs, idCol, textCol, n)
    val hashedCorpus = minhashHashed(corpus, idCol, textCol, n)
    val newSide = maybeBroadcastBatch(
      minhashBanded(hashedNew, bands, rowsPerBand)
        .withColumnRenamed("id", "new_id"),
      hashedNew, bands, broadcastMaxBandRows)
    val cand = newSide
      .join(antiJoinHotBands(
          minhashBanded(hashedCorpus, bands, rowsPerBand)
            .withColumnRenamed("id", "corpus_id"), maxBandDf),
        Seq("band_idx", "band_key"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    cand
      .join(hashedNew.select(col("id").as("new_id"), col("sh").as("sh1")), Seq("new_id"))
      .join(hashedCorpus.select(col("id").as("corpus_id"), col("sh").as("sh2")), Seq("corpus_id"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        floor(col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")) * 10000) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** Persisted MinHash signature store (the q42a/q81a index pattern
    * applied to dedup signatures): write the corpus' shingle arrays
    * and LSH band keys to parquet ONCE, so every later incremental
    * batch dedupes against STORED signatures — the corpus is never
    * re-tokenized or re-hashed. Layout: `path/shingles` = (id, sh),
    * `path/bands` = (id, band_idx, band_key). At 100 TB the store is
    * the only sane shape: signature compute costs one corpus scan
    * amortized over every future ingest batch.
    */
  // All marker/_SUCCESS probes go through the Hadoop FileSystem API
  // (never java.io.File): the store path is an object-store URI in the
  // 100 TB deployment, where java.io probes silently answer "absent"
  // and would make every completeness check a false negative.
  private def storeFs(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration), p)
  }

  private[operators] def markerDelete(path: String): Unit = {
    val (fs, p) = storeFs(path)
    fs.delete(new org.apache.hadoop.fs.Path(p, "_GRAFT_STORE_COMPLETE"), false)
  }

  private[operators] def markerWrite(path: String, content: String): Unit = {
    val (fs, p) = storeFs(path)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(p, "_GRAFT_STORE_COMPLETE"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private[operators] def markerRead(path: String): Option[String] = {
    val (fs, p) = storeFs(path)
    val m = new org.apache.hadoop.fs.Path(p, "_GRAFT_STORE_COMPLETE")
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r >= 0) { bytes.write(buf, 0, r); r = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  private def storeParams(n: Int, bands: Int, rowsPerBand: Int): String =
    s"n=$n,bands=$bands,rowsPerBand=$rowsPerBand"

  /** Store-level completion check: both per-table _SUCCESS markers AND
    * the store-level marker written after BOTH tables committed, whose
    * content must match the expected build parameters. The per-table
    * markers alone are not atomic as a pair — a crash between the two
    * overwrites, or a stale store built with different (n, bands,
    * rowsPerBand) under the same path, would otherwise present two
    * valid-looking tables of mixed generation or mismatched geometry.
    */
  def signatureStoreComplete(path: String, n: Int, bands: Int,
      rowsPerBand: Int): Boolean = {
    val (fs, p) = storeFs(path)
    fs.exists(new org.apache.hadoop.fs.Path(p, "shingles/_SUCCESS")) &&
      fs.exists(new org.apache.hadoop.fs.Path(p, "bands/_SUCCESS")) &&
      markerRead(path).exists(_.trim == storeParams(n, bands, rowsPerBand))
  }

  def signatureStoreWrite(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, path: String): Unit = {
    // invalidate first: a crash mid-overwrite must leave NO valid marker
    markerDelete(path)
    // unpersist must target the CACHED stage (Dataset.unpersist on a
    // derived view is a silent no-op)
    val stage = minhashStage(corpus, idCol, textCol, n)
    val hashed = emptyShGuard(stage)
    hashed.select(col("id"), col("sh"))
      .write.mode("overwrite").parquet(s"$path/shingles")
    minhashBanded(hashed, bands, rowsPerBand)
      .write.mode("overwrite").parquet(s"$path/bands")
    stage.unpersist(false)
    // both tables committed: publish the store-level marker + params
    markerWrite(path, storeParams(n, bands, rowsPerBand))
  }

  /** Append a new batch's signatures to an existing store — the
    * maintenance half of the incremental-dedup loop: after a batch is
    * deduped (and its survivors admitted to the corpus), its
    * signatures join the store so the NEXT batch dedupes against
    * them too. Plain parquet append of both store tables; at 100 TB
    * this is the only corpus-side work an ingest batch ever pays —
    * the historical signatures are never rewritten. Ids must be new
    * to the store (the admission contract); append does not dedup.
    */
  def signatureStoreAppend(newDocs: DataFrame, idCol: String,
      textCol: String, n: Int, bands: Int, rowsPerBand: Int,
      path: String): Unit = {
    require(signatureStoreComplete(path, n, bands, rowsPerBand),
      s"signature store at $path is incomplete or was built with different " +
        s"parameters than (${storeParams(n, bands, rowsPerBand)}) — refusing to append")
    // unpersist must target the CACHED stage (see signatureStoreWrite)
    val stage = minhashStage(newDocs, idCol, textCol, n, corpusSized = false)
    val hashed = emptyShGuard(stage)
    hashed.select(col("id"), col("sh"))
      .write.mode("append").parquet(s"$path/shingles")
    minhashBanded(hashed, bands, rowsPerBand)
      .write.mode("append").parquet(s"$path/bands")
    stage.unpersist(false)
  }

  /** [[minhashLshPairsAcross]] against a persisted signature store:
    * identical output for the same corpus, but the corpus side reads
    * `signatureStoreWrite`'s parquet — candidate generation broadcasts
    * the new batch's band keys over a scan of the stored bands (zero
    * corpus shuffle, zero re-tokenization), and verification fetches
    * stored shingle arrays for candidate ids only.
    */
  /** Scale costs: the batch's band rows broadcast only under the size
    * gate (an oversized batch degrades to a shuffle join — no forced
    * hint); the hot-band cap reads the stored bands one extra time for
    * the count aggregate, whose shuffle carries one row per DISTINCT
    * band key (map-side combined) — the corpus text and shingle
    * arrays are never re-read or shuffled.
    */
  def minhashLshPairsAgainstStore(newDocs: DataFrame, storePath: String,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBandDf: Int = 1000,
      broadcastMaxBandRows: Long = 4000000L): DataFrame = {
    val spark = newDocs.sparkSession
    val hashedNew = minhashHashed(newDocs, idCol, textCol, n,
      corpusSized = false)
    val newSide = maybeBroadcastBatch(
      minhashBanded(hashedNew, bands, rowsPerBand)
        .withColumnRenamed("id", "new_id"),
      hashedNew, bands, broadcastMaxBandRows)
    // spread both store scans (r20, Par scaladoc): the store tables
    // are single-file locally, so the band join and the shingle-array
    // verify ran on 1-2 scan tasks per micro-batch (the batch side
    // broadcasts, so the store scan's width IS the stage width); a
    // cluster-scale store has enough splits that spread no-ops
    val cand = newSide
      .join(antiJoinHotBands(
          Par.spread(spark.read.parquet(s"$storePath/bands"), col("id"))
            .withColumnRenamed("id", "corpus_id"), maxBandDf),
        Seq("band_idx", "band_key"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    cand
      .join(hashedNew.select(col("id").as("new_id"), col("sh").as("sh1")), Seq("new_id"))
      .join(Par.spread(spark.read.parquet(s"$storePath/shingles"), col("id"))
          .select(col("id").as("corpus_id"), col("sh").as("sh2")), Seq("corpus_id"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        floor(col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")) * 10000) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    * 2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    * the MOSS algorithm): hash every ORDERED word n-gram (positions
    * matter, so no distinct), slide a window of `window` consecutive
    * hashes, and keep each window's minimum — the guarantee is that
    * any shared run of window+n-1 words between two documents yields
    * at least one shared fingerprint, while selected density stays
    * ~2/(window+1) of the grams. The winnowed set is the
    * plagiarism/near-dup fingerprint that survives content SHIFTS
    * (insertions move positions; minima in unchanged windows are
    * unchanged), which plain strided sampling does not.
    *
    * Pure codegen'd column ops per row (transform + slice +
    * array_min); the only shuffle is the final (doc_id, fp) distinct.
    * Short docs (fewer grams than the window) contribute their global
    * minimum, preserving the at-least-one-fingerprint invariant.
    */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, window: Int = 4): DataFrame = {
    val words = T.tokens(col("txt"))
    val grams = when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    // spread: the gram hash is the expensive per-row stage (Par
    // scaladoc). No emptiness filter: a filter here would be pushed
    // below the spread exchange, recomputing the gram hash single-task
    // on the narrow scan; instead gramless docs map to an EMPTY window
    // array, which explode drops — identical row set.
    Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
        col("doc_id"))
      .select(col("doc_id"),
        graft.expressions.HashFunctions.md5_int_array32(grams).as("xi"))
      .select(col("doc_id"),
        explode(when(size(col("xi")) >= window,
          transform(sequence(lit(1), size(col("xi")) - (window - 1)),
            i => array_min(slice(col("xi"), i, lit(window)))))
          .when(size(col("xi")) > 0, array(array_min(col("xi"))))
          .otherwise(array().cast("array<long>"))).as("fp"))
      .distinct()
  }

  /** SimHash near-dup pairs: 60-bit shingle-based fingerprints,
    * pairs within `maxHamming`. The pair stage here is a cross join
    * for exactness; the scale path buckets fingerprints by bit-prefix
    * chunks (any pair within hamming d shares at least one of d+1
    * equal chunks) — see simhashBucketedPairs.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxHamming: Int): DataFrame = {
    val fp = simhashFingerprints(docs, idCol, textCol, n)
    fp.as("a").join(fp.as("b"), col("a.id") < col("b.id"))
      .withColumn("hamming", T.hammingDistance(col("a.fp"), col("b.fp")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("hamming"))
  }

  /** Staged SimHash fingerprint computation: hash ints -> bit counts
    * -> fingerprint, with cache boundaries so each stage runs once
    * per row (Catalyst re-inlines collapsed projections otherwise —
    * measured 60x slower fused).
    */
  private def simhashFingerprints(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    // spread + materialize + guard-above-cache: see ngramJaccardPairs
    // (empty xi yields zero counts / total 0 — filtered above the
    // cache, never consumed)
    val hashed = Par.materialize(
      Par.spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")),
          col("id"))
        .select(col("id"),
          graft.expressions.HashFunctions.md5_int_array60(
            T.shingles(col("txt"), n)).as("xi"))
        .withColumn("counts", T.simhashBitCounts(col("xi")))
        .withColumn("total", size(col("xi")))
        .drop("xi")
        .cache())
      .filter(col("total") > 0)
    hashed.select(col("id"),
      T.simhashFromCounts(col("counts"), col("total")).as("fp"))
  }

  /** SimHash pairs at scale: split the 60-bit fingerprint into
    * (maxHamming + 1) chunks; by pigeonhole any pair within
    * maxHamming matches on at least one chunk, so the equi-join on
    * (chunk_idx, chunk_value) finds all such pairs without a cross
    * join. Same output as simhashPairs.
    */
  def simhashBucketedPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPerChunk = T.SimhashBits / chunks + (if (T.SimhashBits % chunks == 0) 0 else 1)
    val fp = simhashFingerprints(docs, idCol, textCol, n)
    // pre-partitioned + cached so both self-join sides reuse ONE
    // shuffle (see minhashLshPairs note — no exchange reuse otherwise)
    val chunked = fp.select(col("id"), col("fp"), posexplode(
      array((0 until chunks).map { j =>
        shiftright(col("fp"), j * bitsPerChunk)
          .bitwiseAND(lit((1L << bitsPerChunk) - 1))
      }: _*)).as(Seq("chunk_idx", "chunk_val")))
      .repartition(col("chunk_idx"), col("chunk_val"))
      .cache()
    Par.materialize(chunked)
    // hamming filter BEFORE distinct: the chunk join emits O(docs per
    // chunk-value squared) candidate rows (5-bit chunks -> 32 values,
    // so millions at sf0.1); bit_count(xor) is codegen-cheap per row,
    // and filtering first shrinks the distinct's shuffle from the full
    // candidate stream to just the near-pairs (measured 6.4s -> ~2s)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        T.hammingDistance(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash pairs at a PERMISSIVE radius, scale-safely: multi-index
    * Hamming search (Norouzi/Punjani/Fleet, "Fast Search in Hamming
    * Space with Multi-Index Hashing"). The plain pigeonhole
    * (simhashBucketedPairs) needs maxHamming+1 chunks, so a radius-12
    * query gets 5-bit chunks with only 32 distinct join values —
    * candidate volume O(n²/32): quadratic-class (the q23 finding).
    *
    * MIH keeps the chunks WIDE and enumerates neighbors instead: with
    * c chunks of w = 60/c bits, a pair within maxHamming has some
    * chunk differing in <= floor(maxHamming/c) bits (pigeonhole on
    * the error budget). The probe side XORs each chunk value with
    * every w-bit mask of popcount <= floor(maxHamming/c) — a
    * broadcast of sum C(w, 0..subR) masks (576 for w=15, subR=3) —
    * and equi-joins the exact chunk table on (chunk_idx, value).
    * Cost is LINEAR: ~c x 576 probe rows per doc against a 2^15-value
    * key space, instead of n²/32 collisions. Same output as
    * simhashPairs/simhashBucketedPairs.
    *
    * The exact side is pre-partitioned + cached once and its cached
    * partitioning feeds the join; only the expanded probes shuffle.
    */
  def simhashMihPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxHamming: Int, chunks: Int = 4): DataFrame = {
    require(T.SimhashBits % chunks == 0,
      s"chunks must divide ${T.SimhashBits}")
    val w = T.SimhashBits / chunks
    require(w < 30, "chunk width must fit a broadcastable mask table")
    val subR = maxHamming / chunks
    val fp = simhashFingerprints(docs, idCol, textCol, n)
    val chunked = fp.select(col("id"), col("fp"), posexplode(
      array((0 until chunks).map { j =>
        shiftright(col("fp"), j * w).bitwiseAND(lit((1L << w) - 1))
      }: _*)).as(Seq("chunk_idx", "chunk_val")))
      .repartition(col("chunk_idx"), col("chunk_val"))
      .cache()
    Par.materialize(chunked)
    val masks = docs.sparkSession.range(1L << w)
      .filter(bit_count(col("id")) <= subR)
      .select(col("id").as("mask"))
    val probes = chunked.crossJoin(broadcast(masks))
      .select(col("id"), col("fp"), col("chunk_idx"),
        col("chunk_val").bitwiseXOR(col("mask")).as("probe_val"))
    probes.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.probe_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        T.hammingDistance(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over a near-dup pair graph: every document
    * gets the minimum doc id of its component as `component_id` — the
    * step that turns pairwise near-dup evidence into dedup clusters
    * (keep one canonical doc per component).
    *
    * Implementation is iterative min-label propagation: each round
    * every vertex takes the min of its own label and its neighbors';
    * rounds = graph diameter, and near-dup components are shallow
    * (diameter 2-4), so a handful of joins. Each round shuffles only
    * (id, label) pairs and is cut with an EAGER localCheckpoint: an
    * iterative plan that references the previous round twice doubles
    * the logical plan every round (2^rounds — measured OOM in plan
    * stringification by round ~9 with cache alone; cache truncates
    * execution, not lineage). Convergence test: labels only ever
    * decrease, so the label sum strictly decreases until fixpoint —
    * one tiny agg per round. For adversarial long-chain graphs use
    * connectedComponentsLargeStar (O(log n) rounds).
    */
  def connectedComponents(pairs: DataFrame, id1Col: String, id2Col: String,
      maxIterations: Int = 50): DataFrame = {
    // cache the pair input for the two union branches (r19): the
    // eager checkpoint otherwise re-runs the caller's whole pair
    // pipeline once per branch; dropped as soon as the checkpoint
    // materializes
    val p = Par.materialize(
      pairs.select(col(id1Col).as("p1"), col(id2Col).as("p2")).cache())
    val edges = p.select(col("p1").as("src"), col("p2").as("dst"))
      .union(p.select(col("p2").as("src"), col("p1").as("dst")))
      .distinct()
      .localCheckpoint(true)
    p.unpersist(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var prevSum = labels.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp"))
        .union(viaNeighbors)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val nextSum = next.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    labels.select(col("id"), col("comp").as("component_id"))
  }

  /** Connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * each round hangs every vertex's neighborhood off its minimum
    * member, halving component diameter — O(log n) rounds where plain
    * min-label propagation needs O(diameter). Same output contract as
    * connectedComponents: (id, component_id = min id in component).
    *
    * large-star: for each directed edge (u,v) with v > u, re-attach v
    * to m(u) = min(neighbors(u) + u). small-star: orient edges to
    * (high, low) and re-attach each low neighbor (and high itself) to
    * m(high). Both preserve connectivity; fixpoint is a star per
    * component. Rounds are cut with eager localCheckpoints and the
    * fixpoint test is a single-job (count, xor, sum)-of-hash summary
    * compare between consecutive edge sets.
    */
  def connectedComponentsLargeStar(pairs: DataFrame, id1Col: String,
      id2Col: String, maxIterations: Int = 25): DataFrame =
    connectedComponentsLargeStarWithRounds(pairs, id1Col, id2Col, maxIterations)._1

  /** As [[connectedComponentsLargeStar]], additionally returning the
    * number of rounds executed — the observable that backs the
    * O(log n) claim in specs (a diameter-d chain must converge in
    * ~log d rounds, not d).
    */
  def connectedComponentsLargeStarWithRounds(pairs: DataFrame, id1Col: String,
      id2Col: String, maxIterations: Int = 25): (DataFrame, Int) = {
    // cache the pair input across the vertices + edges checkpoints
    // (r19): four consumptions of the caller's pair pipeline otherwise
    val p = Par.materialize(
      pairs.select(col(id1Col).as("p1"), col(id2Col).as("p2")).cache())
    val vertices = p.select(col("p1").as("id"))
      .union(p.select(col("p2").as("id"))).distinct()
      .localCheckpoint(true)
    var edges = p
      .select(greatest(col("p1"), col("p2")).as("h"),
        least(col("p1"), col("p2")).as("l"))
      .filter(col("h") =!= col("l")).distinct()
      .localCheckpoint(true)
    p.unpersist(false)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // large-star over the bidirected neighbor list
      val nbrs = edges.select(col("h").as("u"), col("l").as("v"))
        .union(edges.select(col("l").as("u"), col("h").as("v")))
      val m = nbrs.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = nbrs.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(greatest(col("v"), col("m")).as("h"),
          least(col("v"), col("m")).as("l"))
        .filter(col("h") =!= col("l")).distinct()
        .localCheckpoint(true)
      // small-star on the (high -> low) orientation
      val m2 = large.groupBy(col("h")).agg(min(col("l")).as("m"))
      val small = large.join(m2, Seq("h"))
        .select(col("l").as("a"), col("m").as("b"))
        .union(m2.select(col("h").as("a"), col("m").as("b")))
        .select(greatest(col("a"), col("b")).as("h"),
          least(col("a"), col("b")).as("l"))
        .filter(col("h") =!= col("l")).distinct()
        .localCheckpoint(true)
      // fixpoint test in ONE job: both edge sets are distinct by
      // construction, so set equality is (count, xor-of-hash,
      // sum-of-hash) equality — two order-independent 64-bit
      // summaries + an exact count; a false "converged" needs a
      // simultaneous collision in both (~2^-128). The exceptAll pair
      // this replaces cost two full-shuffle jobs per round — at
      // ~log n rounds the dominant non-join cost of the algorithm.
      val summaries = small.select(lit(0).as("side"), col("h"), col("l"))
        .unionAll(edges.select(lit(1).as("side"), col("h"), col("l")))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n"),
          bit_xor(xxhash64(col("h"), col("l"))).as("hx"),
          sum(xxhash64(col("h"), col("l")).cast("decimal(38,0)")).as("hs"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
          r.getDecimal(3).toBigInteger))
        .toMap
      converged = summaries.get(0) == summaries.get(1)
      edges = small
      i += 1
    }
    // fixpoint edges form stars: (member, root); roots label themselves
    val labels = vertices
      .join(edges.select(col("h").as("id"), col("l").as("component_id")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component_id"), col("id")).as("component_id"))
    (labels, i)
  }

  /** Retention maintenance for the signature store — the third leg of
    * the store lifecycle (write / append / vacuum): signatures of
    * deleted or expired documents are removed so they stop matching
    * future batches. Rewrite-and-swap: surviving rows (anti-join on
    * the removed-id set — batch-sized, prunes both store scans) stage
    * to sibling dirs, then swap under a DROPPED marker. A crash
    * anywhere leaves either the old store (marker intact, stage
    * ignored) or a marker-less store that fails
    * signatureStoreComplete and forces a rebuild — never a
    * mixed-generation read. Cost: one scan of the signature tables,
    * never of the corpus.
    *
    * Filesystem contract: every marker/table operation goes through
    * the Hadoop FileSystem for the store's OWN path scheme, so the
    * store may live on HDFS or an object store — but the delete+rename
    * swap is only crash-atomic where rename is atomic (HDFS, POSIX).
    * On S3-class stores rename is copy+delete: a crash mid-swap there
    * still leaves a marker-less store that fails
    * signatureStoreComplete and forces a rebuild (safe, not cheap) —
    * pair the store with an atomic-rename filesystem when rebuilds
    * must be rare.
    */
  def signatureStoreVacuum(spark: org.apache.spark.sql.SparkSession,
      removedIds: DataFrame, idCol: String,
      n: Int, bands: Int, rowsPerBand: Int, path: String): Unit = {
    require(signatureStoreComplete(path, n, bands, rowsPerBand),
      s"signature store at $path is incomplete or was built with different " +
        s"parameters than (${storeParams(n, bands, rowsPerBand)}) — refusing to vacuum")
    val ids = removedIds.select(col(idCol).as("id"))
    spark.read.parquet(s"$path/shingles")
      .join(ids, Seq("id"), "left_anti")
      .write.mode("overwrite").parquet(s"$path/shingles_stage")
    spark.read.parquet(s"$path/bands")
      .join(ids, Seq("id"), "left_anti")
      .write.mode("overwrite").parquet(s"$path/bands_stage")
    markerDelete(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Swap under the dropped marker, CHECKING each FileSystem return:
    // Hadoop delete/rename report failure as `false`, not an
    // exception, and a silently-failed rename followed by markerWrite
    // would publish a valid marker over a missing/stale table. On any
    // failure we throw with the marker still dropped, so
    // signatureStoreComplete stays false and the next reader is
    // forced into the documented fallback: rebuild.
    Seq("shingles", "bands").foreach { t =>
      val live = new org.apache.hadoop.fs.Path(path, t)
      val stage = new org.apache.hadoop.fs.Path(path, t + "_stage")
      if (!fs.delete(live, true) && fs.exists(live))
        throw new java.io.IOException(
          s"signature store vacuum: delete of $live failed; completion " +
            "marker remains dropped — store requires rebuild")
      if (!fs.rename(stage, live))
        throw new java.io.IOException(
          s"signature store vacuum: rename $stage -> $live failed; " +
            "completion marker remains dropped — store requires rebuild")
    }
    markerWrite(path, storeParams(n, bands, rowsPerBand))
  }

  /** Cross-document duplicated-SPAN detection — the span-level
    * complement of document-level dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better":
    * exact substring duplication removal; this is the distributed
    * k-token-gram form of their suffix-array pass). Any k-token gram
    * whose fingerprint occurs in >= 2 DISTINCT documents marks its
    * [start, start+k) token span as duplicated; per document the
    * flagged spans are merged and coverage is reported.
    *
    * Because all spans have equal length k, interval merging is a
    * closed-form fold over the sorted start positions — no general
    * interval algebra, no per-span window:
    *   covered  = k + sum over consecutive gaps of min(gap, k)
    *   segments = 1 + count(gap > k)
    * both computed with codegen'd higher-order functions over the
    * per-doc start array (bounded by doc token count, like the
    * chunking and winnowing operators).
    *
    * Scale shape: gram hashing is narrow per-row compute; the only
    * exchanges carry (gram_hash, doc_id, start) rows (~24 bytes) for
    * the document-frequency aggregate and the dup-gram semi-join —
    * document text never shuffles. dup_frac_bp is integer basis
    * points via `div` (exact cross-engine; a double ratio is not).
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val words = T.tokens(col("txt"))
    val grams = when(size(words) >= k,
      transform(sequence(lit(1), size(words) - (k - 1)),
        i => array_join(slice(words, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    // spread: gram hashing is the expensive per-row stage (Par scaladoc)
    val occ = Par.spread(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
        col("doc_id"))
      .select(col("doc_id"), size(words).cast("long").as("n_tokens"),
        graft.expressions.HashFunctions.md5_int_array32(grams).as("ghs"))
      // no emptiness filter (it would be pushed below the spread
      // exchange and recompute the gram hash single-task on the
      // narrow scan): posexplode of an empty array drops the row —
      // identical row set
      .select(col("doc_id"), col("n_tokens"),
        posexplode(col("ghs")).as(Seq("s", "gh")))
    val dupGrams = occ.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("gh"))
    val perDoc = occ.join(dupGrams, Seq("gh"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(sort_array(collect_list(col("s"))).as("ss"),
        count(lit(1)).as("n_dup_grams"))
    val diffs = zip_with(
      slice(col("ss"), lit(1), size(col("ss")) - 1),
      slice(col("ss"), lit(2), size(col("ss")) - 1),
      (a, b) => b - a)
    perDoc.select(
        col("doc_id"), col("n_tokens"), col("n_dup_grams"),
        (lit(1) + size(filter(diffs, d => d > lit(k)))).cast("long")
          .as("n_spans"),
        (lit(k) + aggregate(diffs, lit(0), (acc, d) => acc + least(d, lit(k))))
          .cast("long").as("dup_tokens"))
      .withColumn("dup_frac_bp", expr("div(dup_tokens * 10000, n_tokens)"))
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995,
    * "The Merge/Purge Problem for Large Databases"): order the corpus
    * by a normalized blocking key and verify ONLY pairs within
    * `window` positions of each other in that total order — the
    * classic record-linkage blocking that catches near-dups whose
    * normalized prefixes agree (title variants, leading-boilerplate
    * copies) with O(n·w) candidates instead of O(n²). Complements the
    * content-signature families (minhash/simhash/PPJoin): SNM blocks
    * on ORDER locality, so a second pass with a different key is the
    * standard recall lever.
    *
    * Scale shape — the q90/equiDepthDistributed discipline, with no
    * RDD hop and no global Window: range-partition by (key, id), sort
    * within partitions, decompose monotonically_increasing_id into
    * (partition, local index), and add broadcast per-partition prefix
    * offsets (numPartitions longs — the only driver traffic) to get
    * each row's exact global rank. Neighborhood pairs then come from
    * a bucket equi-join: rows at ranks r1 < r2 with r2 - r1 < w have
    * floor(r/w) buckets differing by at most 1, so the right side
    * explodes into its own and its predecessor bucket and each
    * qualifying pair matches exactly once. Shingle-Jaccard verify
    * (same integer score grid as [[ngramJaccardPairs]]) runs on
    * candidates only.
    *
    * The key strips to ASCII alphanumerics BEFORE lowercasing, so the
    * sort order is pure byte order — identical across engines and
    * collations by construction.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, window: Int, threshold: Double, keyLen: Int = 16,
      numPartitions: Int = 0): DataFrame =
    sortedNeighborhoodPairsByKey(docs, idCol, textCol, n, window, threshold,
      substring(snmNormalized(col(textCol)), 1, keyLen), numPartitions)

  /** The default SNM blocking alphabet: ASCII alphanumerics only,
    * stripped BEFORE lowercasing — sort order is pure byte order on
    * both engines, no collation/Unicode-casing surface.
    */
  def snmNormalized(text: Column): Column =
    lower(regexp_replace(coalesce(text, lit("")), "[^A-Za-z0-9]", ""))

  /** Multi-pass SNM (the standard recall protocol: Hernández & Stolfo
    * run several passes with independent keys and union the pairs —
    * one ordering cannot neighbor every true duplicate). Pairs found
    * by several passes dedupe to one row keeping the smallest rank
    * distance; the verified jaccard is key-independent, so the merge
    * is deterministic.
    */
  def sortedNeighborhoodMultiPass(docs: DataFrame, idCol: String,
      textCol: String, n: Int, window: Int, threshold: Double,
      sortKeys: Seq[Column], numPartitions: Int = 0): DataFrame = {
    require(sortKeys.nonEmpty, "at least one blocking key required")
    // ONE shared shingle cache for every pass (r20): the verify-side
    // shingles are key-independent, but each pass built and eagerly
    // materialized its own identical cache — N tokenize passes + N
    // materialization jobs for N blocking keys (guide §1.2: don't
    // compute things twice)
    val sh = snmShingles(docs, idCol, textCol, n)
    sortKeys.map(k => sortedNeighborhoodPairsByKey(docs, idCol, textCol, n,
        window, threshold, k, numPartitions, prebuiltShingles = Some(sh)))
      .reduce(_ unionAll _)
      .groupBy(col("id1"), col("id2"))
      .agg(min(col("rank_dist")).as("rank_dist"),
        min(col("jaccard")).as("jaccard"))
  }

  /** The SNM verify-side shingle cache: spread + cache + materialize +
    * emptiness guard ABOVE the cache (see sortedNeighborhoodPairsByKey
    * — below the cache, Catalyst pushes the filter under the exchange
    * and recomputes single-task).
    */
  private def snmShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    Par.materialize(
      Par.spread(docs.select(col(idCol).cast("long").as("id"),
          col(textCol).as("txt")), col("id"))
        .select(col("id"), T.shingles(col("txt"), n).as("sh"))
        .cache())
      .filter(size(col("sh")) > 0)

  /** [[sortedNeighborhoodPairs]] with an explicit blocking-key
    * expression — the key IS the pass (prefix, reversed suffix,
    * phonetic code, ...). Callers must keep the key engine-portable
    * in byte order ([[snmNormalized]] provides the safe alphabet).
    */
  def sortedNeighborhoodPairsByKey(docs: DataFrame, idCol: String,
      textCol: String, n: Int, window: Int, threshold: Double,
      sortKey: Column, numPartitions: Int = 0,
      prebuiltShingles: Option[DataFrame] = None): DataFrame = {
    require(window >= 2, s"window must cover at least adjacent rows, got $window")
    val keyed = docs.select(col(idCol).cast("long").as("id"),
      sortKey.as("skey"))
    // Layout.globalRank owns the cache-for-single-evaluation and
    // prefix-offset disciplines (see its doc)
    val ranked = Layout.globalRank(keyed,
        Seq(col("skey"), col("id")), numPartitions = numPartitions)
      .select(col("id"), col("r"))
    val w = window.toLong
    val a = ranked.select(col("id").as("id1"), col("r").as("r1"),
      floor(col("r") / w).cast("long").as("g"))
    val b = ranked.select(col("id").as("id2"), col("r").as("r2"),
      explode(array(floor(col("r") / w).cast("long"),
        floor(col("r") / w).cast("long") - 1)).as("g"))
    val cand = a.join(b, "g")
      .filter(col("r2") - col("r1") >= 1 && col("r2") - col("r1") <= w - 1)
      .select(col("id1"), col("id2"), (col("r2") - col("r1")).as("rank_dist"))
    // spread + cache + materialize + guard-above-cache: the shingle
    // build feeds BOTH verify joins — uncached it ran twice, on a
    // single-split scan each time (Par / ngramJaccardPairs scaladoc).
    // Multi-pass callers pass ONE prebuilt cache for all passes (r20).
    val sh = prebuiltShingles.getOrElse(snmShingles(docs, idCol, textCol, n))
    // pin the verify join's width (r20): same tiny-bytes/heavy-compute
    // shape as ngramJaccardPrefixPairs — AQE's byte-based coalescing
    // squeezes the array_intersect stage to a few tasks (explicit
    // partition counts are coalesce-exempt; matching the session
    // shuffle partitioning makes the joins reuse these exchanges)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    cand.repartition(par, col("id1"))
      .join(sh.as("x"), col("id1") === col("x.id"))
      .repartition(par, col("id2"))
      .join(sh.as("y"), col("id2") === col("y.id"))
      .withColumn("inter", size(array_intersect(col("x.sh"), col("y.sh"))))
      .withColumn("jaccard",
        floor(col("inter") / (size(col("x.sh")) + size(col("y.sh")) - col("inter")) * 10000) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("rank_dist"), col("jaccard"))
  }

  /** Embedding near-dup pairs with cosine >= threshold, brute-force
    * (exact). For the approximate scale path see
    * Similarity.lshBucketedPairs.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // norms precomputed once per vector (cached), not once per pair:
    // identical doubles, O(n) instead of O(n^2) norm work.
    // spread: the O(n^2) pair verify parallelizes over the STREAM
    // side's partitions — a single-split scan would run it one-core
    // (Par scaladoc); materialize: both join sides fan out of this
    // cache concurrently.
    val e = Par.materialize(
      Par.spread(emb.select(col(idCol).as("id"), col(vecCol).as("v")),
          col("id"))
        .withColumn("nrm", V.norm(col("v")))
        .cache())
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine",
        round(V.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("cosine"))
  }
}
