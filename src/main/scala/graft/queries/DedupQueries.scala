package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.Dedup

/** Driver-checkable dedup queries (the LLM-pipeline extension family):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  * Every oracle reproduces the exact signature math via md5-derived
  * integer hashing, so DuckDB verifies the full pipeline — not just
  * row counts.
  */
object DedupQueries extends QueryRegistry {

  /** Shared DuckDB SQL fragment: distinct 3-gram shingle lists. */
  private val duckShingles =
    """
      w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(range(1, len(words) - 1),
                                  i -> array_to_string(words[i:i+2], ' '))) AS s
             FROM w WHERE len(words) >= 3)
    """.trim

  /** Exact dedup via content hash (hash-groupBy; SURVEY extension +
    * the reference's O(1) set-dedup analog).
    */
  val q20 = GraftQuery(
    "q20_dedup_exact",
    (s, d) => Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text"),
    Some("""
      SELECT md5(text) AS fingerprint, min(doc_id) AS canonical_id, count(*) AS n_copies
      FROM documents GROUP BY md5(text)
    """.trim))

  /** Exact n-gram Jaccard pairs via exploded-shingle equi-join. */
  val q21 = GraftQuery(
    "q21_dedup_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.5),
    Some(s"""
      WITH $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
      SELECT id1, id2,
             floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 AS jaccard
      FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.5
    """.trim))

  /** MinHash + LSH near-dup pairs, exact-Jaccard-verified. The oracle
    * reproduces the full signature -> band -> candidate -> verify
    * pipeline with the same (a, b, P) universal-hash constants.
    */
  val q22 = GraftQuery(
    "q22_dedup_minhash_lsh",
    (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5),
    Some {
      val p = T.MinhashP
      val sigEntries = T.MinhashAB.map { case (a, b) =>
        s"list_aggregate(list_transform(xi, x -> (x * $a + $b) % $p), 'min')"
      }.mkString(",\n                    ")
      val bandEntries = (0 until 4).map { j =>
        s"array_to_string(sg[${j * 4 + 1}:${j * 4 + 4}], ',')"
      }.mkString(", ")
      s"""
      WITH $duckShingles,
      ints AS (SELECT doc_id, s,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS xi
               FROM sh),
      sig AS (SELECT doc_id, s,
                     [$sigEntries] AS sg
              FROM ints),
      bands AS (SELECT doc_id, s, band_idx, [$bandEntries][band_idx + 1] AS band_key
                FROM sig, unnest([0, 1, 2, 3]) AS t(band_idx)),
      cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
               FROM bands a JOIN bands b
                 ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id),
      verified AS (SELECT id1, id2,
                          floor(len(list_intersect(x.s, y.s)) * 1.0 /
                                (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
                   FROM cand JOIN sh x ON id1 = x.doc_id JOIN sh y ON id2 = y.doc_id)
      SELECT id1, id2, jaccard FROM verified WHERE jaccard >= 0.5
      """.trim
    })

  /** DuckDB mirror of the pigeonhole-chunked SimHash pipeline at a
    * given radius: maxHamming+1 chunks, any pair within the radius
    * shares at least one chunk value.
    */
  private def simhashOracle(maxHamming: Int): String = {
    val bitTerms = (0 until T.SimhashBits).map { b =>
      s"(CASE WHEN 2 * len(list_filter(xi, x -> ((x >> $b) & 1) = 1)) > len(xi) THEN ${1L << b} ELSE 0 END)"
    }.mkString(" +\n                   ")
    val chunkCount = maxHamming + 1
    val bitsPerChunk = T.SimhashBits / chunkCount +
      (if (T.SimhashBits % chunkCount == 0) 0 else 1)
    val chunkEntries = (0 until chunkCount).map { j =>
      s"((fp >> ${j * bitsPerChunk}) & ${(1L << bitsPerChunk) - 1})"
    }.mkString(", ")
    s"""
      WITH $duckShingles,
      ints AS (SELECT doc_id,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS xi
               FROM sh),
      fps AS (SELECT doc_id,
                     $bitTerms AS fp
              FROM ints),
      chunked AS (SELECT doc_id, fp, chunk_idx, [$chunkEntries][chunk_idx + 1] AS chunk_val
                  FROM fps, unnest(range(0, $chunkCount)) AS t(chunk_idx)),
      pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.fp AS fp1, b.fp AS fp2
                FROM chunked a JOIN chunked b
                  ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
                 AND a.doc_id < b.doc_id)
      SELECT id1, id2, CAST(bit_count(xor(fp1, fp2)) AS INT) AS hamming
      FROM pairs WHERE bit_count(xor(fp1, fp2)) <= $maxHamming
      """.trim
  }

  // The permissive-radius simhash verifier (maxHamming=12: 13 chunks
  // of 5 bits, O(n^2/32) candidates — quadratic-class at scale) was
  // declared as q23 through r9; demoted to spec-only in r10 because
  // that PLAN does not survive 100x. DedupSpec keeps the coverage
  // (bucketed == cross-join at radius 12, MIH equivalence); q60 below
  // is the declared production-radius form.

  /** SimHash at the production radius (hamming <= 3): 4 chunks of 15
    * bits give the candidate equi-join ~2^15 distinct values per chunk
    * index instead of 32 — the bucketing actually prunes, and the
    * operator survives 100x. Same operator, same oracle shape; only
    * the radius economics differ (PLANS.md).
    */
  val q60 = GraftQuery(
    "q60_dedup_simhash_tight",
    (s, d) => Dedup.simhashBucketedPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, maxHamming = 3),
    Some(simhashOracle(3)))

  /** n-gram Jaccard with the df-cap actually firing: maxDf=8 drops
    * every posting list longer than 8 docs (testdata's max df is ~25),
    * so the approximate branch — not just the exact fast path — is
    * driver-verified. The oracle applies the identical cap with a
    * HAVING on the per-shingle doc count; intersections then count
    * capped postings only while the union stays the full shingle sets,
    * exactly as the operator computes. DedupSpec asserts
    * dropped_postings > 0 via the observed metric.
    */
  val q61 = GraftQuery(
    "q61_dedup_ngram_capped",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.2, maxDf = 8),
    Some(s"""
      WITH $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      keep AS (SELECT sg FROM ex GROUP BY sg HAVING count(*) > 1 AND count(*) <= 8),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               WHERE a.sg IN (SELECT sg FROM keep)
               GROUP BY 1, 2)
      SELECT id1, id2,
             floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 AS jaccard
      FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.2
    """.trim))

  /** MinHash+LSH with the hot-band cap actually firing: maxBandDf=2
    * drops every band bucket shared by 3+ docs (testdata's max band df
    * is 3), so the skew-guard branch — anti-join of counted hot bands,
    * not just the exact fast path — is driver-verified. The oracle
    * applies the identical cap with a HAVING on the per-(band_idx,
    * band_key) doc count before candidate generation; verification
    * stays exact Jaccard on the surviving candidates, exactly as the
    * operator computes (the q61 pattern). DedupSpec separately asserts
    * the `lsh_band_cap` observed metric fires on a degenerate
    * stop-signature corpus.
    */
  val q113 = GraftQuery(
    "q113_dedup_lsh_band_capped",
    (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5, maxBandDf = 2),
    Some {
      val p = T.MinhashP
      val sigEntries = T.MinhashAB.map { case (a, b) =>
        s"list_aggregate(list_transform(xi, x -> (x * $a + $b) % $p), 'min')"
      }.mkString(",\n                    ")
      val bandEntries = (0 until 4).map { j =>
        s"array_to_string(sg[${j * 4 + 1}:${j * 4 + 4}], ',')"
      }.mkString(", ")
      s"""
      WITH $duckShingles,
      ints AS (SELECT doc_id, s,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS xi
               FROM sh),
      sig AS (SELECT doc_id, s,
                     [$sigEntries] AS sg
              FROM ints),
      bands AS (SELECT doc_id, s, band_idx, [$bandEntries][band_idx + 1] AS band_key
                FROM sig, unnest([0, 1, 2, 3]) AS t(band_idx)),
      keepb AS (SELECT band_idx, band_key FROM bands
                GROUP BY 1, 2 HAVING count(*) > 1 AND count(*) <= 2),
      cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
               FROM bands a JOIN bands b
                 ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
               JOIN keepb k
                 ON a.band_idx = k.band_idx AND a.band_key = k.band_key),
      verified AS (SELECT id1, id2,
                          floor(len(list_intersect(x.s, y.s)) * 1.0 /
                                (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
                   FROM cand JOIN sh x ON id1 = x.doc_id JOIN sh y ON id2 = y.doc_id)
      SELECT id1, id2, jaccard FROM verified WHERE jaccard >= 0.5
      """.trim
    })

  // The exact-cosine all-pairs verifier (Dedup.embeddingNearDupPairs)
  // was declared as q24 through r9; demoted to spec-only in r10 — an
  // all-pairs nested loop is by design not a 100x plan. LshPairsSpec
  // keeps it as the ground truth for the bucketed path's measured
  // precision/recall; q39 below is the declared scale form.

  /** Embedding near-dup pairs via multi-table hyperplane LSH — the
    * bucketed scale path for the exact all-pairs join. The oracle
    * mirrors the full pipeline (hyperplane sign bits -> per-table
    * bucket keys -> within-bucket candidates -> exact-cosine verify),
    * so the driver checks the whole approximate pipeline bit-for-bit;
    * LshPairsSpec separately measures precision/recall against the
    * exact all-pairs verifier's output.
    */
  val q39 = GraftQuery(
    "q39_dedup_embedding_lsh",
    (s, d) => graft.operators.Similarity.lshBucketedPairs(
      Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.4, bits = 4, tables = 16),
    Some {
      val hps = graft.operators.Similarity.lshHyperplanes(16, 4, 64)
      val hpRows = (for { t <- 0 until 16; k <- 0 until 4 } yield {
        val arr = hps(t)(k).map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
        s"($t, $k, $arr)"
      }).mkString(",\n        ")
      s"""
      WITH hp(table_idx, bit_idx, h) AS (VALUES
        $hpRows),
      sb AS (
        SELECT e.vec_id, hp.table_idx,
               CASE WHEN list_sum(list_transform(range(1, 65),
                      i -> CAST(e.embedding[i] AS DOUBLE) * hp.h[i])) >= 0
                    THEN (CAST(1 AS BIGINT) << hp.bit_idx) ELSE CAST(0 AS BIGINT) END AS bit_val
        FROM embeddings e CROSS JOIN hp),
      keyed AS (SELECT vec_id, table_idx, CAST(sum(bit_val) AS BIGINT) AS bucket
                FROM sb GROUP BY 1, 2),
      cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
               FROM keyed a JOIN keyed b
                 ON a.table_idx = b.table_idx AND a.bucket = b.bucket
                AND a.vec_id < b.vec_id),
      ver AS (SELECT id1, id2,
                     round(
                       list_sum(list_transform(range(1, 65),
                         i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) /
                       (sqrt(list_sum(list_transform(range(1, 65),
                         i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)))) *
                        sqrt(list_sum(list_transform(range(1, 65),
                         i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))), 4) AS cosine
              FROM cand JOIN embeddings x ON cand.id1 = x.vec_id
                        JOIN embeddings y ON cand.id2 = y.vec_id)
      SELECT id1, id2, cosine FROM ver WHERE cosine >= 0.4
      """.trim
    })

  /** Eval-set decontamination by EMBEDDING similarity (q62 is the
    * n-gram flavor): every corpus vector within cosine >= 0.4 of any
    * eval vector (vec_id % 50 = 0) is flagged, via the cross-set
    * hyperplane-LSH join — eval bucket keys broadcast, corpus scanned
    * once, exact-cosine verify on candidates only. The oracle replays
    * the full pipeline (sign bits -> per-table buckets -> cross-set
    * candidates -> verify) with the same md5-derived hyperplanes.
    */
  val q106 = GraftQuery(
    "q106_decontaminate_embedding",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.lshBucketedPairsAcross(
        emb.filter(col("vec_id") % 50 === 0),
        emb.filter(col("vec_id") % 50 =!= 0),
        "vec_id", "embedding", threshold = 0.4, bits = 4, tables = 16)
        .withColumnRenamed("probe_id", "eval_id")
    },
    Some {
      val hps = graft.operators.Similarity.lshHyperplanes(16, 4, 64)
      val hpRows = (for { t <- 0 until 16; k <- 0 until 4 } yield {
        val arr = hps(t)(k).map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
        s"($t, $k, $arr)"
      }).mkString(",\n        ")
      s"""
      WITH hp(table_idx, bit_idx, h) AS (VALUES
        $hpRows),
      sb AS (
        SELECT e.vec_id, hp.table_idx,
               CASE WHEN list_sum(list_transform(range(1, 65),
                      i -> CAST(e.embedding[i] AS DOUBLE) * hp.h[i])) >= 0
                    THEN (CAST(1 AS BIGINT) << hp.bit_idx) ELSE CAST(0 AS BIGINT) END AS bit_val
        FROM embeddings e CROSS JOIN hp),
      keyed AS (SELECT vec_id, table_idx, CAST(sum(bit_val) AS BIGINT) AS bucket
                FROM sb GROUP BY 1, 2),
      cand AS (SELECT DISTINCT a.vec_id AS eval_id, b.vec_id AS corpus_id
               FROM keyed a JOIN keyed b
                 ON a.table_idx = b.table_idx AND a.bucket = b.bucket
               WHERE a.vec_id % 50 = 0 AND b.vec_id % 50 <> 0),
      ver AS (SELECT eval_id, corpus_id,
                     round(
                       list_sum(list_transform(range(1, 65),
                         i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) /
                       (sqrt(list_sum(list_transform(range(1, 65),
                         i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)))) *
                        sqrt(list_sum(list_transform(range(1, 65),
                         i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))), 4) AS cosine
              FROM cand JOIN embeddings x ON cand.eval_id = x.vec_id
                        JOIN embeddings y ON cand.corpus_id = y.vec_id)
      SELECT eval_id, corpus_id, cosine FROM ver WHERE cosine >= 0.4
      """.trim
    })

  /** Near-dup pairs promoted to dedup clusters: connected components
    * over the exact-Jaccard pair graph, every doc labeled with its
    * component's minimum doc id (the canonical survivor). The oracle
    * recomputes the pairs (q21's SQL) and closes them with a
    * recursive CTE — min over the transitive reachability set equals
    * min-label propagation's fixpoint.
    */
  private val componentsOracleSql = s"""
      WITH RECURSIVE $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (
        SELECT id1, id2
        FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
        WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.5),
      edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                UNION SELECT id2, id1 FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.id)
      SELECT id, min(r) AS component_id FROM reach GROUP BY id
    """.trim

  val q47 = GraftQuery(
    "q47_dedup_components",
    (s, d) => Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.5),
      "id1", "id2"),
    Some(componentsOracleSql))

  /** q47's scale twin: same component semantics (min doc id per
    * near-dup component, same recursive-CTE oracle), but computed with
    * alternating large-star/small-star — O(log n) rounds instead of
    * O(diameter). Near-dup graphs at 100 TB grow chain-shaped
    * components (A~B~C~… under a fixed threshold), where
    * diameter-bound min-label propagation is the wrong plan; this is
    * the declared form for that regime (one semantics, two physical
    * plans — the q28/q42 pattern).
    */
  val q47a = GraftQuery(
    "q47_dedup_components_largestar",
    (s, d) => Dedup.connectedComponentsLargeStar(
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.5),
      "id1", "id2"),
    Some(componentsOracleSql))

  /** Quality-aware canonical selection: each near-dup component keeps
    * its BEST member (max q31 quality score, ties to min doc_id)
    * instead of the min-id survivor — the curation decision a real
    * training-data pipeline makes. Components from the exact pair
    * graph (q47); singletons survive as themselves. The argmax is a
    * min(struct(-quality, doc_id)) hash aggregate — map-side
    * combinable, no per-component window sort (negation is exact in
    * IEEE, so -(-q) returns q bit-for-bit; quality > 0 always, so no
    * -0.0 edge). Output: (component_id, survivor_id,
    * survivor_quality, n_members).
    */
  val q107 = GraftQuery(
    "q107_keep_best_canonical",
    (s, d) => {
      import graft.functions.{QualityFunctions => Q, TextFunctions => TF}
      val docsDf = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docsDf, "doc_id", "text",
        n = 3, threshold = 0.5)
      val comps = Dedup.connectedComponents(pairs, "id1", "id2")
      val labeled = docsDf
        .select(col("doc_id"), Q.qualityScore(TF.tokens(col("text"))).as("q"))
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("component_id", coalesce(col("component_id"), col("doc_id")))
      labeled.groupBy(col("component_id"))
        .agg(min(struct((-col("q")).as("nq"), col("doc_id").as("d"))).as("best"),
          count(lit(1)).as("n_members"))
        .select(col("component_id"),
          col("best").getField("d").as("survivor_id"),
          (-col("best").getField("nq")).as("survivor_quality"),
          col("n_members"))
    },
    Some(s"""
      WITH RECURSIVE $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (
        SELECT id1, id2
        FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
        WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.5),
      edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                UNION SELECT id2, id1 FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.id),
      comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
      qual AS (
        SELECT doc_id,
               floor((least(CAST(len(words) AS DOUBLE) / 50.0, 1.0) * 0.4 +
                     (1.0 - CAST(len(list_filter(words, x -> x IN ('the', 'a'))) AS DOUBLE) / len(words)) * 0.3 +
                     (CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) * 0.3) * 10000) / 10000 AS q
        FROM w),
      labeled AS (
        SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS component_id, qual.q
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        JOIN qual ON qual.doc_id = d.doc_id),
      best AS (
        SELECT component_id, doc_id AS survivor_id, q AS survivor_quality,
               row_number() OVER (PARTITION BY component_id
                                  ORDER BY q DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY component_id) AS n_members
        FROM labeled)
      SELECT component_id, survivor_id, survivor_quality,
             CAST(n_members AS BIGINT) AS n_members
      FROM best WHERE rn = 1
    """.trim))

  /** Second pipeline composition (q38's sibling built from the r2
    * operators): deterministic stratified sample -> exact near-dup
    * pairs within the sample -> connected components -> keep only
    * each component's canonical doc -> token-budget packing. The
    * whole pre-training mix flow, one verified query.
    */
  val q59 = GraftQuery(
    "q59_mix_pipeline",
    (s, d) => {
      import graft.operators.{Dedup, Packing, Sampling}
      import graft.functions.{TextFunctions => T}
      // cache: the sample feeds pair mining AND the survivor join
      val sampled = Sampling.stratifiedSample(Tables.documents(s, d),
        "doc_id", "lang", rates = Map("en" -> 0.25), defaultRate = 0.75)
        .select(col("doc_id"), col("text")).cache()
      val pairs = Dedup.ngramJaccardPairs(sampled, "doc_id", "text",
        n = 3, threshold = 0.5)
      val comps = Dedup.connectedComponents(pairs, "id1", "id2")
      val survivors = sampled.join(
          comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .filter(col("component_id").isNull || col("component_id") === col("doc_id"))
        .select(col("doc_id"), size(T.tokens(col("text"))).as("tokens"))
      Packing.packByBudgetDistributed(survivors, "doc_id", "tokens", 500L)
    },
    Some(s"""
      WITH RECURSIVE samp AS (
        SELECT doc_id, text FROM documents
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 <
              CASE WHEN lang = 'en' THEN 2500 ELSE 7500 END),
      w AS (SELECT doc_id, string_split(text, ' ') AS words FROM samp),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(range(1, len(words) - 1),
                                  i -> array_to_string(words[i:i+2], ' '))) AS s
             FROM w WHERE len(words) >= 3),
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (
        SELECT id1, id2
        FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
        WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.5),
      edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                UNION SELECT id2, id1 FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.id),
      comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
      surv AS (
        SELECT s.doc_id, CAST(len(string_split(s.text, ' ')) AS BIGINT) AS tokens
        FROM samp s LEFT JOIN comp c ON s.doc_id = c.id
        WHERE c.id IS NULL OR c.comp = s.doc_id)
      SELECT doc_id, tokens,
             CAST(coalesce(sum(tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before,
             CAST(coalesce(sum(tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 500 AS pack_id
      FROM surv
    """.trim))

  /** Cross-source overlap matrix: for every pair of sources, the
    * number of distinct 3-gram shingles both contain — the corpus
    * forensics a mix designer runs to find which domains duplicate
    * each other. One shuffle: (source, shingle) pairs deduped and
    * pre-partitioned on the join key so the self-join reuses a single
    * exchange.
    */
  val q67 = GraftQuery(
    "q67_source_overlap",
    (s, d) => {
      // spread + materialize (r19): the shingle explode must not run
      // on the single-split scan, and both self-join sides fan out of
      // the cache concurrently (Par scaladoc)
      val ps = graft.operators.Par.materialize(
        graft.operators.Par.spread(
            Tables.documents(s, d)
              .select(col("doc_id"), col("source"), col("text")),
            col("doc_id"))
          .select(col("source"), explode(T.shingles(col("text"), 3)).as("sg"))
          .distinct()
          .repartition(col("sg"))
          .cache())
      ps.as("a")
        .join(ps.as("b"),
          col("a.sg") === col("b.sg") && col("a.source") < col("b.source"))
        .select(col("a.source").as("source1"), col("b.source").as("source2"))
        .groupBy(col("source1"), col("source2"))
        .agg(count(lit(1)).as("n_shared"))
    },
    Some("""
      WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
      sh AS (SELECT source,
                    list_distinct(list_transform(range(1, len(words) - 1),
                                  i -> array_to_string(words[i:i+2], ' '))) AS s
             FROM w WHERE len(words) >= 3),
      ps AS (SELECT DISTINCT source, unnest(s) AS sg FROM sh)
      SELECT a.source AS source1, b.source AS source2, count(*) AS n_shared
      FROM ps a JOIN ps b ON a.sg = b.sg AND a.source < b.source
      GROUP BY 1, 2
    """.trim))

  /** Incremental dedup: the new batch (doc_id % 10 = 0) deduped
    * against the existing corpus (the rest) via cross-table
    * MinHash+LSH — the batch's band keys broadcast, the corpus never
    * self-joins. The oracle replays the full cross-side pipeline.
    */
  val q68 = GraftQuery(
    "q68_incremental_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.minhashLshPairsAcross(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
    },
    Some {
      val p = T.MinhashP
      val sigEntries = T.MinhashAB.map { case (a, b) =>
        s"list_aggregate(list_transform(xi, x -> (x * $a + $b) % $p), 'min')"
      }.mkString(",\n                    ")
      val bandEntries = (0 until 4).map { j =>
        s"array_to_string(sg[${j * 4 + 1}:${j * 4 + 4}], ',')"
      }.mkString(", ")
      s"""
      WITH $duckShingles,
      ints AS (SELECT doc_id, s,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS xi
               FROM sh),
      sig AS (SELECT doc_id, s,
                     [$sigEntries] AS sg
              FROM ints),
      bands AS (SELECT doc_id, s, band_idx, [$bandEntries][band_idx + 1] AS band_key
                FROM sig, unnest([0, 1, 2, 3]) AS t(band_idx)),
      cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
               FROM bands a JOIN bands b
                 ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
      verified AS (SELECT new_id, corpus_id,
                          floor(len(list_intersect(x.s, y.s)) * 1.0 /
                                (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
                   FROM cand JOIN sh x ON new_id = x.doc_id JOIN sh y ON corpus_id = y.doc_id)
      SELECT new_id, corpus_id, jaccard FROM verified WHERE jaccard >= 0.5
      """.trim
    })

  /** Store location for q103, keyed by the scale-factor dir (q42's
    * pattern: a stale store from another SF can't satisfy the
    * build-if-absent guard; the oracle never references the path).
    */
  def sigStorePath(sfDir: String): String =
    "/tmp/graft_q103_sig_store_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Store-level completion: both tables committed AND the store
    * marker matches these exact build parameters — a partial overwrite
    * or a stale store built with a different geometry is rebuilt.
    */
  private def sigStoreComplete(path: String): Boolean =
    Dedup.signatureStoreComplete(path, n = 3, bands = 4, rowsPerBand = 4)

  private def buildSigStore(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val path = sigStorePath(d)
    Dedup.signatureStoreWrite(
      Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0),
      "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, path)
    path
  }

  /** Signature-store build (q68's corpus side persisted), timed apart
    * from the search. The declared result is the read-back per-band
    * key inventory, so the oracle — which recomputes the full
    * shingle -> minhash -> band pipeline from the documents table —
    * verifies the written store at the (band, row-count, distinct-key)
    * grain: a dropped or double-written signature row breaks the hash.
    */
  val q103a = GraftQuery(
    "q103_signature_store_build",
    (s, d) => {
      val path = buildSigStore(s, d)
      s.read.parquet(s"$path/bands")
        .groupBy(col("band_idx").cast("bigint").as("band_idx"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("band_key")).as("n_keys"))
    },
    Some {
      val p = T.MinhashP
      val sigEntries = T.MinhashAB.map { case (a, b) =>
        s"list_aggregate(list_transform(xi, x -> (x * $a + $b) % $p), 'min')"
      }.mkString(",\n                    ")
      val bandEntries = (0 until 4).map { j =>
        s"array_to_string(sg[${j * 4 + 1}:${j * 4 + 4}], ',')"
      }.mkString(", ")
      s"""
      WITH $duckShingles,
      ints AS (SELECT doc_id,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS xi
               FROM sh WHERE doc_id % 10 <> 0),
      sig AS (SELECT doc_id, [$sigEntries] AS sg FROM ints),
      bands AS (SELECT doc_id, band_idx, [$bandEntries][band_idx + 1] AS band_key
                FROM sig, unnest([0, 1, 2, 3]) AS t(band_idx))
      SELECT CAST(band_idx AS BIGINT) AS band_idx,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT band_key) AS BIGINT) AS n_keys
      FROM bands GROUP BY band_idx
      """.trim
    })

  /** q68's incremental dedup against the PERSISTED signature store:
    * identical output, but the corpus side reads q103a's parquet —
    * no corpus re-tokenization anywhere in the search plan (asserted
    * in DedupSpec). Same oracle as q68 (the q42/q81 pattern: one
    * semantics, two physical plans). Build-if-absent keeps the query
    * self-sufficient under Verify's unordered map iteration; the
    * guard checks both _SUCCESS markers, not bare existence.
    */
  val q103 = GraftQuery(
    "q103_signature_store_search",
    (s, d) => {
      val path = sigStorePath(d)
      if (!sigStoreComplete(path)) buildSigStore(s, d)
      Dedup.minhashLshPairsAgainstStore(
        Tables.documents(s, d).filter(col("doc_id") % 10 === 0), path,
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
    },
    q68.oracle)

  /** q68/q103 through the full STREAMING ingest shape: the new batch
    * (doc_id % 10 = 0) is written out as two parquet arrival files,
    * streamed back with maxFilesPerTrigger=1 (two micro-batches), and
    * each micro-batch dedupes against the persisted signature store
    * inside foreachBatch (`EventStreams.dedupAgainstStoreStreaming`).
    * Micro-batches partition the new set and pair generation is
    * per-new-doc independent, so the union over batches equals the
    * one-shot run — same oracle as q68 (one semantics, now THREE
    * physical plans: in-memory cross, store search, streaming store
    * search). Matches sink to a parquet AUDIT table appended per
    * micro-batch — zero driver state, the idiomatic foreachBatch
    * side-output shape — and the declared result reads the audit
    * table back. Scratch dirs are removed in a finally (result is
    * localCheckpoint-materialized first).
    */
  val q105 = GraftQuery(
    "q105_stream_store_dedup",
    (s, d) => {
      val path = sigStorePath(d)
      if (!sigStoreComplete(path)) buildSigStore(s, d)
      val arrivals = java.nio.file.Files
        .createTempDirectory("graft_q105_arrivals").toString
      val audit = java.nio.file.Files
        .createTempDirectory("graft_q105_audit").toString
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
        f.delete()
      }
      try {
        val newDocs = Tables.documents(s, d)
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text"))
        newDocs.filter(col("doc_id") % 20 === 0)
          .coalesce(1).write.parquet(s"$arrivals/batchA")
        newDocs.filter(col("doc_id") % 20 =!= 0)
          .coalesce(1).write.parquet(s"$arrivals/batchB")
        val stream = s.readStream.schema(newDocs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(arrivals)
        val q = graft.streaming.EventStreams.dedupAgainstStoreStreaming(
          stream, path, "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4,
          threshold = 0.5) { pairs =>
          pairs.write.mode("append").parquet(s"$audit/matches")
        }
        q.awaitTermination()
        // materialize before the finally removes the audit scratch
        s.read.parquet(s"$audit/matches")
          .select(col("new_id"), col("corpus_id"), col("jaccard"))
          .localCheckpoint(true)
      } finally {
        rmrf(new java.io.File(arrivals))
        rmrf(new java.io.File(audit))
      }
    },
    q68.oracle)

  /** The permissive radius (hamming <= 12) through the multi-index
    * Hamming path: wide 15-bit chunks + popcount-bounded neighbor
    * enumeration keep the candidate join linear where the 5-bit
    * pigeonhole verifier (spec-only since r10) is quadratic-class.
    * Identical output, same oracle — the q28/q42 pattern: one
    * semantics, two physical plans, the scale-shaped one declared.
    */
  val q75 = GraftQuery(
    "q75_dedup_simhash_mih",
    (s, d) => Dedup.simhashMihPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, maxHamming = 12, chunks = 4),
    Some(simhashOracle(12)))

  /** Passage-window dedup (RefinedWeb-style substring dedup): chunk
    * into 8-token windows, keep each distinct window's corpus-wide
    * first occurrence, reassemble the surviving text per document.
    */
  val q78 = GraftQuery(
    "q78_passage_dedup",
    (s, d) => graft.operators.PassageDedup.dedupPassages(
      Tables.documents(s, d), "doc_id", "text", window = 8),
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      chunks AS (
        SELECT doc_id, i AS idx,
               array_to_string(words[(i*8+1):(i*8+8)], ' ') AS passage
        FROM (SELECT doc_id, words,
                     unnest(range(0, CAST(ceil(len(words) / 8.0) AS BIGINT))) AS i
              FROM w WHERE len(words) > 0)),
      ranked AS (
        SELECT doc_id, idx, passage,
               row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx) AS rn
        FROM chunks),
      totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total
                 FROM chunks GROUP BY doc_id),
      kept AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(passage, ' ' ORDER BY idx) AS text_deduped
        FROM ranked WHERE rn = 1 GROUP BY doc_id)
      SELECT doc_id, n_total, n_kept, text_deduped
      FROM kept JOIN totals USING (doc_id)
    """.trim))

  /** q21's pairs through the PPJoin prefix filter: rarest-first
    * canonical order, per-doc prefixes of |s|-ceil(t|s|)+1 shingles,
    * posting lists over prefixes only, exact verify on candidates.
    * Identical output, linear-class candidate stage, no df cap needed
    * — same oracle as q21 (the q42/q81 pattern).
    */
  val q82 = GraftQuery(
    "q82_dedup_ngram_prefix",
    (s, d) => Dedup.ngramJaccardPrefixPairs(Tables.documents(s, d),
      "doc_id", "text", n = 3, threshold = 0.5),
    q21.oracle)

  /** The round-7 production recipe end-to-end: char-entropy gate
    * (drops the low-information tail) → winnowing near-dup dedup
    * (docs sharing >= 2 winnowed fingerprints lose their non-canonical
    * members; posting lists are df-capped like every pair stage in the
    * repo) → temperature mix over the survivors (p_s ∝ sqrt(n_s)) →
    * deterministic shard assignment with a per-shard inventory. Every
    * stage is individually driver-verified (q118, q117, q114, q112);
    * this composes them and the oracle replays the WHOLE chain, so a
    * drift anywhere in the recipe breaks the final shard counts.
    * Corpus-shuffle inventory: fingerprint distinct + posting groupBy
    * (band-key-sized rows), one count aggregate for the mix, and the
    * final 8-row stat aggregate — the document text itself never
    * shuffles.
    */
  val q120 = GraftQuery(
    "q120_curation_to_shards",
    (s, d) => {
      import graft.functions.{QualityFunctions => Q}
      val docs = Tables.documents(s, d)
      // spread + cache-then-filter (r19): the char-entropy gate is the
      // expensive per-row stage — computed below a cache it runs
      // single-task on the narrow scan (and Catalyst pushes a direct
      // filter under the spread exchange); cached as a column, the
      // gate is a cheap predicate over the materialized cache, which
      // the downstream fan-out (fingerprints + survivor join + mix)
      // reads concurrently (Par scaladoc)
      val kept1 = graft.operators.Par.materialize(
          graft.operators.Par.spread(
              docs.select(col("doc_id"), col("source"), col("text")),
              col("doc_id"))
            .withColumn("h", Q.charEntropy(col("text")))
            .cache())
        .filter(col("h") >= 3.95)
        .select(col("doc_id"), col("source"), col("text"))
      val fps = Dedup.winnowedFingerprints(kept1, "doc_id", "text")
      val dropped = fps.groupBy(col("fp"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= 1000)
        .select(posexplode(col("ids")).as(Seq("i", "id1")), col("ids"))
        .select(col("id1"),
          explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(col("id2").as("doc_id"))
        .distinct()
      val kept2 = kept1.join(dropped, Seq("doc_id"), "left_anti")
      val mixed = graft.operators.Sampling.temperatureMix(
        kept2, "doc_id", "source", targetTotal = 150L)
      graft.operators.Sampling.assignShards(mixed, "doc_id", nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
    },
    Some("""
      WITH ch AS (SELECT doc_id, source, text,
                         list_filter(string_split(text, ''), x -> x <> '') AS chars
                  FROM documents),
      ent AS (SELECT doc_id, source, text,
              CASE WHEN len(chars) > 0 THEN
                floor(-list_sum(list_transform(list_distinct(chars),
                  c2 -> (CAST(len(list_filter(chars, x -> x = c2)) AS DOUBLE) / len(chars)) *
                        log2(CAST(len(list_filter(chars, x -> x = c2)) AS DOUBLE) / len(chars))))
                  * 10000) / 10000 + 0.0
              ELSE 0.0 END AS h
              FROM ch),
      kept1 AS (SELECT doc_id, source, text FROM ent WHERE h >= 3.95),
      w AS (SELECT doc_id, string_split(text, ' ') AS words FROM kept1),
      g AS (SELECT doc_id, list_transform(range(1, len(words) - 1),
              i -> CAST('0x' || substr(md5(array_to_string(words[i:i+2], ' ')), 1, 8) AS BIGINT)) AS xi
            FROM w WHERE len(words) >= 3),
      wins AS (SELECT doc_id, unnest(CASE WHEN len(xi) >= 4
                 THEN list_transform(range(1, len(xi) - 2), i -> list_aggregate(xi[i:i+3], 'min'))
                 ELSE [list_aggregate(xi, 'min')] END) AS fp FROM g),
      fpd AS (SELECT DISTINCT doc_id, fp FROM wins),
      keepfp AS (SELECT fp FROM fpd GROUP BY fp HAVING count(*) > 1 AND count(*) <= 1000),
      pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.doc_id < b.doc_id
                JOIN keepfp k ON a.fp = k.fp
                GROUP BY 1, 2 HAVING count(*) >= 2),
      dropped AS (SELECT DISTINCT id2 FROM pairs),
      kept2 AS (SELECT doc_id, source FROM kept1
                WHERE doc_id NOT IN (SELECT id2 FROM dropped)),
      cnts AS (SELECT source, count(*) AS n FROM kept2 GROUP BY source),
      wt AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS wt FROM cnts),
      tot AS (SELECT CAST(sum(wt) AS BIGINT) AS w_sum FROM wt),
      r AS (SELECT source, CAST(least(10000, (150 * wt * 10000) // (w_sum * n)) AS BIGINT) AS rate_bp
            FROM wt CROSS JOIN tot),
      mixed AS (SELECT k.doc_id, k.source FROM kept2 k JOIN r USING (source)
                WHERE CAST('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 < r.rate_bp)
      SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM mixed GROUP BY shard
    """.trim))

  /** Span-level duplication (Lee et al. 2022): every 8-token gram in
    * >= 2 distinct docs flags its span; per-doc merged coverage via
    * the equal-length-interval fold (see Dedup.duplicateSpans). The
    * oracle replays gram hashing, the cross-doc df filter, and the
    * sorted-gap merge arithmetic; dup_frac_bp is integer basis points
    * (`div` / `//`), never a double ratio.
    */
  val q122 = GraftQuery(
    "q122_duplicate_spans",
    (s, d) => Dedup.duplicateSpans(
      Tables.documents(s, d), "doc_id", "text", k = 8),
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      g AS (SELECT doc_id, len(words) AS n_tokens,
                   unnest(range(1, len(words) - 6)) AS s, words
            FROM w WHERE len(words) >= 8),
      o AS (SELECT doc_id, n_tokens, s,
                   CAST('0x' || substr(md5(array_to_string(words[s:s+7], ' ')), 1, 8) AS BIGINT) AS gh
            FROM g),
      dup AS (SELECT gh FROM o GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      d AS (SELECT doc_id, n_tokens, s FROM o JOIN dup USING (gh)),
      agg AS (SELECT doc_id, n_tokens, list_sort(list(s)) AS ss,
                     count(*) AS n_dup_grams
              FROM d GROUP BY doc_id, n_tokens),
      m AS (SELECT doc_id, n_tokens, n_dup_grams,
                   list_transform(range(1, len(ss)), i -> ss[i+1] - ss[i]) AS diffs
            FROM agg)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_dup_grams,
             CAST(1 + len(list_filter(diffs, x -> x > 8)) AS BIGINT) AS n_spans,
             CAST(8 + coalesce(list_sum(list_transform(diffs, x -> least(x, 8))), 0) AS BIGINT) AS dup_tokens,
             CAST((8 + coalesce(list_sum(list_transform(diffs, x -> least(x, 8))), 0)) * 10000 AS BIGINT) // n_tokens AS dup_frac_bp
      FROM m
    """.trim))

  /** Store lifecycle closed: build → VACUUM (drop signatures of
    * retired corpus docs, id ≡ 12 mod 20 — a set that really holds
    * match partners at sf0.01, so the vacuum visibly changes the
    * result) → search. The oracle is q68's replay restricted to the
    * surviving corpus: pairs whose partner was vacuumed MUST
    * disappear. The store builds fresh each run (vacuum is
    * destructive; the q103 build-if-absent guard pattern can't reuse
    * an already-vacuumed store) at its own path so q103/q105 keep
    * their full store.
    */
  val q130 = GraftQuery(
    "q130_signature_store_vacuum",
    (s, d) => {
      val path = "/tmp/graft_q130_sig_store_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = Tables.documents(s, d)
      Dedup.signatureStoreWrite(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, path)
      Dedup.signatureStoreVacuum(s,
        docs.filter(col("doc_id") % 20 === 12).select(col("doc_id")),
        "doc_id", n = 3, bands = 4, rowsPerBand = 4, path)
      Dedup.minhashLshPairsAgainstStore(
        docs.filter(col("doc_id") % 10 === 0), path,
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
    },
    Some {
      val p = T.MinhashP
      val sigEntries = T.MinhashAB.map { case (a, b) =>
        s"list_aggregate(list_transform(xi, x -> (x * $a + $b) % $p), 'min')"
      }.mkString(",\n                    ")
      val bandEntries = (0 until 4).map { j =>
        s"array_to_string(sg[${j * 4 + 1}:${j * 4 + 4}], ',')"
      }.mkString(", ")
      s"""
      WITH $duckShingles,
      ints AS (SELECT doc_id, s,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS xi
               FROM sh),
      sig AS (SELECT doc_id, s,
                     [$sigEntries] AS sg
              FROM ints),
      bands AS (SELECT doc_id, s, band_idx, [$bandEntries][band_idx + 1] AS band_key
                FROM sig, unnest([0, 1, 2, 3]) AS t(band_idx)),
      cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
               FROM bands a JOIN bands b
                 ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
                 AND b.doc_id % 20 <> 12),
      verified AS (SELECT new_id, corpus_id,
                          floor(len(list_intersect(x.s, y.s)) * 1.0 /
                                (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
                   FROM cand JOIN sh x ON new_id = x.doc_id JOIN sh y ON corpus_id = y.doc_id)
      SELECT new_id, corpus_id, jaccard FROM verified WHERE jaccard >= 0.5
      """.trim
    })

  /** n-gram CONTAINMENT pairs (Broder 1997): |A∩B| / min(|A|,|B|) —
    * the doc-in-doc detector Jaccard misses (a page quoted whole
    * inside a 10x-larger page scores ~1.0 here, <= 0.1 on q21).
    * Same posting-list physical shape as q21; the score grid is
    * exact-integer (inter*10000 over a long min) so the oracle
    * replays it digit-for-digit.
    */
  val q132 = GraftQuery(
    "q132_dedup_containment",
    (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.8),
    Some(s"""
      WITH $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
      SELECT id1, id2,
             floor(inter * 10000.0 / least(x.n_sh, y.n_sh)) / 10000 AS containment
      FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE floor(inter * 10000.0 / least(x.n_sh, y.n_sh)) / 10000 >= 0.8
    """.trim))

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995): verify
    * only pairs within `window` positions of each other in the
    * normalized-prefix total order — ORDER-locality blocking, the
    * classic merge/purge complement to the content-signature families
    * (q21/q22/q60). The global rank comes from range partition +
    * local sort + broadcast prefix offsets (the q90 discipline — no
    * global Window, asserted in PlanAssertionsSpec); the oracle
    * replays the same total order with row_number and a rank-distance
    * self-join. The blocking key strips to ASCII alphanumerics before
    * lowercasing, so both engines sort in pure byte order.
    */
  val q150 = GraftQuery(
    "q150_dedup_sorted_neighborhood",
    (s, d) => Dedup.sortedNeighborhoodPairs(Tables.documents(s, d), "doc_id",
      "text", n = 3, window = 10, threshold = 0.5),
    Some(s"""
      WITH $duckShingles,
      k AS (SELECT doc_id,
                   substr(lower(regexp_replace(coalesce(text, ''), '[^A-Za-z0-9]', '', 'g')), 1, 16) AS skey
            FROM documents),
      rk AS (SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) - 1 AS r FROM k),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, b.r - a.r AS rank_dist
               FROM rk a JOIN rk b ON b.r - a.r BETWEEN 1 AND 9),
      v AS (SELECT id1, id2, rank_dist,
                   floor(len(list_intersect(x.s, y.s)) * 1.0 /
                         (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
            FROM cand JOIN sh x ON id1 = x.doc_id JOIN sh y ON id2 = y.doc_id)
      SELECT id1, id2, rank_dist, jaccard FROM v WHERE jaccard >= 0.5
    """.trim))

  /** Multi-pass SNM — q150's documented recall lever made real: pass
    * 1 blocks on the normalized PREFIX, pass 2 on the reversed string
    * (suffix blocking), pairs unioned with the smallest rank
    * distance. A near-dup whose edit sits in the first words escapes
    * pass 1's neighborhood but lands adjacent in pass 2 — the
    * protocol Hernández & Stolfo prescribe. Keys stay in the ASCII
    * byte-order alphabet, so reverse() is engine-identical.
    */
  val q164 = GraftQuery(
    "q164_dedup_snm_multipass",
    (s, d) => {
      val norm = Dedup.snmNormalized(col("text"))
      Dedup.sortedNeighborhoodMultiPass(Tables.documents(s, d), "doc_id",
        "text", n = 3, window = 10, threshold = 0.5,
        sortKeys = Seq(substring(norm, 1, 16), substring(reverse(norm), 1, 16)))
    },
    Some {
      val normSql = "lower(regexp_replace(coalesce(text, ''), '[^A-Za-z0-9]', '', 'g'))"
      def pass(tag: String, keySql: String) = s"""
      k$tag AS (SELECT doc_id, $keySql AS skey FROM documents),
      r$tag AS (SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) - 1 AS r FROM k$tag),
      p$tag AS (SELECT a.doc_id AS id1, b.doc_id AS id2, b.r - a.r AS rank_dist
                FROM r$tag a JOIN r$tag b ON b.r - a.r BETWEEN 1 AND 9)""".trim
      s"""
      WITH $duckShingles,
      ${pass("1", s"substr($normSql, 1, 16)")},
      ${pass("2", s"substr(reverse($normSql), 1, 16)")},
      cand AS (SELECT id1, id2, min(rank_dist) AS rank_dist
               FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
               GROUP BY 1, 2),
      v AS (SELECT id1, id2, rank_dist,
                   floor(len(list_intersect(x.s, y.s)) * 1.0 /
                         (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
            FROM cand JOIN sh x ON id1 = x.doc_id JOIN sh y ON id2 = y.doc_id)
      SELECT id1, id2, rank_dist, jaccard FROM v WHERE jaccard >= 0.5
      """.trim
    })

  /** CCNet-style boilerplate removal: 4-token windows shared by >= 3
    * distinct documents are dropped from EVERY document (q78 keeps the
    * first occurrence; boilerplate deserves no survivor). Fully-
    * boilerplate docs stay as empty rows for the downstream length
    * gate.
    */
  val q165 = GraftQuery(
    "q165_boilerplate_removal",
    (s, d) => graft.operators.PassageDedup.removeBoilerplate(
      Tables.documents(s, d), "doc_id", "text", window = 4, minDf = 3),
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      chunks AS (
        SELECT doc_id, i AS idx,
               array_to_string(words[(i*4+1):(i*4+4)], ' ') AS passage
        FROM (SELECT doc_id, words,
                     unnest(range(0, CAST(ceil(len(words) / 4.0) AS BIGINT))) AS i
              FROM w WHERE len(words) > 0)),
      hot AS (SELECT passage FROM chunks GROUP BY passage
              HAVING count(DISTINCT doc_id) >= 3),
      totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total
                 FROM chunks GROUP BY doc_id),
      kept AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(passage, ' ' ORDER BY idx) AS text_clean
        FROM chunks ANTI JOIN hot USING (passage) GROUP BY doc_id)
      SELECT t.doc_id, t.n_total,
             coalesce(k.n_kept, 0) AS n_kept,
             coalesce(k.text_clean, '') AS text_clean
      FROM totals t LEFT JOIN kept k USING (doc_id)
    """.trim))

  /** LSH recall self-audit: the engine measures its own
    * approximation — q21's exact n-gram-Jaccard pairs vs q22's
    * MinHash-LSH pairs on the same corpus and threshold, reduced to
    * (n_exact, n_lsh, n_common, recall_bp, n_extra). n_extra must be
    * 0 by construction (LSH candidates are exact-Jaccard-verified, so
    * precision is 1.0 and only recall is approximate) — the audit
    * PROVES it rather than asserting it. The oracle replays both full
    * pipelines and the set algebra.
    */
  val q217 = GraftQuery(
    "q217_lsh_recall_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // cache + materialize (r19, Par scaladoc): each pair set feeds
      // its own count, the semi join AND the anti join — three
      // concurrent consumers re-ran the full posting-join pipeline
      val exact = graft.operators.Par.materialize(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5).select(col("id1"), col("id2")).cache())
      val lsh = graft.operators.Par.materialize(
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5)
          .select(col("id1"), col("id2")).cache())
      val common = exact.join(lsh, Seq("id1", "id2"), "left_semi")
      val extra = lsh.join(exact, Seq("id1", "id2"), "left_anti")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(common.agg(count(lit(1)).as("n_common")))
        .crossJoin(extra.agg(count(lit(1)).as("n_extra")))
        .withColumn("recall_bp", expr("n_common * 10000L div n_exact"))
    },
    Some {
      val p = T.MinhashP
      val sigEntries = T.MinhashAB.map { case (a, b) =>
        s"list_aggregate(list_transform(xi, x -> (x * $a + $b) % $p), 'min')"
      }.mkString(",\n                    ")
      val bandEntries = (0 until 4).map { j =>
        s"array_to_string(sg[${j * 4 + 1}:${j * 4 + 4}], ',')"
      }.mkString(", ")
      s"""
      WITH $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      jcand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      exact AS (SELECT id1, id2
                FROM jcand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
                WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.5),
      ints AS (SELECT doc_id, s,
                      list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS xi
               FROM sh),
      sig AS (SELECT doc_id, s,
                     [$sigEntries] AS sg
              FROM ints),
      bands AS (SELECT doc_id, s, band_idx, [$bandEntries][band_idx + 1] AS band_key
                FROM sig, unnest([0, 1, 2, 3]) AS t(band_idx)),
      lcand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM bands a JOIN bands b
                  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id),
      lsh AS (SELECT id1, id2
              FROM (SELECT id1, id2,
                           floor(len(list_intersect(x.s, y.s)) * 1.0 /
                                 (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) * 10000) / 10000 AS jaccard
                    FROM lcand JOIN sh x ON id1 = x.doc_id JOIN sh y ON id2 = y.doc_id)
              WHERE jaccard >= 0.5),
      cm AS (SELECT count(*) AS n_common FROM exact
             WHERE EXISTS (SELECT 1 FROM lsh
                           WHERE lsh.id1 = exact.id1 AND lsh.id2 = exact.id2)),
      xt AS (SELECT count(*) AS n_extra FROM lsh
             WHERE NOT EXISTS (SELECT 1 FROM exact
                               WHERE lsh.id1 = exact.id1 AND lsh.id2 = exact.id2))
      SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
             CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
             CAST(cm.n_common AS BIGINT) AS n_common,
             CAST(xt.n_extra AS BIGINT) AS n_extra,
             CAST(cm.n_common * 10000 // (SELECT count(*) FROM exact) AS BIGINT) AS recall_bp
      FROM cm CROSS JOIN xt
      """.trim
    })

  /** Near-dup cluster size distribution: how duplication mass is
    * shaped — many pairs, or a few giant blobs? (The histogram that
    * decides whether min-id canonicalization loses 1% or 30% of the
    * corpus.) Component sizes from q47's graph, then a histogram of
    * sizes — two hash aggregates over component ids.
    */
  val q222 = GraftQuery(
    "q222_dup_cluster_sizes",
    (s, d) => Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5),
        "id1", "id2")
      .groupBy(col("component_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs")),
    Some(s"""
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(cluster_size) AS BIGINT) AS n_docs
      FROM (SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size
            FROM ($componentsOracleSql) GROUP BY 1)
      GROUP BY 1
    """.trim))

  /** The round-10 curation recipe end-to-end — q120's composition
    * discipline applied to this round's operators, ONE oracle over
    * the whole chain: char-entropy quality gate → exact dedup
    * (min-id canonical per md5(text)) → DSIR importance selection
    * (top-150 most target-like survivors, English slice as target,
    * scored against the SURVIVOR distribution — selection composes
    * after dedup, not before) → token-budget source mix (400-token
    * md5-ordered prefix per source). Output is the final kept-doc
    * inventory with per-doc token evidence; any stage dropping or
    * admitting one wrong document changes the hash. Every stage is
    * the already-audited scale shape (bounded bucket table for DSIR,
    * one global prefix sum for the mix).
    */
  val q256 = GraftQuery(
    "q256_curation_recipe_r10",
    (s, d) => {
      import graft.functions.{QualityFunctions => Q, TextFunctions => T}
      val docs = Tables.documents(s, d)
      // spread + cache-then-filter: see q120 (r19)
      val kept1 = graft.operators.Par.materialize(
          graft.operators.Par.spread(
              docs.select(col("doc_id"), col("source"), col("lang"),
                col("text")),
              col("doc_id"))
            .withColumn("h", Q.charEntropy(col("text")))
            .cache())
        .filter(col("h") >= 3.95)
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
      // exact dedup: min-id canonical per full-text hash
      val canon = kept1.groupBy(md5(col("text")).as("th"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val kept2 = kept1.join(canon, Seq("doc_id"), "left_semi").cache()
      // DSIR selection over the survivors (target = English slice)
      val sel = graft.operators.ImportanceResampling.selectTopK(
          kept2, "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 64, k = 150)
        .select(col("doc_id"))
      val selected = kept2.join(sel, Seq("doc_id"), "left_semi")
      // token-budget mix over the selected docs
      graft.operators.Sampling.tokenBudgetMix(selected, "doc_id", "source",
          size(T.tokens(col("text"))), budgetPerSource = 400L)
        .select(col("id").as("doc_id"), col("source"),
          col("n_tokens"), col("cum_source"))
    },
    Some("""
      WITH ch AS (SELECT doc_id, source, lang, text,
                         list_filter(string_split(text, ''), x -> x <> '') AS chars
                  FROM documents),
      ent AS (SELECT doc_id, source, lang, text,
              CASE WHEN len(chars) > 0 THEN
                floor(-list_sum(list_transform(list_distinct(chars),
                  c2 -> (CAST(len(list_filter(chars, x -> x = c2)) AS DOUBLE) / len(chars)) *
                        log2(CAST(len(list_filter(chars, x -> x = c2)) AS DOUBLE) / len(chars))))
                  * 10000) / 10000 + 0.0
              ELSE 0.0 END AS h
              FROM ch),
      kept1 AS (SELECT doc_id, source, lang, text FROM ent WHERE h >= 3.95),
      canon AS (SELECT min(doc_id) AS doc_id FROM kept1 GROUP BY md5(text)),
      kept2 AS (SELECT k.* FROM kept1 k JOIN canon c USING (doc_id)),
      tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
              FROM kept2),
      tb AS (SELECT doc_id, lang,
                    CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 64 AS b
             FROM tok),
      counts AS (SELECT b, CAST(count(*) AS BIGINT) AS c_s,
                        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
                 FROM tb GROUP BY 1),
      tot AS (SELECT CAST(sum(c_s) AS BIGINT) AS n_s,
                     CAST(sum(c_t) AS BIGINT) AS n_t FROM counts),
      lr AS (SELECT b,
                    CAST(floor(ln(CAST((c_t + 1) * (n_s + 64) AS DOUBLE) /
                                  CAST((c_s + 1) * (n_t + 64) AS DOUBLE))
                               * 1000000) AS BIGINT) AS lr_e6
             FROM counts CROSS JOIN tot),
      score AS (SELECT tb.doc_id, CAST(sum(lr.lr_e6) AS BIGINT) AS score_e6
                FROM tb JOIN lr USING (b) GROUP BY 1),
      sel AS (SELECT doc_id FROM score
              ORDER BY score_e6 DESC, doc_id ASC LIMIT 150),
      mtok AS (SELECT k.doc_id, k.source,
                      CAST(len(string_split(k.text, ' ')) AS BIGINT) AS n_tokens,
                      md5(CAST(k.doc_id AS VARCHAR)) AS md5key
               FROM kept2 k JOIN sel USING (doc_id)),
      c AS (SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY source
                                       ORDER BY md5key, doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum_source
            FROM mtok)
      SELECT doc_id, source, n_tokens, CAST(cum_source AS BIGINT) AS cum_source
      FROM c WHERE cum_source <= 400
    """.trim))

  /** Leakage-safe splitting, with the naive scheme's damage MEASURED:
    * the split unit is the near-dup CLUSTER (q47's components), so no
    * near-dup pair can straddle train and test — the cluster scheme's
    * leak count is zero BY CONSTRUCTION and the driver hash proves
    * it; the document-level md5 split (what a pipeline without dedup
    * integration ships) is audited side by side with its measured
    * leaked-pair count. Same 80/10/10 md5 rule for both schemes, so
    * the only variable is the split unit. The oracle replays the
    * shingle graph, the recursive components, both split
    * assignments, and both leak counts.
    */
  val q266 = GraftQuery(
    "q266_leakage_safe_split",
    (s, d) => {
      import graft.operators.Sampling
      val docsDf = Tables.documents(s, d)
      // materialize (r19): the pair graph feeds components + BOTH
      // audits — three concurrent AQE consumers raced to build it
      val pairs = graft.operators.Par.materialize(
        Dedup.ngramJaccardPairs(docsDf, "doc_id", "text",
          n = 3, threshold = 0.5).cache())
      val comps = Dedup.connectedComponents(pairs, "id1", "id2")
      val safe = Sampling.leakageSafeSplit(docsDf, "doc_id", comps,
        trainBp = 8000L, valBp = 1000L)
      val naive = docsDf.select(col("doc_id").as("id"))
        .withColumn("split",
          when(Sampling.hashBucket(col("id")) < 8000L, "train")
            .when(Sampling.hashBucket(col("id")) < 9000L, "val")
            .otherwise("test"))
      def audit(asg: org.apache.spark.sql.DataFrame, scheme: String) = {
        val leak = pairs
          .join(asg.select(col("id").as("id1"), col("split").as("s1")),
            Seq("id1"))
          .join(asg.select(col("id").as("id2"), col("split").as("s2")),
            Seq("id2"))
          .agg(sum(when(col("s1") =!= col("s2"), 1L).otherwise(0L))
            .as("leak_pairs"))
        asg.agg(
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
            sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
          .crossJoin(leak)
          .select(lit(scheme).as("scheme"), col("n_train"), col("n_val"),
            col("n_test"), col("leak_pairs"))
      }
      audit(safe, "cluster") unionAll audit(naive, "document")
    },
    Some {
      def splitCase(key: String): String =
        s"""CASE WHEN CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8) AS BIGINT) % 10000 < 8000 THEN 'train'
                 WHEN CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8) AS BIGINT) % 10000 < 9000 THEN 'val'
                 ELSE 'test' END"""
      s"""
      WITH RECURSIVE $duckShingles,
      ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, len(s) AS n_sh FROM sh),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (
        SELECT id1, id2
        FROM cand JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
        WHERE floor(inter * 1.0 / (x.n_sh + y.n_sh - inter) * 10000) / 10000 >= 0.5),
      edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                UNION SELECT id2, id1 FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.id),
      comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
      asg AS (
        SELECT d.doc_id AS id,
               ${splitCase("coalesce(c.component_id, d.doc_id)")} AS cl_split,
               ${splitCase("d.doc_id")} AS doc_split
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
      lk AS (
        SELECT
          CAST(sum(CASE WHEN a.cl_split <> b.cl_split THEN 1 ELSE 0 END) AS BIGINT) AS cl_leaks,
          CAST(sum(CASE WHEN a.doc_split <> b.doc_split THEN 1 ELSE 0 END) AS BIGINT) AS doc_leaks
        FROM pairs p JOIN asg a ON a.id = p.id1 JOIN asg b ON b.id = p.id2)
      SELECT 'cluster' AS scheme,
             CAST(sum(CASE WHEN cl_split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN cl_split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             CAST(sum(CASE WHEN cl_split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
             (SELECT cl_leaks FROM lk) AS leak_pairs
      FROM asg
      UNION ALL
      SELECT 'document',
             CAST(sum(CASE WHEN doc_split = 'train' THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN doc_split = 'val' THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN doc_split = 'test' THEN 1 ELSE 0 END) AS BIGINT),
             (SELECT doc_leaks FROM lk)
      FROM asg
      """.trim
    })

  def all: Seq[GraftQuery] =
    Seq(q20, q21, q22, q39, q47, q47a, q59, q60, q61, q67, q68, q75,
      q78, q82, q103a, q103, q105, q106, q107, q113, q120, q122, q130, q132,
      q150, q164, q165, q217, q222, q256, q266)
}
