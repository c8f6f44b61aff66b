package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Driver-checkable similarity-search queries: exact brute-force
  * top-k as the baseline, IVF centroid assignment as the scale path.
  */
object SimilarityQueries extends QueryRegistry {

  /** Shared DuckDB cosine fragment over 64-dim float lists (double
    * widening + sequential sum, matching the Spark fold).
    */
  private[graft] def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))) /
        (sqrt(list_sum(list_transform(range(1, 65),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE)))) *
         sqrt(list_sum(list_transform(range(1, 65),
           i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))))))"""

  /** Exact ANN baseline: top-10 cosine neighbors for the first five
    * vectors, ties broken by neighbor id.
    */
  val q25 = GraftQuery(
    "q25_ann_brute_force_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 10)
    },
    Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(${duckCos("q", "c")}, 4) AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5)
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rn
      FROM scored
      QUALIFY rn <= 10
    """.trim))

  /** IVF assignment: nearest of 8 seed centroids (vec_id 0..7) by
    * squared L2, ties broken by centroid id — the partition layout a
    * 100 TB corpus would be bucketed by.
    */
  val q26 = GraftQuery(
    "q26_ann_ivf_assign",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfAssign(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", "vec_id", "embedding")
    },
    Some("""
      WITH dists AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8)
      SELECT id, centroid_id AS cluster_id, dist2
      FROM dists
      QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2 ASC, centroid_id ASC) = 1
    """.trim))

  /** Full IVF search: probe the 2 nearest of 8 centroids per query,
    * rank candidates inside the probed clusters only — the
    * partition-pruned approximate path (vs q25's exact scan).
    */
  val q28 = GraftQuery(
    "q28_ann_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb,
        emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
    },
    Some(s"""
      WITH l2 AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      assign AS (
        SELECT id, centroid_id AS cluster_id FROM l2
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      probe AS (
        SELECT id AS query_id, centroid_id AS cluster_id FROM l2
        WHERE id < 3
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) <= 2),
      scored AS (
        SELECT p.query_id, a.id AS neighbor_id,
               round(${duckCos("q", "e")}, 4) AS cosine
        FROM probe p
        JOIN assign a ON a.cluster_id = p.cluster_id AND a.id <> p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings e ON e.vec_id = a.id)
      SELECT query_id, neighbor_id, cosine FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) <= 5
    """.trim))

  /** Int8 quantization fidelity: per-vector absmax scale and the
    * cosine between the original and its quantize-dequantize round
    * trip — the check a pipeline runs before storing embeddings
    * quantized. All arithmetic mirrored exactly in the oracle.
    */
  val q29 = GraftQuery(
    "q29_quantize_int8_fidelity",
    (s, d) => {
      import graft.functions.{VectorFunctions => V}
      val emb = Tables.embeddings(s, d)
        .withColumn("scale", V.absmaxScale(col("embedding")))
        .filter(col("scale") > 0)
      emb.select(col("vec_id"),
        floor(col("scale") * 1000000).cast("long").as("scale_e6"),
        floor(V.cosine(col("embedding"),
          V.dequantizedInt8(col("embedding"), col("scale"))) * 10000)
          .cast("long").as("cos_bp"))
    },
    Some("""
      WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
               embedding
        FROM embeddings),
      deq AS (
        SELECT vec_id, scale, embedding,
               list_transform(embedding,
                 x -> floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) * scale / 127.0) AS dq
        FROM q WHERE scale > 0)
      SELECT vec_id,
             CAST(floor(scale * 1000000) AS BIGINT) AS scale_e6,
             CAST(floor(
               list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE) * dq[i])) /
               (sqrt(list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, 65),
                 i -> dq[i] * dq[i])))) * 10000) AS BIGINT) AS cos_bp
      FROM deq
    """.trim))

  /** Index location for q42, keyed by the scale-factor dir so a stale
    * index from another SF can never satisfy the build-if-absent guard
    * (oracle SQL never references the path — it recomputes from the
    * embeddings table).
    */
  def ivfIndexPath(sfDir: String): String =
    "/tmp/graft_q42_ivf_index_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  private def buildIndex(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = ivfIndexPath(d)
    val emb = Tables.embeddings(s, d)
    Similarity.ivfIndexWrite(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", "vec_id", "embedding", path,
      targetRowsPerFile = 256L)
    path
  }

  /** IVF index build, timed separately from the search (the r2 bench
    * folded a full corpus rewrite into the "search" timing). The
    * declared result is the read-back per-cluster inventory, so the
    * oracle verifies the written index holds exactly the centroid
    * assignment — a dropped or double-written row breaks the hash.
    */
  val q42a = GraftQuery(
    "q42_ann_ivf_index_build",
    (s, d) => {
      val path = buildIndex(s, d)
      s.read.parquet(path)
        .groupBy(col("cluster_id").cast("bigint").as("cluster_id"))
        .agg(count(lit(1)).as("n_vecs"))
    },
    Some("""
      WITH dists AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      assign AS (
        SELECT id, centroid_id AS cluster_id FROM dists
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1)
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_vecs
      FROM assign GROUP BY cluster_id
    """.trim))

  /** q28's IVF search through the written-index path: the corpus is
    * materialized partitioned by cluster_id and the probe becomes a
    * static partition filter — the scan opens only the probed cluster
    * directories (asserted in IvfIndexSpec). Same parameters and same
    * oracle as q28: identical output through a physically different,
    * scale-shaped plan. Search-only timing: the index comes from
    * q42_ann_ivf_index_build (which sorts first in Bench passes);
    * build-if-absent keeps the query self-sufficient under Verify's
    * unordered map iteration.
    */
  val q42 = GraftQuery(
    "q42_ann_ivf_indexed",
    (s, d) => {
      val path = ivfIndexPath(d)
      // _SUCCESS marker, not bare existence: a killed build leaves a
      // partial directory that bare exists() would accept
      if (!new java.io.File(s"$path/_SUCCESS").exists()) buildIndex(s, d)
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKIndexed(s, path,
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
    },
    q28.oracle)

  /** Hard-negative mining through the written IVF index: for each of
    * five anchors, the five highest-cosine candidates strictly BELOW
    * the repo's near-dup ceiling (4000 bp — the q24/q39 threshold:
    * anything at/above it is a presumed duplicate/positive, and
    * mining those as negatives poisons a contrastive loss with false
    * negatives). The training-pair generation step of a dense
    * retriever pipeline, run at the ANN index's scale shape: probed
    * partitions only, exact-long basis-point band test, bounded
    * per-anchor top-k. Oracle replays assignment, probe, cosine, the
    * band, and the rank.
    */
  val q248 = GraftQuery(
    "q248_hard_negative_mining",
    (s, d) => {
      val path = ivfIndexPath(d)
      if (!new java.io.File(s"$path/_SUCCESS").exists()) buildIndex(s, d)
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegatives(s, path,
        emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nprobe = 2, dupCeilingBp = 4000L)
    },
    Some(s"""
      WITH dists AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      assign AS (
        SELECT id, centroid_id AS cluster_id FROM dists
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      probe AS (
        SELECT id AS query_id, centroid_id AS cluster_id FROM dists
        WHERE id < 5
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) <= 2),
      cand AS (
        SELECT p.query_id, a.id,
               CAST(round(round(${duckCos("x", "y")}, 4) * 10000) AS BIGINT) AS cosine_bp
        FROM probe p
        JOIN assign a ON a.cluster_id = p.cluster_id AND a.id <> p.query_id
        JOIN embeddings x ON p.query_id = x.vec_id
        JOIN embeddings y ON a.id = y.vec_id)
      SELECT query_id, id AS negative_id, cosine_bp,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_bp DESC, id) AS INT) AS rnk
      FROM cand
      WHERE cosine_bp < 4000
      QUALIFY rnk <= 5
    """.trim))

  /** JL random projection of the 64-dim embeddings to 8 dims via the
    * fixed Achlioptas sign matrix; long-form (id, dim, value) output.
    * The oracle regenerates the identical sign literals.
    */
  val q79 = GraftQuery(
    "q79_random_projection",
    (s, d) => graft.operators.Projection.randomProject(
      Tables.embeddings(s, d), "vec_id", "embedding", outDims = 8, inDims = 64),
    Some {
      val rows = graft.operators.Projection.signMatrix(8, 64).zipWithIndex
        .map { case (row, j) =>
          val lits = row.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
          s"""SELECT vec_id AS id, CAST($j AS BIGINT) AS dim,
             |  floor(list_sum(list_transform(range(1, 65),
             |    i -> CAST(embedding[i] AS DOUBLE) * ($lits)[i])) / sqrt(8.0)
             |    * 10000) / 10000 AS value
             |FROM embeddings""".stripMargin.replace("\n", " ")
        }
      rows.mkString("\nUNION ALL\n")
    })

  /** Per-source embedding centroids (long form): the group-profile
    * primitive for drift monitoring and cluster summaries.
    */
  val q84 = GraftQuery(
    "q84_group_centroids",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
      graft.operators.Clustering.groupCentroids(
        e.join(docs, e("vec_id") === docs("doc_id")), "source", "embedding")
    },
    Some("""
      SELECT source AS grp, i - 1 AS dim, CAST(count(*) AS BIGINT) AS n_vectors,
             floor(avg(CAST(embedding[i] AS DOUBLE)) * 10000) / 10000 AS value
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r
      GROUP BY source, i
    """.trim))

  /** SemDeDup (Abbas et al. 2023): embeddings clustered to the 8 seed
    * centroids (q26's assignment), then near-duplicates removed WITHIN
    * clusters only — pairwise cosine confined to cluster members, the
    * published semantic-dedup recipe at the scale-right shape (the
    * global all-pairs form stays the spec-only verifier). A vector is dropped
    * iff a smaller-id cluster-mate is within 0.4 cosine. The oracle
    * replays assignment + within-cluster pairs + the keep rule, so
    * cluster membership AND the dedup verdict are verified per row.
    */
  val q116 = GraftQuery(
    "q116_semantic_dedup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semDedup(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", "vec_id", "embedding", threshold = 0.4)
    },
    Some(s"""
      WITH l2 AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      assign AS (
        SELECT id, centroid_id AS cluster_id FROM l2
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2 ASC, centroid_id ASC) = 1),
      dropped AS (
        SELECT DISTINCT a.id
        FROM assign a JOIN assign b
          ON a.cluster_id = b.cluster_id AND b.id < a.id
        JOIN embeddings x ON a.id = x.vec_id
        JOIN embeddings y ON b.id = y.vec_id
        WHERE round(${duckCos("x", "y")}, 4) >= 0.4)
      SELECT assign.id, assign.cluster_id,
             (dropped.id IS NULL) AS is_kept
      FROM assign LEFT JOIN dropped ON assign.id = dropped.id
    """.trim))

  /** Incremental IVF maintenance: the index is built on 90% of the
    * corpus, the held-out 10% is APPENDED against the same centroids
    * (cluster dirs gain files, nothing rewritten), then q42's search
    * runs over the union — against q28's FULL-corpus oracle. A
    * dropped, duplicated, or misassigned appended vector changes a
    * top-k list and breaks the hash.
    */
  val q143 = GraftQuery(
    "q143_ann_ivf_append",
    (s, d) => {
      val path = "/tmp/graft_q143_ivf_append_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 8)
      Similarity.ivfIndexWrite(emb.filter(col("vec_id") % 10 =!= 0), cents,
        "vec_id", "embedding", "vec_id", "embedding", path,
        targetRowsPerFile = 256L)
      Similarity.ivfIndexAppend(emb.filter(col("vec_id") % 10 === 0), cents,
        "vec_id", "embedding", "vec_id", "embedding", path,
        targetRowsPerFile = 256L)
      Similarity.ivfTopKIndexed(s, path,
        emb.filter(col("vec_id") < 3), cents,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
    },
    q28.oracle)

  /** Shared DuckDB CTE chain for product quantization (m=4 subspaces
    * of 16 dims, k=16 codes, 1 Lloyd round from the lowest-16-id
    * seed): subspace id is DATA (cross join with range(0,4)), so the
    * whole per-subspace training runs in one chain — mirroring the
    * operator, where sub is a column and all subspaces train in one
    * pipeline. a2 is the final encoding, c1 the final codebook.
    */
  /** `trainWhere(idCol)` restricts the TRAINING corpus (seed pick +
    * Lloyd assignment/update) to a subset, while `a2` still encodes
    * EVERY vector against the resulting codebook — the shape of an
    * index built on a base corpus and then streamed into (q236). The
    * default `_ => "TRUE"` trains on everything (q137/q138/q223).
    */
  private def duckPqChainFor(trainWhere: String => String): String = {
    def pqAssign(src: String, cents: String): String =
      s"""SELECT v.id, v.s, c.code,
            round(list_sum(list_transform(range(1, 17),
              i -> (CAST(v.sv[i] AS DOUBLE) - c.cv[i]) *
                   (CAST(v.sv[i] AS DOUBLE) - c.cv[i]))), 6) AS dist2
          FROM $src v JOIN $cents c ON c.s = v.s
          QUALIFY row_number() OVER (PARTITION BY v.id, v.s
                                     ORDER BY dist2, c.code) = 1"""
    s"""subs AS (SELECT CAST(t.s AS BIGINT) AS s FROM range(0, 4) t(s)),
      cs AS (SELECT vec_id AS id, s, embedding[s*16+1 : s*16+16] AS sv
             FROM embeddings CROSS JOIN subs),
      cst AS (SELECT * FROM cs WHERE ${trainWhere("id")}),
      seed AS (SELECT vec_id, embedding,
                      CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
               FROM (SELECT * FROM embeddings WHERE ${trainWhere("vec_id")}
                     ORDER BY vec_id LIMIT 16)),
      c0 AS (SELECT s, code,
                    list_transform(embedding[s*16+1 : s*16+16],
                                   x -> CAST(x AS DOUBLE)) AS cv
             FROM seed CROSS JOIN subs),
      a1 AS (${pqAssign("cst", "c0")}),
      m1 AS (SELECT a.s, a.code, t.i AS pos, avg(CAST(v.sv[t.i] AS DOUBLE)) AS mv
             FROM a1 a JOIN cst v ON v.id = a.id AND v.s = a.s
             CROSS JOIN range(1, 17) t(i)
             GROUP BY a.s, a.code, t.i),
      c1 AS (SELECT s, code, list(mv ORDER BY pos) AS cv FROM m1 GROUP BY s, code),
      a2 AS (${pqAssign("cs", "c1")})"""
  }

  private val duckPqChain: String = duckPqChainFor(_ => "TRUE")

  /** Oracle for the full IVFADC search composition (q223 and its
    * lifecycle variants): PQ training over `trainWhere`, IVF
    * assignment, probe selection, ADC over stored codes, shortlist
    * cut, exact-cosine re-rank. `memberWhere` restricts the corpus
    * side (e.g. excluding vacuumed ids, q234); the search always runs
    * with k=5, nprobe=2, shortlistN=20 over queries vec_id < 3.
    */
  private[queries] def ivfPqSearchOracleSql(
      trainWhere: String => String, memberWhere: String): String =
    s"""
      WITH ${duckPqChainFor(trainWhere)},
      ivfd AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      iassign AS (
        SELECT id, centroid_id AS cluster_id FROM ivfd
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      probe AS (
        SELECT id AS query_id, centroid_id AS cluster_id FROM ivfd
        WHERE id < 3
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) <= 2),
      qsub AS (
        SELECT id AS query_id, s,
               list_transform(sv, x -> CAST(x AS DOUBLE)) AS qsv
        FROM cs WHERE id < 3),
      dt AS (
        SELECT q.query_id, c.s, c.code,
               CAST(round(round(list_sum(list_transform(range(1, 17),
                 i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))), 6)
                 * 1000000) AS BIGINT) AS d_u
        FROM c1 c JOIN qsub q ON q.s = c.s),
      member AS (
        SELECT p.query_id, a.id
        FROM probe p JOIN iassign a ON a.cluster_id = p.cluster_id
        WHERE a.id <> p.query_id$memberWhere),
      adc AS (
        SELECT m.query_id, m.id, CAST(sum(dt.d_u) AS BIGINT) AS adc_u
        FROM member m
        JOIN a2 e ON e.id = m.id
        JOIN dt ON dt.query_id = m.query_id AND dt.s = e.s AND dt.code = e.code
        GROUP BY m.query_id, m.id),
      short AS (
        SELECT query_id, id, adc_u FROM adc
        QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_u, id) <= 20)
      SELECT s.query_id, s.id AS neighbor_id, s.adc_u,
             round(${duckCos("x", "y")}, 4) AS cosine
      FROM short s
      JOIN embeddings x ON s.query_id = x.vec_id
      JOIN embeddings y ON s.id = y.vec_id
      QUALIFY row_number() OVER (PARTITION BY s.query_id
                                 ORDER BY cosine DESC, s.id) <= 5
    """.trim

  /** PQ codebook training (Jégou et al. 2011): per-(subspace, code)
    * cell sizes and floored within-cell sum of squares after one
    * Lloyd round — the oracle re-runs the whole per-subspace training
    * in SQL (the q70 pattern, with the subspace id as data).
    */
  val q137 = GraftQuery(
    "q137_pq_train",
    (s, d) => graft.operators.ProductQuantization.trainSummary(
      s, Tables.embeddings(s, d), "vec_id", "embedding",
      m = 4, k = 16, subDim = 16, iters = 1),
    Some(s"""
      WITH $duckPqChain
      SELECT s AS sub, code, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(floor(sum(dist2)) AS BIGINT) AS wcss_floor
      FROM a2 GROUP BY s, code
    """.trim))

  /** PQ asymmetric-distance search: top-10 neighbors of vector 0 by
    * the sum of per-subspace distance-table cells in EXACT integer
    * micro-units (round-6dp x 1e6 longs — order-independent sums, so
    * the ranking is engine-reproducible; the compression story is
    * 64 floats -> 4 codes per corpus vector).
    */
  val q138 = GraftQuery(
    "q138_pq_adc_topk",
    (s, d) => graft.operators.ProductQuantization.adcTopK(
      s, Tables.embeddings(s, d), "vec_id", "embedding",
      m = 4, k = 16, subDim = 16, iters = 1, queryId = 0L, topK = 10),
    Some(s"""
      WITH $duckPqChain,
      q AS (SELECT s, list_transform(sv, x -> CAST(x AS DOUBLE)) AS qv
            FROM cs WHERE id = 0),
      dt AS (SELECT c.s, c.code,
                    CAST(round(round(list_sum(list_transform(range(1, 17),
                      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), 6)
                      * 1000000) AS BIGINT) AS d_u
             FROM c1 c JOIN q ON q.s = c.s),
      adc AS (SELECT e.id, CAST(sum(dt.d_u) AS BIGINT) AS adc_u
              FROM a2 e JOIN dt ON dt.s = e.s AND dt.code = e.code
              GROUP BY e.id)
      SELECT id AS neighbor_id, adc_u
      FROM adc WHERE id <> 0
      ORDER BY adc_u, id LIMIT 10
    """.trim))

  /** Class-centroid drift matrix: pairwise cosine between per-label
    * embedding centroids — the corpus-drift / label-confusability
    * diagnostic (two labels whose centroids cosine ~1 are one
    * distribution). Components become exact integer micro-units
    * BEFORE summing (the q138 rule: float sums are order-dependent),
    * so centroid sums, dots, and norms are all exact longs; the only
    * floats are one sqrt (IEEE correctly-rounded) and one division
    * per pair, then floor4. Pair-join volume is labels² x dims —
    * independent of corpus size.
    */
  val q182 = GraftQuery(
    "q182_centroid_drift_matrix",
    (s, d) => {
      import graft.functions.QualityFunctions.floor4
      val e = Tables.embeddings(s, d).select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      val cs = e.groupBy(col("label"), col("dim"))
        .agg(sum(round(col("v") * 1e6).cast("long")).as("sv"))
      val norms = cs.groupBy(col("label"))
        .agg(sum(col("sv") * col("sv")).as("nn"))
      val pairs = cs.as("x")
        .join(cs.as("y"),
          col("x.dim") === col("y.dim") && col("x.label") < col("y.label"))
        .groupBy(col("x.label").as("l1"), col("y.label").as("l2"))
        .agg(sum(col("x.sv") * col("y.sv")).as("dot"))
      pairs
        .join(broadcast(norms.select(col("label").as("l1"), col("nn").as("n1"))), "l1")
        .join(broadcast(norms.select(col("label").as("l2"), col("nn").as("n2"))), "l2")
        .select(col("l1"), col("l2"),
          floor4(col("dot").cast("double") /
            (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
            .as("cosine"))
    },
    Some("""
      WITH e AS (SELECT label, t.i AS dim,
                        CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS sv0
                 FROM embeddings CROSS JOIN range(1, 65) t(i)),
      cs AS (SELECT label, dim, CAST(sum(sv0) AS BIGINT) AS sv FROM e GROUP BY 1, 2),
      n AS (SELECT label, CAST(sum(sv * sv) AS BIGINT) AS nn FROM cs GROUP BY 1),
      p AS (SELECT x.label AS l1, y.label AS l2, CAST(sum(x.sv * y.sv) AS BIGINT) AS dot
            FROM cs x JOIN cs y ON x.dim = y.dim AND x.label < y.label
            GROUP BY 1, 2)
      SELECT l1, l2,
             floor(dot * 1.0 / (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))) * 10000) / 10000 AS cosine
      FROM p JOIN n n1 ON n1.label = p.l1 JOIN n n2 ON n2.label = p.l2
    """.trim))

  /** int8 embedding quantization audit: per-vector affine min/max
    * scaling to the 0..254 grid, reconstruct, and measure the error —
    * the 4x-storage-compression every embedding store applies, with
    * the audit that says whether it is safe. All per-element math is
    * a fixed-order scalar chain over higher-order array functions
    * (no explode, no shuffle of cells); each |v − recon| floors to
    * exact e7-unit longs BEFORE any aggregation (the q138 rule).
    * Rounding is floor(x + 0.5) in BOTH engines — never `round`,
    * whose half-tie rule is engine-defined. den = 0 (constant
    * vector) degrades to q = 0, recon = min, error 0.
    */
  val q189 = GraftQuery(
    "q189_int8_quantization",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("mn", array_min(col("embedding")).cast("double"))
        .withColumn("mx", array_max(col("embedding")).cast("double"))
        .withColumn("den", col("mx") - col("mn"))
      def qv(v: org.apache.spark.sql.Column) =
        when(col("den") === 0, lit(0.0))
          .otherwise(floor((v.cast("double") - col("mn")) * 254.0 / col("den")
            + 0.5).cast("double"))
      val cells = e
        .withColumn("errs", transform(col("embedding"), v =>
          floor(abs(v.cast("double") -
            (col("mn") + qv(v) * col("den") / 254.0)) * 1e7).cast("long")))
        .withColumn("sat", size(filter(col("embedding"), v =>
          qv(v) <= 0.0 || qv(v) >= 254.0)).cast("long"))
      cells.agg(count(lit(1)).as("n_vecs"),
        max(array_max(col("errs"))).as("max_err_e7"),
        sum(aggregate(col("errs"), lit(0L), (a, x) => a + x)).as("sum_err_e7"),
        sum(col("sat")).as("n_saturated"))
        .withColumn("avg_err_e7",
          expr("sum_err_e7 div (n_vecs * 64L)"))
    },
    Some("""
      WITH cells AS (SELECT vec_id, CAST(embedding[t.i] AS DOUBLE) AS v
                     FROM embeddings CROSS JOIN range(1, 65) t(i)),
      s AS (SELECT vec_id, min(v) AS mn, max(v) AS mx FROM cells GROUP BY 1),
      q AS (SELECT c.vec_id, v, mn, mx, mx - mn AS den,
                   CASE WHEN mx - mn = 0 THEN 0.0
                        ELSE floor((v - mn) * 254.0 / (mx - mn) + 0.5) END AS qv
            FROM cells c JOIN s USING (vec_id)),
      er AS (SELECT vec_id,
                    CAST(floor(abs(v - (mn + qv * den / 254.0)) * 10000000) AS BIGINT) AS err,
                    CASE WHEN qv <= 0.0 OR qv >= 254.0 THEN 1 ELSE 0 END AS sat
             FROM q)
      SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
             CAST(max(err) AS BIGINT) AS max_err_e7,
             CAST(sum(err) AS BIGINT) AS sum_err_e7,
             CAST(sum(sat) AS BIGINT) AS n_saturated,
             CAST(sum(err) // (count(DISTINCT vec_id) * 64) AS BIGINT) AS avg_err_e7
      FROM er
    """.trim))

  /** k-NN label agreement — the label-noise audit (confident-learning
    * lite): for each vector, how many of its 5 nearest neighbors
    * share its label; per-label agreement rates expose mislabeled or
    * overlapping classes. Neighbor candidates come from the q39
    * hyperplane-LSH blocks (equi-join on (table, bucket) — never
    * all-pairs), scored by exact-integer cosine (micro-unit
    * components, the q138 rule) floored to an e6 grid, and the top-5
    * selection is the bounded-heap TopK with id tie-break —
    * deterministic end to end.
    */
  val q190 = GraftQuery(
    "q190_knn_label_agreement",
    (s, d) => {
      import graft.operators.{Similarity, TopK}
      val hps = Similarity.lshHyperplanes(16, 4, 64)
      val e = Tables.embeddings(s, d).select(col("vec_id").as("id"),
          col("label"), col("embedding"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1e6).cast("long")).as("sv"))
        .withColumn("nn",
          aggregate(col("sv"), lit(0L), (a, x) => a + x * x))
        .cache()
      val keys = hps.map { tableHp =>
        tableHp.zipWithIndex.map { case (h, k) =>
          val hv = array(h.map(lit): _*)
          when(graft.functions.VectorFunctions.dot(col("embedding"), hv) >= 0,
            lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _)
      }
      val keyed = e.select(col("id"), posexplode(array(keys: _*)))
        .toDF("id", "table_idx", "bucket")
      val cand = keyed.as("a").join(keyed.as("b"),
          col("a.table_idx") === col("b.table_idx") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") =!= col("b.id"))
        .select(col("a.id").as("id"), col("b.id").as("nb")).distinct()
      val scored = cand
        .join(e.select(col("id"), col("sv"), col("nn")), "id")
        .join(e.select(col("id").as("nb"), col("sv").as("sv2"),
          col("nn").as("nn2")), "nb")
        .withColumn("dot", aggregate(
          zip_with(col("sv"), col("sv2"), (x, y) => x * y),
          lit(0L), (a, x) => a + x))
        .withColumn("cos_e6", floor(col("dot").cast("double") /
          (sqrt(col("nn").cast("double")) * sqrt(col("nn2").cast("double")))
          * 1e6).cast("long"))
        .select(col("id"), col("nb"), col("cos_e6"))
      val top = TopK.perGroup(scored, Seq("id"), "cos_e6", "nb", Seq(), 5)
      val ag = top
        .join(e.select(col("id"), col("label").as("la")), "id")
        .join(e.select(col("id").as("nb"), col("label").as("lb")), "nb")
        .groupBy(col("la").as("label"))
        .agg(count(lit(1)).as("n_neighbors"),
          sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_agree"))
      e.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
        .join(ag, Seq("label"), "left")
        .select(col("label"), col("n_vecs"),
          coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
          coalesce(col("n_agree"), lit(0L)).as("n_agree"),
          coalesce(expr("n_agree * 10000L div n_neighbors"), lit(0L))
            .as("agree_bp"))
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
      svt AS (SELECT vec_id, label,
                     list_transform(range(1, 65),
                       i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS sv
              FROM embeddings),
      nrm AS (SELECT vec_id, label, sv,
                     CAST(list_sum(list_transform(range(1, 65), i -> sv[i] * sv[i])) AS BIGINT) AS nn
              FROM svt),
      cand AS (SELECT DISTINCT a.vec_id AS id, b.vec_id AS nb
               FROM keyed a JOIN keyed b
                 ON a.table_idx = b.table_idx AND a.bucket = b.bucket
                AND a.vec_id <> b.vec_id),
      sc AS (SELECT c.id, c.nb, x.label AS la, y.label AS lb,
                    CAST(floor(CAST(list_sum(list_transform(range(1, 65),
                           i -> x.sv[i] * y.sv[i])) AS DOUBLE)
                      / (sqrt(CAST(x.nn AS DOUBLE)) * sqrt(CAST(y.nn AS DOUBLE)))
                      * 1000000) AS BIGINT) AS cos_e6
             FROM cand c JOIN nrm x ON c.id = x.vec_id
                         JOIN nrm y ON c.nb = y.vec_id),
      top AS (SELECT *, row_number() OVER (PARTITION BY id
                                           ORDER BY cos_e6 DESC, nb ASC) AS rn
              FROM sc),
      ag AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS n_neighbors,
                    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
             FROM top WHERE rn <= 5 GROUP BY 1),
      nv AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
             FROM embeddings GROUP BY 1)
      SELECT nv.label, nv.n_vecs,
             coalesce(ag.n_neighbors, 0) AS n_neighbors,
             coalesce(ag.n_agree, 0) AS n_agree,
             coalesce(ag.n_agree * 10000 // ag.n_neighbors, 0) AS agree_bp
      FROM nv LEFT JOIN ag USING (label)
      """.trim
    })

  /** Per-dimension variance profile of the embedding space — the
    * collapsed-dimension audit (a dimension with near-zero variance
    * carries no signal and flags a broken encoder). Components scale
    * to exact e3-unit longs — coarser than the q138 e6 grid because
    * the cross-multiplied variance squares TWICE (s2·n at e6 units
    * overflows 2^63 at sf0.1); both engines rank on the same exact
    * grid, so the cut is still deterministic. Variance is the exact
    * cross-multiplied n·Σx²−S² (never a mean subtraction in floats);
    * top-5 / bottom-5 dims by variance with dim tie-break.
    */
  val q221 = GraftQuery(
    "q221_dim_variance_profile",
    (s, d) => {
      val cells = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"), round(col("v").cast("double") * 1000)
          .cast("long").as("sv"))
      val stats = cells.groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("sv")).as("sm"),
          sum(col("sv") * col("sv")).as("s2"))
        .select(col("dim"),
          (col("s2") * col("n") - col("sm") * col("sm")).as("var_num"))
      val top = stats.orderBy(col("var_num").desc, col("dim")).limit(5)
        .withColumn("which", lit("top"))
      val bottom = stats.orderBy(col("var_num").asc, col("dim")).limit(5)
        .withColumn("which", lit("bottom"))
      top.unionAll(bottom)
    },
    Some("""
      WITH cells AS (SELECT t.i - 1 AS dim,
                            CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000) AS BIGINT) AS sv
                     FROM embeddings CROSS JOIN range(1, 65) t(i)),
      stats AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(sv) AS BIGINT) AS sm,
                       CAST(sum(sv * sv) AS BIGINT) AS s2
                FROM cells GROUP BY 1),
      v AS (SELECT CAST(dim AS INT) AS dim,
                   CAST(s2 * n - sm * sm AS BIGINT) AS var_num FROM stats),
      t5 AS (SELECT dim, var_num, 'top' AS which FROM v
             ORDER BY var_num DESC, dim LIMIT 5),
      b5 AS (SELECT dim, var_num, 'bottom' AS which FROM v
             ORDER BY var_num ASC, dim LIMIT 5)
      SELECT * FROM t5 UNION ALL SELECT * FROM b5
    """.trim))

  /** IVF x PQ composed ANN search (Jegou et al. 2011 §V, IVFADC) —
    * the deployment shape a 100 TB vector corpus actually runs: PQ
    * codes stored INSIDE the IVF-partitioned index, search = probe
    * (partition pruning, only nprobe cluster dirs open) -> ADC over
    * stored codes against a broadcast integer micro-unit distance
    * table -> exact cosine re-rank of the 20-candidate shortlist
    * only. The oracle replays the ENTIRE composition in SQL: PQ
    * training (duckPqChain), IVF assignment, probe selection, ADC
    * arithmetic, shortlist cut, and re-rank — a misassigned cluster,
    * a wrong code, or a shortlist off-by-one all break the hash.
    * Build-if-absent keyed by SF dir (the q42 pattern); geometry is
    * read back from the stored codebook.
    */
  val q223 = GraftQuery(
    "q223_ann_ivf_pq_search",
    (s, d) => {
      val path = "/tmp/graft_q223_ivfpq_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      // completeness AND geometry: a stale index with different PQ
      // parameters rebuilds instead of silently serving wrong codes
      val ok = Similarity.ivfPqIndexComplete(s, path, m = 4, kCodes = 16,
        subDim = 16)
      val emb = Tables.embeddings(s, d)
      if (!ok)
        Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "vec_id", "embedding",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L)
      Similarity.ivfPqTopK(s, path, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 5, nprobe = 2, shortlistN = 20)
    },
    Some(ivfPqSearchOracleSql(_ => "TRUE", "")))

  /** IVFADC index vacuum — the delete leg of the ANN index lifecycle
    * (write / append / search / VACUUM), completing the store
    * discipline the signature store already has (q130): vectors of
    * deleted documents (vec_id % 10 = 7 here) are removed from the
    * index by rewriting ONLY the affected cluster partitions
    * (partition-pruned staging scan, staged-swap under the dropped
    * store marker, every FileSystem return checked), then the q223
    * search runs over the vacuumed index. The oracle replays the full
    * IVFADC composition with the deleted ids excluded from the corpus
    * side — a vector that survived the vacuum, or an untouched
    * cluster that lost a row, breaks the hash. Codebook and centroids
    * are untouched: deletion never re-encodes (codes of survivors are
    * byte-identical, asserted file-level in IvfIndexSpec).
    */
  val q234 = GraftQuery(
    "q234_ann_ivf_pq_vacuum",
    (s, d) => {
      val path = "/tmp/graft_q234_ivfpq_vac_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      if (!Similarity.ivfPqIndexComplete(s, path, m = 4, kCodes = 16,
          subDim = 16))
        Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "vec_id", "embedding",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L)
      // idempotent across runs: a second vacuum of the same ids finds
      // no affected clusters and is a no-op
      Similarity.ivfPqIndexVacuum(s,
        emb.filter(col("vec_id") % 10 === 7).select(col("vec_id")),
        "vec_id", m = 4, kCodes = 16, subDim = 16, path)
      Similarity.ivfPqTopK(s, path, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 5, nprobe = 2, shortlistN = 20)
    },
    Some(ivfPqSearchOracleSql(_ => "TRUE", " AND a.id % 10 <> 7")))

  /** IVFADC recall self-audit — the q217 discipline applied to the
    * flagship ANN index: q223 proves the index DETERMINISTIC (the
    * oracle replays the same ADC arithmetic); this query measures how
    * GOOD it is, as recall@5 of the real `ivfPqTopK` search against
    * `bruteForceTopK` exact-cosine ground truth on the same corpus,
    * at three (nprobe, shortlistN) operating points. A 100 TB
    * deployment tunes exactly these two knobs off exactly this curve:
    * nprobe buys recall with opened partitions, shortlistN buys
    * recall with exact re-rank rows. The oracle replays BOTH
    * pipelines and the set algebra — ground truth, the per-setting
    * probe/ADC/shortlist/re-rank composition, and the hit counts —
    * so a recall number that flatters the index breaks the hash.
    */
  // the operating-point sweep: nprobe doubles up to the full cluster
  // count (8 = every partition opened, isolating shortlist loss), and
  // the final point unbounds the shortlist too — at (8, 999) the
  // exact re-rank sees every candidate, so recall MUST be 100%: the
  // measured proof that all loss below it is shortlist truncation,
  // not a probe or decode defect
  private val recallSettings: Seq[(Int, Int)] =
    Seq((1, 10), (2, 20), (4, 40), (8, 100), (8, 999))

  val q235 = GraftQuery(
    "q235_ivfpq_recall_audit",
    (s, d) => {
      val path = "/tmp/graft_q235_ivfpq_recall_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      if (!Similarity.ivfPqIndexComplete(s, path, m = 4, kCodes = 16,
          subDim = 16))
        Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "vec_id", "embedding",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L)
      val queries = emb.filter(col("vec_id") < 3)
      // materialize (r20, Par scaladoc): truth feeds a semi join + two
      // aggregates PER operating point — ten concurrent consumers
      // racing to build the lazy cache otherwise
      val truth = graft.operators.Par.materialize(
        Similarity.bruteForceTopK(queries, emb,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          // k x nQueries rows: one partition, or every downstream
          // semi-join/aggregate stage inherits the cache's 32 (r20)
          .coalesce(1)
          .cache())
      // one sweep: fixed driver work (geometry, probe collect) paid
      // once for all five operating points instead of per point (r20)
      val sweep = Similarity.ivfPqTopKSweep(s, path, queries,
        "vec_id", "embedding", k = 5, recallSettings)
      recallSettings.zip(sweep).map { case ((np, sl), full) =>
        val res = full.select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(res, Seq("query_id", "neighbor_id"), "left_semi")
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
          .select(lit(np).as("nprobe"), lit(sl).as("shortlist_n"),
            col("n_truth"), col("n_hit"),
            expr("n_hit * 10000L div n_truth").as("recall_bp"))
      }.reduce(_ unionAll _)
    },
    Some {
      val perSetting = recallSettings.map { case (np, sl) =>
        s"""SELECT $np AS nprobe, $sl AS shortlist_n,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*)
                FROM truth t JOIN
                  (SELECT c.query_id, c.id FROM cosall c JOIN
                     (SELECT query_id, id FROM adcall
                      WHERE cluster_rank <= $np
                      QUALIFY row_number() OVER (PARTITION BY query_id
                                                 ORDER BY adc_u, id) <= $sl) s
                     ON s.query_id = c.query_id AND s.id = c.id
                   QUALIFY row_number() OVER (PARTITION BY c.query_id
                                              ORDER BY c.cosine DESC, c.id) <= 5) r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.id) AS n_hit"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH $duckPqChain,
      ivfd AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      iassign AS (
        SELECT id, centroid_id AS cluster_id FROM ivfd
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      crank AS (
        SELECT id AS query_id, centroid_id AS cluster_id,
               row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) AS cluster_rank
        FROM ivfd WHERE id < 3),
      qsub AS (
        SELECT id AS query_id, s,
               list_transform(sv, x -> CAST(x AS DOUBLE)) AS qsv
        FROM cs WHERE id < 3),
      dt AS (
        SELECT q.query_id, c.s, c.code,
               CAST(round(round(list_sum(list_transform(range(1, 17),
                 i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))), 6)
                 * 1000000) AS BIGINT) AS d_u
        FROM c1 c JOIN qsub q ON q.s = c.s),
      adcall AS (
        SELECT p.query_id, a.id, p.cluster_rank,
               CAST(sum(dt.d_u) AS BIGINT) AS adc_u
        FROM crank p
        JOIN iassign a ON a.cluster_id = p.cluster_id
        JOIN a2 e ON e.id = a.id
        JOIN dt ON dt.query_id = p.query_id
          AND dt.s = e.s AND dt.code = e.code
        WHERE a.id <> p.query_id
        GROUP BY p.query_id, a.id, p.cluster_rank),
      cosall AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(${duckCos("q", "c")}, 4) AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
      truth AS (
        SELECT query_id, id AS neighbor_id FROM cosall
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5),
      summary AS (
      $perSetting
      )
      SELECT nprobe, shortlist_n,
             CAST(n_truth AS BIGINT) AS n_truth,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST(n_hit * 10000 // n_truth AS BIGINT) AS recall_bp
      FROM summary
      """.trim
    })

  /** Shared DuckDB chain for the RESIDUAL-coded IVFADC (Jégou et al.
    * 2011 §V as actually published: PQ quantizes v − centroid(v),
    * not v): IVF assignment first, residual vectors as exact double
    * differences, then the same one-Lloyd-round PQ training/encoding
    * over residuals. `ra2` is the residual encoding, `rc1` the
    * residual codebook, `iassign`/`ivfd` the cluster geometry.
    */
  private val duckResidualPqChain: String = {
    def rPqAssign(src: String, cents: String): String =
      s"""SELECT v.id, v.s, c.code,
            round(list_sum(list_transform(range(1, 17),
              i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]))), 6) AS dist2
          FROM $src v JOIN $cents c ON c.s = v.s
          QUALIFY row_number() OVER (PARTITION BY v.id, v.s
                                     ORDER BY dist2, c.code) = 1"""
    s"""ivfd AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      iassign AS (
        SELECT id, centroid_id AS cluster_id FROM ivfd
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      res AS (
        SELECT a.id, a.cluster_id,
               list_transform(range(1, 65),
                 i -> CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) AS rv
        FROM iassign a
        JOIN embeddings v ON v.vec_id = a.id
        JOIN embeddings c ON c.vec_id = a.cluster_id),
      subs AS (SELECT CAST(t.s AS BIGINT) AS s FROM range(0, 4) t(s)),
      rcs AS (SELECT id, s, rv[s*16+1 : s*16+16] AS sv
              FROM res CROSS JOIN subs),
      rseed AS (SELECT id, rv,
                       CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS code
                FROM (SELECT * FROM res ORDER BY id LIMIT 16)),
      rc0 AS (SELECT s, code, rv[s*16+1 : s*16+16] AS cv
              FROM rseed CROSS JOIN subs),
      ra1 AS (${rPqAssign("rcs", "rc0")}),
      rm1 AS (SELECT a.s, a.code, t.i AS pos, avg(v.sv[t.i]) AS mv
              FROM ra1 a JOIN rcs v ON v.id = a.id AND v.s = a.s
              CROSS JOIN range(1, 17) t(i)
              GROUP BY a.s, a.code, t.i),
      rc1 AS (SELECT s, code, list(mv ORDER BY pos) AS cv
              FROM rm1 GROUP BY s, code),
      ra2 AS (${rPqAssign("rcs", "rc1")})"""
  }

  /** Search fragment over the residual chain: probe, per-(query,
    * probed-cluster) residual distance table, ADC, shortlist, exact
    * re-rank — shared by q243 (search) and q244 (recall audit).
    * Produces `rshort` (query_id, id, adc_u) at the given
    * (nprobe, shortlistN).
    */
  private def duckResidualSearchCtes(np: Int, sl: Int,
      pfx: String = ""): String =
    s"""${pfx}probe AS (
        SELECT id AS query_id, centroid_id AS cluster_id FROM ivfd
        WHERE id < 3
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) <= $np),
      ${pfx}qres AS (
        SELECT p.query_id, p.cluster_id,
               list_transform(range(1, 65),
                 i -> CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) AS rqv
        FROM ${pfx}probe p
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings c ON c.vec_id = p.cluster_id),
      ${pfx}qsub AS (
        SELECT query_id, cluster_id, s, rqv[s*16+1 : s*16+16] AS qsv
        FROM ${pfx}qres CROSS JOIN subs),
      ${pfx}dt AS (
        SELECT q.query_id, q.cluster_id, c.s, c.code,
               CAST(round(round(list_sum(list_transform(range(1, 17),
                 i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))), 6)
                 * 1000000) AS BIGINT) AS d_u
        FROM rc1 c JOIN ${pfx}qsub q ON q.s = c.s),
      ${pfx}member AS (
        SELECT p.query_id, p.cluster_id, a.id
        FROM ${pfx}probe p JOIN iassign a ON a.cluster_id = p.cluster_id
        WHERE a.id <> p.query_id),
      ${pfx}adc AS (
        SELECT m.query_id, m.id, CAST(sum(dt.d_u) AS BIGINT) AS adc_u
        FROM ${pfx}member m
        JOIN ra2 e ON e.id = m.id
        JOIN ${pfx}dt dt ON dt.query_id = m.query_id
          AND dt.cluster_id = m.cluster_id
          AND dt.s = e.s AND dt.code = e.code
        GROUP BY m.query_id, m.id),
      ${pfx}rshort AS (
        SELECT query_id, id, adc_u FROM ${pfx}adc
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_u, id) <= $sl)"""

  /** RESIDUAL-coded IVFADC search — the composition as Jégou et al.
    * 2011 actually publish it: PQ codes quantize the residual
    * v − centroid(v), so one shared codebook models every cluster's
    * displacement distribution instead of the clusters' absolute
    * positions, at the same 4-byte code budget. Search-side changes:
    * the ADC distance table is keyed per (query, probed cluster) —
    * the query's OWN residual against that cluster's centroid —
    * still broadcast-bounded at nQueries x nprobe x m x kCodes rows.
    * Everything else (partition-pruned probe, codes-only ADC scan,
    * bounded exact re-rank) is the q223 shape. The oracle replays the
    * whole residual composition: IVF assign, residual PQ training,
    * per-cluster distance tables, ADC, shortlist, re-rank. Whether
    * residual coding BEATS raw coding is measured, not assumed —
    * q244 vs q235 (and the ResidualRecallProbe 2x2 in PLANS.md): on
    * this corpus's near-isotropic embeddings it does not.
    */
  val q243 = GraftQuery(
    "q243_ann_ivf_pq_residual_search",
    (s, d) => {
      val path = "/tmp/graft_q243_ivfpq_res_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      if (!Similarity.ivfPqIndexComplete(s, path, m = 4, kCodes = 16,
          subDim = 16, residual = true))
        Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "vec_id", "embedding",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L, residual = true)
      Similarity.ivfPqTopK(s, path, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 5, nprobe = 2, shortlistN = 20,
        residual = true)
    },
    Some(s"""
      WITH $duckResidualPqChain,
      ${duckResidualSearchCtes(2, 20)}
      SELECT s.query_id, s.id AS neighbor_id, s.adc_u,
             round(${duckCos("x", "y")}, 4) AS cosine
      FROM rshort s
      JOIN embeddings x ON s.query_id = x.vec_id
      JOIN embeddings y ON s.id = y.vec_id
      QUALIFY row_number() OVER (PARTITION BY s.query_id
                                 ORDER BY cosine DESC, s.id) <= 5
    """.trim))

  /** Residual-IVFADC recall self-audit at the SAME operating points
    * as q235 — the two curves are directly comparable, so the recall
    * DELTA of residual coding (at identical storage and search cost)
    * is a measured, oracle-verified number, not a paper citation.
    * The measured answer on this corpus: residual loses at small
    * shortlists (20.0% vs 46.7% at nprobe=1) and converges at high
    * settings — near-isotropic synthetic embeddings have no cluster
    * structure for residuals to exploit, and the audit is what
    * catches that before a deployment ships the "paper-correct"
    * choice. Same discipline as q235: the oracle replays ground
    * truth, every per-setting residual search, and the hit counts.
    */
  val q244 = GraftQuery(
    "q244_ivfpq_residual_recall",
    (s, d) => {
      val path = "/tmp/graft_q244_ivfpq_resrec_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, d)
      if (!Similarity.ivfPqIndexComplete(s, path, m = 4, kCodes = 16,
          subDim = 16, residual = true))
        Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "vec_id", "embedding",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L, residual = true)
      val queries = emb.filter(col("vec_id") < 3)
      // materialize + one sweep: see q235 (r20)
      val truth = graft.operators.Par.materialize(
        Similarity.bruteForceTopK(queries, emb,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          // k x nQueries rows: one partition, or every downstream
          // semi-join/aggregate stage inherits the cache's 32 (r20)
          .coalesce(1)
          .cache())
      val sweep = Similarity.ivfPqTopKSweep(s, path, queries,
        "vec_id", "embedding", k = 5, recallSettings, residual = true)
      recallSettings.zip(sweep).map { case ((np, sl), full) =>
        val res = full.select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(res, Seq("query_id", "neighbor_id"), "left_semi")
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
          .select(lit(np).as("nprobe"), lit(sl).as("shortlist_n"),
            col("n_truth"), col("n_hit"),
            expr("n_hit * 10000L div n_truth").as("recall_bp"))
      }.reduce(_ unionAll _)
    },
    Some {
      val settingCtes = recallSettings.map { case (np, sl) =>
        duckResidualSearchCtes(np, sl, s"s${np}_${sl}_")
      }.mkString(",\n      ")
      val perSetting = recallSettings.map { case (np, sl) =>
        s"""SELECT $np AS nprobe, $sl AS shortlist_n,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*)
                FROM truth t JOIN
                  (SELECT c.query_id, c.id FROM cosall c
                   JOIN s${np}_${sl}_rshort s
                     ON s.query_id = c.query_id AND s.id = c.id
                   QUALIFY row_number() OVER (PARTITION BY c.query_id
                                              ORDER BY c.cosine DESC, c.id) <= 5) r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.id) AS n_hit"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH $duckResidualPqChain,
      $settingCtes,
      cosall AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(${duckCos("q", "c")}, 4) AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
      truth AS (
        SELECT query_id, id AS neighbor_id FROM cosall
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5),
      summary AS (
      $perSetting
      )
      SELECT nprobe, shortlist_n,
             CAST(n_truth AS BIGINT) AS n_truth,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST(n_hit * 10000 // n_truth AS BIGINT) AS recall_bp
      FROM summary
      """.trim
    })

  /** Parameterized DuckDB PQ chain — duckPqChainFor generalized over
    * (m, subDim) for the code-budget sweep (q252): same training
    * recipe (16 lowest-id seeds, one Lloyd round, round-6 distances,
    * (dist2, code) tie-break), with the subspace count and slice
    * width as literals. `${pfx}a2` is the final encoding, `${pfx}c1`
    * the codebook.
    */
  private def duckPqChainM(m: Int, subDim: Int, pfx: String): String = {
    def pqAssign(src: String, cents: String): String =
      s"""SELECT v.id, v.s, c.code,
            round(list_sum(list_transform(range(1, ${subDim + 1}),
              i -> (CAST(v.sv[i] AS DOUBLE) - c.cv[i]) *
                   (CAST(v.sv[i] AS DOUBLE) - c.cv[i]))), 6) AS dist2
          FROM $src v JOIN $cents c ON c.s = v.s
          QUALIFY row_number() OVER (PARTITION BY v.id, v.s
                                     ORDER BY dist2, c.code) = 1"""
    s"""${pfx}subs AS (SELECT CAST(t.s AS BIGINT) AS s FROM range(0, $m) t(s)),
      ${pfx}cs AS (SELECT vec_id AS id, s,
                          embedding[s*$subDim+1 : s*$subDim+$subDim] AS sv
                   FROM embeddings CROSS JOIN ${pfx}subs),
      ${pfx}seed AS (SELECT vec_id, embedding,
                            CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
                     FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
      ${pfx}c0 AS (SELECT s, code,
                          list_transform(embedding[s*$subDim+1 : s*$subDim+$subDim],
                                         x -> CAST(x AS DOUBLE)) AS cv
                   FROM ${pfx}seed CROSS JOIN ${pfx}subs),
      ${pfx}a1 AS (${pqAssign(s"${pfx}cs", s"${pfx}c0")}),
      ${pfx}m1 AS (SELECT a.s, a.code, t.i AS pos, avg(CAST(v.sv[t.i] AS DOUBLE)) AS mv
                   FROM ${pfx}a1 a JOIN ${pfx}cs v ON v.id = a.id AND v.s = a.s
                   CROSS JOIN range(1, ${subDim + 1}) t(i)
                   GROUP BY a.s, a.code, t.i),
      ${pfx}c1 AS (SELECT s, code, list(mv ORDER BY pos) AS cv
                   FROM ${pfx}m1 GROUP BY s, code),
      ${pfx}a2 AS (${pqAssign(s"${pfx}cs", s"${pfx}c1")})"""
  }

  /** One full-probe IVFADC search at (nprobe=8, shortlistN=20) over
    * the m-subspace encoding, reduced to its hit count vs `truth` —
    * the per-m row of the code-budget sweep.
    */
  private def duckCodeBudgetHits(m: Int, subDim: Int): String = {
    val pfx = s"m${m}_"
    s"""${duckPqChainM(m, subDim, pfx)},
      ${pfx}probe AS (
        SELECT id AS query_id, centroid_id AS cluster_id FROM ivfd
        WHERE id < 3
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) <= 8),
      ${pfx}qsub AS (
        SELECT id AS query_id, s,
               list_transform(sv, x -> CAST(x AS DOUBLE)) AS qsv
        FROM ${pfx}cs WHERE id < 3),
      ${pfx}dt AS (
        SELECT q.query_id, c.s, c.code,
               CAST(round(round(list_sum(list_transform(range(1, ${subDim + 1}),
                 i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))), 6)
                 * 1000000) AS BIGINT) AS d_u
        FROM ${pfx}c1 c JOIN ${pfx}qsub q ON q.s = c.s),
      ${pfx}member AS (
        SELECT p.query_id, a.id
        FROM ${pfx}probe p JOIN iassign a ON a.cluster_id = p.cluster_id
        WHERE a.id <> p.query_id),
      ${pfx}adc AS (
        SELECT mm.query_id, mm.id, CAST(sum(dt.d_u) AS BIGINT) AS adc_u
        FROM ${pfx}member mm
        JOIN ${pfx}a2 e ON e.id = mm.id
        JOIN ${pfx}dt dt ON dt.query_id = mm.query_id
          AND dt.s = e.s AND dt.code = e.code
        GROUP BY mm.query_id, mm.id),
      ${pfx}rshort AS (
        SELECT query_id, id, adc_u FROM ${pfx}adc
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_u, id) <= 20),
      ${pfx}res AS (
        SELECT c.query_id, c.id FROM cosall c
        JOIN ${pfx}rshort s ON s.query_id = c.query_id AND s.id = c.id
        QUALIFY row_number() OVER (PARTITION BY c.query_id
                                   ORDER BY c.cosine DESC, c.id) <= 5)"""
  }

  // the code-budget sweep: m subspaces of 64/m dims each — bytes per
  // vector = m; every other knob pinned (full probe, shortlist 20)
  private val codeBudgets: Seq[(Int, Int)] = Seq((2, 32), (4, 16), (8, 8))

  /** ANN code-budget sweep — the THIRD knob of the IVFADC tuning
    * triangle, measured like the other two (q235: nprobe/shortlistN;
    * this: bytes per vector): recall@5 at FULL probe and fixed
    * shortlist for m = 2 / 4 / 8 one-byte codes per vector. Full
    * probing removes probe loss from the reading, so the curve
    * isolates what finer codes buy. Storage cost is the x-axis: m
    * bytes against the 256-byte float vector. The oracle replays all
    * three trainings, encodings, ADC searches, re-ranks, and hit
    * counts.
    */
  val q252 = GraftQuery(
    "q252_pq_code_budget_sweep",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 3)
      // materialize (r20): truth feeds a semi join + two aggregates
      // per code budget — see q235
      val truth = graft.operators.Par.materialize(
        Similarity.bruteForceTopK(queries, emb,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          // k x nQueries rows: one partition, or every downstream
          // semi-join/aggregate stage inherits the cache's 32 (r20)
          .coalesce(1)
          .cache())
      codeBudgets.map { case (m, subDim) =>
        val path = s"/tmp/graft_q252_ivfpq_m${m}_" +
          d.replaceAll("[^A-Za-z0-9.]", "_")
        if (!Similarity.ivfPqIndexComplete(s, path, m = m, kCodes = 16,
            subDim = subDim))
          Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", "vec_id", "embedding",
            m = m, kCodes = 16, subDim = subDim, iters = 1, path,
            targetRowsPerFile = 256L)
        val res = Similarity.ivfPqTopK(s, path, queries,
            "vec_id", "embedding", k = 5, nprobe = 8, shortlistN = 20)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(res, Seq("query_id", "neighbor_id"), "left_semi")
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
          .select(lit(m).as("m_codes"), lit(subDim).as("sub_dim"),
            col("n_truth"), col("n_hit"),
            expr("n_hit * 10000L div n_truth").as("recall_bp"))
      }.reduce(_ unionAll _)
    },
    Some {
      val perM = codeBudgets.map { case (m, _) =>
        s"""SELECT $m AS m_codes, ${64 / m} AS sub_dim,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*) FROM truth t JOIN m${m}_res r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.id) AS n_hit"""
      }.mkString("\n      UNION ALL\n      ")
      val chains = codeBudgets.map { case (m, sd) =>
        duckCodeBudgetHits(m, sd)
      }.mkString(",\n      ")
      s"""
      WITH ivfd AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v JOIN embeddings c ON c.vec_id < 8),
      iassign AS (
        SELECT id, centroid_id AS cluster_id FROM ivfd
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      cosall AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(${duckCos("q", "c")}, 4) AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
      truth AS (
        SELECT query_id, id AS neighbor_id FROM cosall
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5),
      $chains,
      summary AS (
      $perM
      )
      SELECT m_codes, sub_dim,
             CAST(n_truth AS BIGINT) AS n_truth,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST(n_hit * 10000 // n_truth AS BIGINT) AS recall_bp
      FROM summary
      """.trim
    })

  /** d-dim cosine fragment over slices (double widening, matching the
    * Spark fold over a sliced array).
    */
  private def duckCosD(a: String, b: String, d: Int): String =
    s"""(list_sum(list_transform(range(1, ${d + 1}),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))) /
        (sqrt(list_sum(list_transform(range(1, ${d + 1}),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE)))) *
         sqrt(list_sum(list_transform(range(1, ${d + 1}),
           i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))))))"""

  // the dimension-budget sweep: leading-prefix truncations of the
  // 64-dim embedding (the Matryoshka/MRL serving trick: store or
  // search on a prefix, pay proportionally less memory and compute)
  private val dimBudgets: Seq[Int] = Seq(8, 16, 32, 64)

  /** Embedding DIMENSION-budget recall curve — the storage/compute
    * knob orthogonal to PQ codes (q252): search on the leading d of
    * 64 dims and measure recall@5 against full-dimension ground
    * truth. d=64 is the built-in control (identical vectors, recall
    * must be 100%). The measured curve is what decides whether a
    * deployment can serve from a truncated prefix (d× less memory
    * bandwidth) before re-ranking on full vectors. Oracle replays
    * every truncated search and the hit counts.
    */
  val q254 = GraftQuery(
    "q254_dim_budget_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 3)
      // materialize (r20): truth feeds a semi join + two aggregates
      // per dim budget — see q235
      val truth = graft.operators.Par.materialize(
        Similarity.bruteForceTopK(queries, emb,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          // k x nQueries rows: one partition, or every downstream
          // semi-join/aggregate stage inherits the cache's 32 (r20)
          .coalesce(1)
          .cache())
      dimBudgets.map { dd =>
        val tq = queries.select(col("vec_id"),
          slice(col("embedding"), 1, dd).as("embedding"))
        val tc = emb.select(col("vec_id"),
          slice(col("embedding"), 1, dd).as("embedding"))
        val res = Similarity.bruteForceTopK(tq, tc,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(res, Seq("query_id", "neighbor_id"), "left_semi")
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
          .select(lit(dd).as("n_dims"), col("n_truth"), col("n_hit"),
            expr("n_hit * 10000L div n_truth").as("recall_bp"))
      }.reduce(_ unionAll _)
    },
    Some {
      val perD = dimBudgets.map { dd =>
        s"""SELECT $dd AS n_dims,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*) FROM truth t JOIN
                  (SELECT query_id, id FROM cos$dd
                   QUALIFY row_number() OVER (PARTITION BY query_id
                                              ORDER BY cosine DESC, id) <= 5) r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.id) AS n_hit"""
      }.mkString("\n      UNION ALL\n      ")
      val cosCtes = dimBudgets.map { dd =>
        s"""cos$dd AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(${duckCosD("q", "c", dd)}, 4) AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 3 AND c.vec_id <> q.vec_id)"""
      }.mkString(",\n      ")
      s"""
      WITH $cosCtes,
      truth AS (
        SELECT query_id, id AS neighbor_id FROM cos64
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5),
      summary AS (
      $perD
      )
      SELECT n_dims, CAST(n_truth AS BIGINT) AS n_truth,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST(n_hit * 10000 // n_truth AS BIGINT) AS recall_bp
      FROM summary
      """.trim
    })

  /** int8 quantization SEARCH-loss audit — q29 measures per-vector
    * round-trip fidelity; this measures what actually matters to a
    * deployment: recall@5 when the CORPUS is served from symmetric
    * absmax int8 (4× less memory) and queries stay float — the
    * asymmetric serving shape. Oracle replays the quantize→
    * dequantize arithmetic inside the search and the hit counts.
    */
  val q255 = GraftQuery(
    "q255_int8_search_recall",
    (s, d) => {
      import graft.functions.{VectorFunctions => V}
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 3)
      val truth = Similarity.bruteForceTopK(queries, emb,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .cache()
      val deq = emb
        .withColumn("scale", V.absmaxScale(col("embedding")))
        .filter(col("scale") > 0)
        .select(col("vec_id"),
          V.dequantizedInt8(col("embedding"), col("scale")).as("embedding"))
      val res = Similarity.bruteForceTopK(queries, deq,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = truth.join(res, Seq("query_id", "neighbor_id"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(col("n_truth"), col("n_hit"),
          expr("n_hit * 10000L div n_truth").as("recall_bp"))
    },
    Some(s"""
      WITH cosall AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(${duckCos("q", "c")}, 4) AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
      truth AS (
        SELECT query_id, id AS neighbor_id FROM cosall
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5),
      deq AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) * scale / 127.0) AS dq
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS scale
              FROM embeddings)
        WHERE scale > 0),
      qres AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * c.dq[i])) /
                 (sqrt(list_sum(list_transform(range(1, 65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
                  sqrt(list_sum(list_transform(range(1, 65),
                   i -> c.dq[i] * c.dq[i])))), 4) AS cosine
        FROM embeddings q JOIN deq c
          ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
      res AS (
        SELECT query_id, id FROM qres
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5)
      SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
             CAST((SELECT count(*) FROM truth t JOIN res r
                     ON t.query_id = r.query_id AND t.neighbor_id = r.id) AS BIGINT) AS n_hit,
             CAST((SELECT count(*) FROM truth t JOIN res r
                     ON t.query_id = r.query_id AND t.neighbor_id = r.id) * 10000 //
                  (SELECT count(*) FROM truth) AS BIGINT) AS recall_bp
    """.trim))

  /** IVFADC rebalance acceptance — the q235 recall audit run TWICE on
    * the same DRIFTED index content: built (centroids + codebook
    * trained) on the embedding[0]<0 half-space only, then the entire
    * other half-space streamed in and every 7th id vacuumed — the
    * drift a production index accumulates. Once measured with the
    * STALE build-time centroids, once after `ivfPqIndexRebalance`
    * retrained the coarse centroids (1 Lloyd round) and rewrote the
    * layout with codes carried over unchanged. Queries come from the
    * drifted (appended) region, where stale centroids hurt.
    *
    * Measured (both SFs share the 500-vector table): rebalance takes
    * recall@5 from 1333 → 2666 bp at (nprobe=1, shortlist=10) and
    * 1333 → 3333 bp at (2, 20) — the retrain DOUBLES tight-probe
    * recall on drifted data — while the lossless (8, 999) control is
    * 100% for BOTH variants: rebalance moves every row between
    * clusters, so full-probe recall surviving proves no row was lost
    * or duplicated in the rewrite. (Same-distribution churn, measured
    * while building this query, moves recall by ±1 hit — rebalance
    * pays when there IS drift, and the operator's scaladoc says so.)
    * The oracle replays EVERYTHING: PQ training on the base slice,
    * the churned membership, the stale seed geometry, the full
    * k-means retrain (seed = 8 lowest surviving ids, one Lloyd round
    * over the churned corpus), both probe/ADC/shortlist/re-rank
    * pipelines, and the set algebra against brute-force ground truth.
    */
  private val rebalanceSettings: Seq[(Int, Int)] = Seq((1, 10), (2, 20), (8, 999))

  private def q274ChurnedIndex(s: org.apache.spark.sql.SparkSession,
      d: String, rebalance: Boolean): String = {
    val path = "/tmp/graft_q274_ivfpq_" +
      (if (rebalance) "rb_" else "st_") + d.replaceAll("[^A-Za-z0-9.]", "_")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val doneFlag = new org.apache.hadoop.fs.Path(s"$path/_churn_done")
    if (!fs.exists(doneFlag)) {
      // the churn sequence is not re-runnable piecemeal (a replayed
      // append would duplicate ids): rebuild from a clean slate
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val emb = Tables.embeddings(s, d)
      // REAL drift, not same-distribution churn: the index is built
      // (and its centroids + codebook trained) on the embedding[0]<0
      // half-space only; the entire other half-space then streams in.
      // Stale coarse centroids all sit in the old region, so the
      // appended vectors crowd into the few borderline clusters —
      // the drift a production index accumulates before a rebalance.
      val oldHalf = emb.filter(element_at(col("embedding"), 1) < 0.0)
      val newHalf = emb.filter(element_at(col("embedding"), 1) >= 0.0)
      Similarity.ivfPqIndexWrite(oldHalf,
        oldHalf.orderBy(col("vec_id")).limit(8), "vec_id", "embedding",
        "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1,
        path, targetRowsPerFile = 256L)
      Similarity.ivfPqIndexAppend(s, newHalf,
        "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, path,
        targetRowsPerFile = 256L)
      Similarity.ivfPqIndexVacuum(s,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")),
        "vec_id", m = 4, kCodes = 16, subDim = 16, path)
      if (rebalance)
        Similarity.ivfPqIndexRebalance(s, kClusters = 8, kmIters = 1,
          m = 4, kCodes = 16, subDim = 16, path, targetRowsPerFile = 256L)
      fs.create(doneFlag, true).close()
    }
    path
  }

  val q274 = GraftQuery(
    "q274_ivfpq_rebalance_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 7 =!= 3)
      // queries from the DRIFTED region (the appended half-space) —
      // where stale centroids hurt and a rebalance must help
      val queries = emb.filter(element_at(col("embedding"), 1) >= 0.0)
        .orderBy(col("vec_id")).limit(3)
      // materialize + one sweep per store variant: see q235 (r20) —
      // truth feeds 12 concurrent consumers here, and each variant's
      // fixed driver work (geometry, probe collect) is paid once for
      // its three operating points instead of per point
      val truth = graft.operators.Par.materialize(
        Similarity.bruteForceTopK(queries, corpus,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          // k x nQueries rows: one partition, or every downstream
          // semi-join/aggregate stage inherits the cache's 32 (r20)
          .coalesce(1)
          .cache())
      Seq("rebalanced" -> true, "stale" -> false).map { case (name, rb) =>
        val path = q274ChurnedIndex(s, d, rb)
        val sweep = Similarity.ivfPqTopKSweep(s, path, queries,
          "vec_id", "embedding", k = 5, rebalanceSettings)
        rebalanceSettings.zip(sweep).map { case ((np, sl), full) =>
          val res = full.select(col("query_id"), col("neighbor_id"))
          val hits = truth.join(res, Seq("query_id", "neighbor_id"), "left_semi")
          truth.agg(count(lit(1)).as("n_truth"))
            .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
            .select(lit(name).as("variant"),
              lit(np).as("nprobe"), lit(sl).as("shortlist_n"),
              col("n_truth"), col("n_hit"),
              expr("n_hit * 10000L div n_truth").as("recall_bp"))
        }.reduce(_ unionAll _)
      }.reduce(_ unionAll _)
    },
    Some {
      def perSetting(variant: String, adcall: String): String =
        rebalanceSettings.map { case (np, sl) =>
          s"""SELECT '$variant' AS variant, $np AS nprobe, $sl AS shortlist_n,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*)
                FROM truth t JOIN
                  (SELECT c.query_id, c.id FROM cosall c JOIN
                     (SELECT query_id, id FROM $adcall
                      WHERE cluster_rank <= $np
                      QUALIFY row_number() OVER (PARTITION BY query_id
                                                 ORDER BY adc_u, id) <= $sl) s
                     ON s.query_id = c.query_id AND s.id = c.id
                   QUALIFY row_number() OVER (PARTITION BY c.query_id
                                              ORDER BY c.cosine DESC, c.id) <= 5) r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.id) AS n_hit"""
        }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH ${duckPqChainFor(c =>
        s"$c IN (SELECT vec_id FROM embeddings WHERE embedding[1] < 0)")},
      corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 3),
      qids AS (SELECT vec_id FROM embeddings WHERE embedding[1] >= 0
               ORDER BY vec_id LIMIT 3),
      stcent AS (SELECT vec_id, embedding FROM embeddings
                 WHERE embedding[1] < 0 ORDER BY vec_id LIMIT 8),
      ivfd_st AS (
        SELECT v.vec_id AS id, c.vec_id AS centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) *
                      (CAST(v.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))), 6) AS dist2
        FROM embeddings v CROSS JOIN stcent c),
      iassign_st AS (
        SELECT id, centroid_id AS cluster_id FROM ivfd_st
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      crank_st AS (
        SELECT id AS query_id, centroid_id AS cluster_id,
               row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) AS cluster_rank
        FROM ivfd_st WHERE id IN (SELECT vec_id FROM qids)),
      kseed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS centroid_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM (SELECT vec_id, embedding FROM corp ORDER BY vec_id LIMIT 8)),
      kd0 AS (
        SELECT v.vec_id AS id, c.centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - c.cv[i]) *
                      (CAST(v.embedding[i] AS DOUBLE) - c.cv[i]))), 6) AS dist2
        FROM corp v CROSS JOIN kseed c),
      ka0 AS (
        SELECT id, centroid_id AS cluster_id FROM kd0
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      km1 AS (
        SELECT a.cluster_id, t.i AS pos, avg(CAST(v.embedding[t.i] AS DOUBLE)) AS mv
        FROM ka0 a JOIN corp v ON v.vec_id = a.id
        CROSS JOIN range(1, 65) t(i)
        GROUP BY a.cluster_id, t.i),
      kc1 AS (SELECT cluster_id AS centroid_id, list(mv ORDER BY pos) AS cv
              FROM km1 GROUP BY cluster_id),
      ivfd_rb AS (
        -- over ALL ids: members are filtered to the churned corpus in
        -- adcall_rb, but probe ranking must cover every query id even
        -- if the query itself was vacuumed
        SELECT v.vec_id AS id, c.centroid_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - c.cv[i]) *
                      (CAST(v.embedding[i] AS DOUBLE) - c.cv[i]))), 6) AS dist2
        FROM embeddings v CROSS JOIN kc1 c),
      iassign_rb AS (
        SELECT id, centroid_id AS cluster_id FROM ivfd_rb
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) = 1),
      crank_rb AS (
        SELECT id AS query_id, centroid_id AS cluster_id,
               row_number() OVER (PARTITION BY id ORDER BY dist2, centroid_id) AS cluster_rank
        FROM ivfd_rb WHERE id IN (SELECT vec_id FROM qids)),
      qsub AS (
        SELECT id AS query_id, s,
               list_transform(sv, x -> CAST(x AS DOUBLE)) AS qsv
        FROM cs WHERE id IN (SELECT vec_id FROM qids)),
      dt AS (
        SELECT q.query_id, c.s, c.code,
               CAST(round(round(list_sum(list_transform(range(1, 17),
                 i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))), 6)
                 * 1000000) AS BIGINT) AS d_u
        FROM c1 c JOIN qsub q ON q.s = c.s),
      adcall_st AS (
        SELECT p.query_id, a.id, p.cluster_rank,
               CAST(sum(dt.d_u) AS BIGINT) AS adc_u
        FROM crank_st p
        JOIN iassign_st a ON a.cluster_id = p.cluster_id
        JOIN a2 e ON e.id = a.id
        JOIN dt ON dt.query_id = p.query_id
          AND dt.s = e.s AND dt.code = e.code
        WHERE a.id <> p.query_id AND a.id % 7 <> 3
        GROUP BY p.query_id, a.id, p.cluster_rank),
      adcall_rb AS (
        SELECT p.query_id, a.id, p.cluster_rank,
               CAST(sum(dt.d_u) AS BIGINT) AS adc_u
        FROM crank_rb p
        JOIN iassign_rb a ON a.cluster_id = p.cluster_id
        JOIN a2 e ON e.id = a.id
        JOIN dt ON dt.query_id = p.query_id
          AND dt.s = e.s AND dt.code = e.code
        WHERE a.id <> p.query_id AND a.id % 7 <> 3
        GROUP BY p.query_id, a.id, p.cluster_rank),
      cosall AS (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               round(${duckCos("q", "c")}, 4) AS cosine
        FROM embeddings q JOIN embeddings c
          ON c.vec_id <> q.vec_id AND c.vec_id % 7 <> 3
        WHERE q.vec_id IN (SELECT vec_id FROM qids)),
      truth AS (
        SELECT query_id, id AS neighbor_id FROM cosall
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, id) <= 5),
      summary AS (
      ${perSetting("rebalanced", "adcall_rb")}
      UNION ALL
      ${perSetting("stale", "adcall_st")}
      )
      SELECT variant, nprobe, shortlist_n,
             CAST(n_truth AS BIGINT) AS n_truth,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST(n_hit * 10000 // n_truth AS BIGINT) AS recall_bp
      FROM summary
      """.trim
    })

  def all: Seq[GraftQuery] =
    Seq(q25, q26, q28, q29, q42a, q42, q79, q84, q116, q137, q138, q143, q182,
      q189, q190, q221, q223, q234, q235, q243, q244, q248, q252, q254, q255,
      q274)
}
