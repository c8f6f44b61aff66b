package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** lshBucketedPairs: the bucketed scale path for embedding near-dup.
  * Verifies precision 1.0 (candidates are exact-cosine-verified),
  * measured recall vs the exact all-pairs operator, and the plan
  * shape (equi-join, never a nested loop / cartesian).
  */
class LshPairsSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("lsh pairs are a subset of exact pairs (precision 1.0) with high recall") {
    val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshBucketedPairs(emb, "vec_id", "embedding",
      threshold = 0.4, bits = 4, tables = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    // threshold 0.4 is the worst LSH regime (66-degree pairs); the
    // deterministic hyperplanes give ~0.9 here and ~1.0 at >= 0.8
    assert(recall >= 0.75, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("cross-set lsh pairs: precision 1.0 vs exact, high recall, no cross join") {
    val probe = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    // exact cross-set pairs via the brute-force cosine join
    val exact = probe.select(col("vec_id").as("pid"), col("embedding").as("pv"))
      .crossJoin(corpus.select(col("vec_id").as("cid"), col("embedding").as("cv")))
      .withColumn("cosine", round(
        graft.functions.VectorFunctions.cosine(col("pv"), col("cv")), 4))
      .filter(col("cosine") >= 0.4)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshBucketedPairsAcross(probe, corpus,
      "vec_id", "embedding", threshold = 0.4, bits = 4, tables = 16)
    val got = lsh.select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), s"false positives: ${got -- exact}")
    assert(exact.nonEmpty)
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.75, s"recall $recall (${got.size}/${exact.size})")
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("candidate generation plans as an equi-join, never a cross join") {
    val plan = Similarity.lshBucketedPairs(emb, "vec_id", "embedding",
      threshold = 0.4, bits = 4, tables = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hyperplanes are deterministic and table-independent") {
    val a = Similarity.lshHyperplanes(2, 2, 8)
    val b = Similarity.lshHyperplanes(2, 2, 8)
    assert(a == b)
    // distinct streams per (table, bit)
    assert(a(0)(0) != a(0)(1) && a(0)(0) != a(1)(0))
    assert(a.flatten.flatten.forall(v => v >= -0.5 && v < 0.5))
  }
}
