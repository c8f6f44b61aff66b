package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation set — the standard guard against
  * test-set leakage into pre-training corpora.
  *
  * Scale design: the eval side is small (benchmarks are MBs; the
  * corpus is TBs), so its distinct shingle set is BROADCAST and the
  * corpus side never shuffles its text — the plan is scan -> explode
  * -> broadcast-hash semi-ish join -> a tiny (doc_id, n_hits)
  * aggregation. At 100 TB the corpus pays one pass, and AQE has
  * nothing to re-plan because the only exchange carries hit counts.
  * For eval sets too big to broadcast whole, the same shape works
  * with a bloom filter over eval shingles (runtime bloom injection
  * covers the shuffle-join fallback automatically).
  */
object Decontamination {

  /** Per-corpus-doc contamination profile against `evalDocs`:
    * n_hits = number of distinct n-grams shared with ANY eval doc,
    * contaminated = n_hits > 0. Docs with fewer than n words have
    * zero hits by construction.
    */
  def flagContaminated(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalShingles = evalDocs
      .select(explode(T.shingles(col(textCol), n)).as("sg"))
      .distinct()
    // shingles() emits distinct n-grams per doc, so a plain count of
    // join matches IS the distinct-shared-shingle count.
    // spread (r19, Par scaladoc): the corpus-side shingle explode must
    // not run on a single-split scan
    val hits = Par.spread(
        corpus.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
        col("doc_id"))
      .select(col("doc_id"), explode(T.shingles(col("txt"), n)).as("sg"))
      .join(broadcast(evalShingles), Seq("sg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }
}
