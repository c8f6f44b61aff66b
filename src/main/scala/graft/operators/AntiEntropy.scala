package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Merkle-bucket replica reconciliation — the anti-entropy primitive
  * (Dynamo/Cassandra repair, DeCandia et al. SOSP'07) for two copies
  * of a 100 TB table: instead of a full-table row diff (a corpus-wide
  * join), each replica reduces to per-bucket summaries — row count +
  * XOR of per-row digests, both order-independent and map-side
  * combinable — and only buckets whose summaries disagree pay a
  * row-level drill-down. Healthy replicas cost two scans and a
  * bucket-count-sized compare; the drill-down joins are semi-join
  * pruned to damaged buckets, so repair cost scales with the damage,
  * not the table.
  *
  * XOR (not sum) combines digests: order-independent like sum but
  * overflow-free under ANSI mode, and any single-row change flips
  * the bucket digest with probability 1 - 2^-60. A pair of
  * IDENTICAL divergent rows in one bucket cancels in XOR — the count
  * catches deletions/insertions, and duplicate-key rows are excluded
  * by the unique-key contract the caller's keyCol carries.
  *
  * The row digest always folds the KEY in front of the caller's
  * content digest (md5 over `key|content`): with a content-only
  * digest, any re-keying that preserves a bucket's content multiset
  * (two keys swapping payloads) would leave both count and XOR
  * unchanged — a deterministic false negative the stated 1-2^-60
  * bound does not cover. Folding the key in makes a payload swap
  * flip both rows' digests, so it is caught like any other edit.
  */
object AntiEntropy {

  private def rowDigest(keyCol: String, digest: Column): Column =
    T.md5Int60(concat_ws("|", col(keyCol).cast("string"), digest))

  /** Per-bucket (n_rows, xor of 60-bit row digests) summary. */
  def bucketDigests(df: DataFrame, keyCol: String, digest: Column,
      nBuckets: Int): DataFrame =
    df.select(pmod(col(keyCol), lit(nBuckets.toLong)).as("bucket"),
      rowDigest(keyCol, digest).as("dg"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("dg")).as("xor_digest"))

  /** Reconcile two replicas keyed by `keyCol` with row content
    * canonicalized by `digest` (a string Column — build it with
    * concat_ws over exact-integer-rendered fields so both engines
    * serialize identically). Returns one row per DIFFERING bucket:
    * per-side row counts and the rows present on exactly one side
    * (same key with changed content appears in both "only" counts).
    */
  def reconcile(left: DataFrame, right: DataFrame, keyCol: String,
      leftDigest: Column, rightDigest: Column, nBuckets: Int): DataFrame = {
    def prep(df: DataFrame, digest: Column) =
      df.select(pmod(col(keyCol), lit(nBuckets.toLong)).as("bucket"),
        col(keyCol).as("k"), rowDigest(keyCol, digest).as("dg"))
    val l = prep(left, leftDigest).cache()
    val r = prep(right, rightDigest).cache()
    def summarize(df: DataFrame, n: String, x: String) =
      df.groupBy(col("bucket"))
        .agg(count(lit(1)).as(n), bit_xor(col("dg")).as(x))
    val diffB = summarize(l, "nl", "xl")
      .join(summarize(r, "nr", "xr"), Seq("bucket"), "full_outer")
      .filter(!coalesce(col("nl") === col("nr") && col("xl") === col("xr"),
        lit(false)))
      .select(col("bucket"), coalesce(col("nl"), lit(0L)).as("n_left"),
        coalesce(col("nr"), lit(0L)).as("n_right"))
    // drill down inside damaged buckets only: the differing-bucket
    // list is bounded by the damage, so it broadcasts
    val lf = l.join(broadcast(diffB.select(col("bucket"))), Seq("bucket"),
      "left_semi")
    val rf = r.join(broadcast(diffB.select(col("bucket"))), Seq("bucket"),
      "left_semi")
    val onlyL = lf.join(rf, Seq("bucket", "k", "dg"), "left_anti")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_only_left"))
    val onlyR = rf.join(lf, Seq("bucket", "k", "dg"), "left_anti")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_only_right"))
    diffB.join(onlyL, Seq("bucket"), "left")
      .join(onlyR, Seq("bucket"), "left")
      .select(col("bucket"), col("n_left"), col("n_right"),
        coalesce(col("n_only_left"), lit(0L)).as("n_only_left"),
        coalesce(col("n_only_right"), lit(0L)).as("n_only_right"))
  }
}
