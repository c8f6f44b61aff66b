package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for reproducible training-data mixes.
  *
  * `rand()`-based sampling is non-reproducible across runs, partition
  * layouts, and engines; hash-threshold sampling keys the decision on
  * a content hash of the row id, so the same row is kept everywhere,
  * forever — a rerun of a 100 TB mix job produces the identical
  * sample, and membership can be audited per row. Per-row codegen'd
  * expressions, no shuffle at all: sampling is a pure filter that
  * stacks with scan pushdown.
  */
object Sampling {

  /** Stable bucket in [0, 10000): first 8 md5 hex digits of the id as
    * an int, mod 10000 — reproducible in any engine with md5
    * (DuckDB: CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 10000).
    */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(10000))

  /** Uniform deterministic sample: keep rows whose bucket falls below
    * rate * 10000 (rate resolution 1/10000).
    */
  def uniformSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit((rate * 10000).toInt))

  /** Stratified deterministic sample: per-stratum rates with a
    * default for unlisted strata — the "mix recipe" primitive
    * (e.g. keep 25% of en, 100% of low-resource languages).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * 10000).toInt): Column) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === lit(k), lit((v * 10000).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }

  /** Deterministic shard assignment — the dataloader-facing output
    * step of a training mix: every doc lands in exactly one of
    * `nShards` shards, keyed on a content hash of its id, so the
    * shard layout is reproducible across engines, runs, and partition
    * layouts, and any shard can be re-materialized independently.
    * Pure per-row expression (no shuffle); writing
    * `.partitionBy("shard")` on the result gives one directory per
    * shard. Shard sizes concentrate tightly around n/nShards (md5
    * uniformity) — profiled by [[shardStats]].
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard",
      pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(nShards)))

  /** Per-shard row/token inventory: the balance check a sharded
    * training set ships with.
    */
  def shardStats(sharded: DataFrame, tokenCol: String): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))

  /** Temperature-weighted mix (the multilingual-training mix rule:
    * sampling probability over strata p_s ∝ n_s^alpha with alpha = 0.5
    * — small domains upweighted, large ones damped): materializes a
    * deterministic hash-threshold sample whose per-stratum keep rate
    * targets `targetTotal` · p_s rows. Rates are EXACT integer
    * arithmetic so any engine replays them bit-for-bit: the weight is
    * floor(sqrt(n_s)·1000) (sqrt is IEEE correctly-rounded — identical
    * everywhere; pow(x, 0.5) is not guaranteed to be), the weight sum
    * is an integer (order-independent), and
    * rate_bp = min(10000, (T·w_s·10000) div (W·n_s)) uses integral
    * division — no double division whose rounding could flip a floor
    * at a bucket boundary. The products run in DECIMAL(38,0): at the
    * 100 TB doc targets (targetTotal 1e8, n_s 1e10 → w_s ≈ 1e8, so
    * T·w_s·1e4 ≈ 1e20) the triple product overflows a Long, and under
    * ANSI mode that is a thrown error, not a wrap — decimal headroom
    * (1e38) covers any corpus that fits in Long row counts.
    *
    * Scale: one count aggregate over the corpus (tiny (stratum, n)
    * rows), the per-stratum rate table broadcast back, and the sample
    * itself is a pure filter — the corpus never shuffles. Two scans
    * total; the decision is auditable per row (md5 bucket vs the
    * published rate_bp).
    */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
      targetTotal: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val weights = counts.withColumn("wt",
      floor(sqrt(col("n").cast("double")) * 1000).cast("long"))
    val rates = weights
      .crossJoin(broadcast(weights.agg(sum(col("wt")).as("w_sum"))))
      .withColumn("rate_bp",
        least(lit(10000L),
          expr(s"(CAST($targetTotal AS DECIMAL(38,0)) * wt * 10000)" +
            " div (CAST(w_sum AS DECIMAL(38,0)) * n)")))
      .select(col(stratumCol), col("rate_bp"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol)) < col("rate_bp"))
      .select(col(idCol), col(stratumCol), col("rate_bp"))
  }

  /** Quota sample: keep at most `quota` rows per stratum, chosen by
    * deterministic hash rank (lowest bucket first, ties by lowest id)
    * — the per-domain cap a training mix applies so no single source
    * dominates. Rate-based sampling can't express "at most K"; this
    * can, and stays reproducible across engines and runs.
    *
    * Scale: goes through the bounded-heap TopK aggregate, so each map
    * task contributes at most `quota` rows per stratum to the shuffle
    * — no per-group sort of millions of members (the window
    * row_number form sorts every group; see TopK).
    */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String,
      quota: Int): DataFrame =
    TopK.perGroup(
      df.withColumn("__neg_bucket", -hashBucket(col(idCol)).cast("double")),
      Seq(stratumCol), "__neg_bucket", idCol, Nil, quota)
      .select(col(idCol), col(stratumCol),
        (-col("__neg_bucket")).cast("long").as("bucket"))

  /** Deterministic epoch-shuffle manifest: for each epoch, a fresh
    * pseudo-random permutation of the corpus as explicit (epoch, id,
    * pos) rows — the dataloader contract that makes "shuffle each
    * epoch" reproducible across engines, reruns, and partition
    * layouts (sort key = md5(epoch:id), position = windowless global
    * rank). Epochs are independent permutations, but every engine
    * derives the SAME ones.
    *
    * Scale: one distributed range-sort per epoch (the honest cost of
    * a total order); driver traffic = numPartitions offsets per
    * epoch. Emitting the manifest instead of rewriting the data means
    * the 100 TB corpus is never copied per epoch.
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
      numPartitions: Int = 0): DataFrame = {
    require(epochs >= 1, "need at least one epoch")
    (0 until epochs).map { e =>
      val keyed = df.select(col(idCol).as("id"))
        .withColumn("skey", md5(concat_ws(":", lit(e), col("id").cast("string"))))
      Layout.globalRank(keyed, Seq(col("skey"), col("id")), rankName = "pos",
          numPartitions = numPartitions)
        .select(lit(e).cast("int").as("epoch"), col("id"), col("pos"))
    }.reduce(_ unionAll _)
  }

  /** Leakage-safe train/val/test split: the SPLIT UNIT is the
    * near-duplicate cluster, never the document — a near-dup pair
    * straddling train and test is evaluation leakage (the model
    * "generalizes" to a paraphrase of its own training data), and
    * document-level hashing produces exactly those pairs.
    * `components` is (id, component_id) from the dedup graph
    * (singletons absent — they become their own cluster); the split
    * is the md5 bucket of the CLUSTER id, so every member of a
    * cluster lands in the same split by construction, deterministic
    * across runs/engines/appends. Output: (id, cluster_id, split).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      components: DataFrame, trainBp: Long, valBp: Long): DataFrame = {
    require(trainBp + valBp <= 10000L, "train + val shares exceed 100%")
    val labeled = docs.select(col(idCol).as("id"))
      .join(components.select(col("id"), col("component_id")), Seq("id"),
        "left_outer")
      .withColumn("cluster_id", coalesce(col("component_id"), col("id")))
    labeled
      .withColumn("split",
        when(hashBucket(col("cluster_id")) < trainBp, "train")
          .when(hashBucket(col("cluster_id")) < trainBp + valBp, "val")
          .otherwise("test"))
      .select(col("id"), col("cluster_id"), col("split"))
  }

  /** TOKEN-budget source mix — the data-mixture knob a pretraining
    * run actually tunes: keep, per source, the greedy md5-ordered
    * prefix of documents whose cumulative TOKEN count stays within
    * that source's budget. Budgets are in tokens, not documents
    * (sources with long documents contribute fewer of them), the
    * md5 order makes the kept set stable across runs/engines/appends
    * (the q220 discipline), and a kept document is never truncated —
    * the last doc that would cross the budget is dropped, not split.
    *
    * Scale shape: the per-source cumulative is NOT a per-source
    * window (a 5-source corpus would put 20% of 100 TB in one window
    * partition). Instead ONE `Layout.globalPrefixSum` ordered by
    * (source, md5key, id) carries the running token count; per-source
    * offsets are the |sources|-row aggregate min(cum - n_tokens)
    * broadcast back, and the budget test is a pure filter. One range
    * shuffle + one bounded aggregate, regardless of corpus size.
    */
  def tokenBudgetMix(docs: DataFrame, idCol: String, srcCol: String,
      tokenCount: Column, budgetPerSource: Long,
      numPartitions: Int = 0): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(srcCol).as("source"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("md5key", md5(col("id").cast("string")))
    val pref = Layout.globalPrefixSum(keyed,
      Seq(col("source"), col("md5key"), col("id")), "n_tokens",
      cumName = "cum_global", numPartitions = numPartitions)
    val offsets = pref.groupBy(col("source"))
      .agg(min(col("cum_global") - col("n_tokens")).as("src_offset"))
    pref.join(broadcast(offsets), Seq("source"))
      .withColumn("cum_source", col("cum_global") - col("src_offset"))
      .filter(col("cum_source") <= budgetPerSource)
      .select(col("id"), col("source"), col("n_tokens"), col("cum_source"))
  }
}
