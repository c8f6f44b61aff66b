package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join split
  * (on by default in GraftSession) handles most runtime skew; salting
  * is the static fallback for pathological keys — e.g. a single
  * instrument producing 90% of file_inventory rows, or a stop-shingle
  * shared by every document.
  *
  * Deterministic salting: the salt is derived from a hash of the
  * large side's whole row, not rand(), so retries and replays
  * partition identically (Spark task retries would otherwise see
  * different salt assignments mid-shuffle).
  */
object Skew {

  /** Equi-join `large` with `small` on `key`, spreading each key of
    * the large side over `saltFactor` sub-keys and replicating the
    * small side once per sub-key. Semantically identical to
    * large.join(small, key, joinType) for inner and left joins: a
    * large-side row carries exactly one salt, so an unmatched row
    * null-extends exactly once in left mode (the small side is
    * replicated to every salt, never the other way around — which is
    * also why right/full modes are NOT offered: the small side's
    * replicas would multiply unmatched small rows).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not $joinType")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(struct(large.columns.map(col): _*)), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Pre-flight skew diagnosis for a prospective join/group key:
    * per-key row counts against the table total, heavy keys above a
    * basis-point share threshold. Run it BEFORE the 100 TB join —
    * the output (a handful of hot keys) decides between the plain
    * plan, saltedJoin, or a broadcast of the hot subset. One
    * map-side-combined count aggregate; the total is a 1-row
    * broadcast; share in exact integer basis points.
    */
  def keySkewProfile(df: DataFrame, key: String, minShareBp: Long): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_bp", expr("div(n_rows * 10000, total)"))
      .filter(col("share_bp") >= minShareBp)
      .select(col(key), col("n_rows"), col("total"), col("share_bp"))
  }

  /** Pre-flight join-output cardinality: the EXACT row count an
    * equi-join would produce, from per-key count aggregates alone —
    * |A ⋈_k B| = Σ_k n_A(k)·n_B(k) — without running the join. Costs
    * two count aggregates plus a join over the (distinct-key-sized)
    * count tables; at 100 TB that's the difference between a
    * pre-flight and an incident (a hidden many-to-many key turns a
    * "join" into a cross-product, and this is the check that catches
    * it first). Output: the topN contributing keys with their
    * per-side multiplicities and the total estimate (1-row broadcast)
    * — the q131 companion: q131 flags hot GROUP keys, this flags hot
    * JOIN fan-out.
    */
  def joinCardinalityEstimate(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, topN: Int): DataFrame = {
    val la = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rb = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    val contrib = la.join(rb, Seq("key"))
      .withColumn("contrib", col("n_left") * col("n_right"))
    val total = contrib.agg(sum(col("contrib")).as("total_rows"))
    contrib.crossJoin(broadcast(total))
      .orderBy(desc("contrib"), asc("key")).limit(topN)
  }

  /** The decision table behind [[statsDrivenJoin]]: for each hot key
    * of the large side (share >= minShareBp, from [[keySkewProfile]]),
    * the small side's row count for that key and the chosen remedy —
    * `broadcast_hot` when the small side's hot-key rows fit a
    * broadcast (n_small <= broadcastRowLimit), `salted` otherwise.
    * Exposed as its own operator so the plan choice is itself
    * auditable (and driver-verified, q237a) rather than buried in
    * the join.
    */
  def joinPlanDecisions(large: DataFrame, small: DataFrame, key: String,
      minShareBp: Long, broadcastRowLimit: Long): DataFrame = {
    val smallCounts = small.groupBy(col(key)).agg(count(lit(1)).as("n_small"))
    keySkewProfile(large, key, minShareBp)
      .join(smallCounts, Seq(key), "left")
      .select(col(key), col("n_rows"), col("share_bp"),
        coalesce(col("n_small"), lit(0L)).as("n_small"),
        when(coalesce(col("n_small"), lit(0L)) <= broadcastRowLimit,
          lit("broadcast_hot")).otherwise(lit("salted")).as("strategy"))
  }

  /** Stats-driven equi-join: the pre-flight profiles COMPOSED with
    * their remedies. [[keySkewProfile]] diagnoses the large side's
    * hot keys; each key-group then takes the plan its stats call for:
    *
    *   - cold keys (share < minShareBp): the plain shuffle join —
    *     AQE handles residual runtime skew;
    *   - hot keys whose small-side rows fit a broadcast: the large
    *     side's hot rows join a broadcast of ONLY those small rows —
    *     zero shuffle for the worst keys;
    *   - hot keys too wide to broadcast: [[saltedJoin]] spreads each
    *     over `saltFactor` sub-keys.
    *
    * Output is semantically identical to `large.join(small, key,
    * joinType)` for inner and left joins: the key-groups partition
    * the key space, and each branch is the plain join restricted to
    * its group. Left mode is where skew hurts most in practice
    * (fact-to-dim with missing dims): unmatched hot-key rows
    * null-extend inside their branch — including a hot key whose
    * small side is EMPTY, which rides the broadcast branch with an
    * empty broadcast — and null-key large rows survive through the
    * cold branch (its filter keeps them explicitly; inner mode leaves
    * them there too, where the join itself discards them). The
    * profile costs one map-side-combined count per side; the hot-key
    * set is bounded by construction (at most 10000/minShareBp keys),
    * so the driver hop and the isin filters stay small at any corpus
    * size. This is the operator a 100 TB join actually wants: the
    * q131/q145 pre-flights stop being advisory output and start
    * choosing the plan.
    */
  def statsDrivenJoin(large: DataFrame, small: DataFrame, key: String,
      minShareBp: Long, saltFactor: Int,
      broadcastRowLimit: Long, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"statsDrivenJoin supports inner/left joins, not $joinType")
    val left = joinType != "inner"
    // hot keys are never null: a null profile row goes to the cold
    // branch, where inner mode's join discards it and left mode's
    // filter keeps it for null-extension
    val decisions = joinPlanDecisions(large, small, key, minShareBp,
      broadcastRowLimit).collect().filter(_.get(0) != null)
    val bcastKeys = decisions.filter(_.getString(4) == "broadcast_hot")
      .map(_.get(0)).toSeq
    val saltKeys = decisions.filter(_.getString(4) == "salted")
      .map(_.get(0)).toSeq
    val hotKeys = bcastKeys ++ saltKeys
    val notHot =
      if (left) col(key).isNull || !col(key).isin(hotKeys: _*)
      else !col(key).isin(hotKeys: _*)
    val cold =
      if (hotKeys.isEmpty) large.join(small, Seq(key), joinType)
      else large.filter(notHot).join(small, Seq(key), joinType)
    val branches = Seq(
      Some(cold),
      if (bcastKeys.isEmpty) None
      else Some(large.filter(col(key).isin(bcastKeys: _*))
        .join(broadcast(small.filter(col(key).isin(bcastKeys: _*))),
          Seq(key), joinType)),
      if (saltKeys.isEmpty) None
      else Some(saltedJoin(large.filter(col(key).isin(saltKeys: _*)),
        small.filter(col(key).isin(saltKeys: _*)), key, saltFactor, joinType))
    ).flatten
    branches.reduce(_ unionByName _)
  }

  /** Two-phase aggregation for heavily skewed group keys: partial
    * count per (key, salt), then final combine per key. Spark's
    * map-side partial aggregation already does this for algebraic
    * aggregates; this form exists for aggregations where the
    * per-key state is large (e.g. collect_set) and one reducer would
    * otherwise hold a hot key's entire state.
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n_distinct"))
}
