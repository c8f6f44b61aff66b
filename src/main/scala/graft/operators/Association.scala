package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the k = 2 frequency pass of
  * Apriori (Agrawal & Srikant, VLDB 1994): which item pairs co-occur
  * in the same basket more often than chance. The analytics family's
  * "bought-together" / co-occurrence primitive.
  *
  * Scale shape: the q21 posting-list discipline, transposed —
  * baskets, not inverted lists. One shuffle groups each basket's
  * distinct sorted items; pairs are emitted basket-locally via
  * posexplode + slice (strictly-increasing pairs, no self-join whose
  * BOTH exploded sides re-shuffle), then one hash aggregate counts
  * support. Work is quadratic only in BASKET size — bounded by the
  * data model (order line counts), the same per-bucket bound as the
  * LSH band joins. maxBasket enforces that contract: degenerate
  * baskets are dropped and counted via an observe metric rather than
  * silently exploding the pair space.
  */
object Association {

  /** Co-occurrence pairs with support >= minSupport. Output:
    * (item1, item2, n_baskets) with item1 < item2.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    val baskets = df.select(col(basketCol).as("b"), col(itemCol).as("item"))
      .distinct()
    val lists = baskets.groupBy(col("b"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .observe("basket_cap",
        sum(when(size(col("items")) > maxBasket, 1L).otherwise(0L))
          .as("dropped_baskets"),
        max(size(col("items"))).as("max_basket_seen"))
      .filter(size(col("items")) <= maxBasket)
    lists
      .select(posexplode(col("items")).as(Seq("i", "item1")), col("items"))
      .select(col("item1"),
        explode(slice(col("items"), col("i") + 2, size(col("items"))))
          .as("item2"))
      .groupBy(col("item1"), col("item2"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }

  /** [[frequentPairs]] plus the lift ratio — observed co-occurrence
    * over the independence expectation: lift = n_pair · n_total /
    * (n_a · n_b), floored to the 4dp grid (exact-long inputs, IEEE
    * division — deterministic cross-engine). Item frequencies and the
    * basket total re-aggregate the deduplicated basket relation; the
    * raw table is scanned once.
    */
  def frequentPairsWithLift(df: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    val baskets = df.select(col(basketCol).as("b"), col(itemCol).as("item"))
      .distinct()
    val freq = baskets.groupBy(col("item")).agg(count(lit(1)).as("nf"))
    val total = baskets.agg(countDistinct(col("b")).as("nt"))
    // freq is one row per distinct item — usually broadcastable, but
    // NOT forced: an open-vocabulary item domain must be allowed to
    // degrade to a shuffle join (the q103 broadcast-gate lesson). The
    // 1-row total is always a broadcast.
    frequentPairs(df, basketCol, itemCol, minSupport, maxBasket)
      .join(freq.select(col("item").as("item1"), col("nf").as("nf1")), "item1")
      .join(freq.select(col("item").as("item2"), col("nf").as("nf2")), "item2")
      .crossJoin(broadcast(total))
      .withColumn("lift4",
        floor(col("n_baskets") * col("nt") / (col("nf1") * col("nf2")) * 10000)
          / 10000.0)
      .select(col("item1"), col("item2"), col("n_baskets"), col("lift4"))
  }
}
