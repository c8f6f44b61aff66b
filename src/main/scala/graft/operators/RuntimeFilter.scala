package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.expressions.BloomFunctions

/** Runtime semi-join reduction via Bloom filter — the join-pruning
  * move for the regime BETWEEN broadcast and bare shuffle: the
  * filtered dimension is too large to broadcast-hash-join cheaply,
  * but its key SET compresses to a few MB of Bloom bits. Building
  * the filter is one tree-aggregated pass over the dim keys
  * (commutative bit-OR merge — order-independent, driver holds only
  * the final bits, ~1.2 MB at 1M keys / 1% fpp); probing it prunes
  * the 100 TB fact scan BEFORE the join shuffle, so shuffle volume
  * drops by the fact's miss rate. False positives survive the probe
  * but are removed by the exact join that follows — the result is
  * byte-identical to the plain join at every fpp.
  */
object RuntimeFilter {

  /** One pass over dim: Bloom filter of its (long) key column.
    * expectedItems <= 0 means count(dim) first (dim is the small
    * side; one extra metadata-cheap pass).
    */
  def bloomOfKeys(dim: DataFrame, dimKey: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems else math.max(dim.count(), 1L)
    dim.stat.bloomFilter(dimKey, n, fpp)
  }

  /** Fact rows whose key might be in the Bloom filter (superset of
    * the true semi-join by construction).
    */
  def bloomPrune(fact: DataFrame, factKey: String, bloom: BloomFilter): DataFrame =
    fact.filter(BloomFunctions.mightContainLong(col(factKey), bloom))

  /** Exact equi-join with the fact side Bloom-pruned before the
    * shuffle. Same rows as fact.join(dim, fact(factKey) ===
    * dim(dimKey)) — the exact join removes Bloom false positives.
    */
  def bloomPrunedEquiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrune(fact, factKey, bloomOfKeys(dim, dimKey, fpp))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
