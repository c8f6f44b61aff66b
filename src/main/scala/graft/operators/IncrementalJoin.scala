package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Incremental view maintenance for inner equi-JOIN views — the join
  * counterpart of IncrementalAgg's additive algebra:
  *
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB)
  *     = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
  *
  * so a stored view absorbs insert batches by computing only the
  * three delta terms — the stored A⋈B rows are never recomputed.
  *
  * Scale shape: the deltas are by contract batch-sized (≪ the stored
  * tables), so each delta term is a broadcast-hash join — the 100 TB
  * sides (A, B, and the view itself) are scanned at most once each
  * and NEVER shuffled; a key-partitioned/bucketed layout additionally
  * prunes those scans to the delta keys' partitions. Deletes are out
  * of scope here by design (an inner-join view absorbs deletes via
  * the same semi-join-scoped recompute as IncrementalAgg.applyDeletes).
  */
object IncrementalJoin {

  /** view ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, with every delta side broadcast.
    * `on(left, right)` builds the equi-join condition from the two
    * frames so differing key names survive column resolution.
    */
  def maintainJoinView(view: DataFrame,
      aOld: DataFrame, deltaA: DataFrame,
      bOld: DataFrame, deltaB: DataFrame,
      on: (DataFrame, DataFrame) => Column): DataFrame = {
    val dAB = { val da = broadcast(deltaA); da.join(bOld, on(da, bOld)) }
    val AdB = { val db = broadcast(deltaB); aOld.join(db, on(aOld, db)) }
    val dAdB = { val da = broadcast(deltaA); da.join(deltaB, on(da, deltaB)) }
    view.unionByName(dAB).unionByName(AdB).unionByName(dAdB)
  }
}
