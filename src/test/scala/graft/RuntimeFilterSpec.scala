package graft

import org.apache.spark.sql.functions._
import graft.expressions.BloomFunctions
import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = (1L to 10000L).map(k => (k, s"v$k")).toDF("k", "payload")
  private lazy val dim = (1L to 10000L by 100).map(k => (k, s"d$k")).toDF("dk", "attr")

  test("bloom probe never misses a present key and prunes most absent ones") {
    val bloom = RuntimeFilter.bloomOfKeys(dim, "dk", fpp = 0.01)
    val pruned = RuntimeFilter.bloomPrune(fact, "k", bloom)
    val keys = pruned.select("k").as[Long].collect().toSet
    val dimKeys = dim.select("dk").as[Long].collect().toSet
    assert(dimKeys.subsetOf(keys), "bloom must have no false negatives")
    // 100 true keys of 10000; at fpp=1% the pruned set stays far below
    // the fact size — the point of pruning before the shuffle
    assert(keys.size < 500, s"expected heavy pruning, kept ${keys.size}")
  }

  test("bloom-pruned equi-join is byte-identical to the plain join") {
    val viaBloom = RuntimeFilter
      .bloomPrunedEquiJoin(fact, "k", dim, "dk", fpp = 0.30)
    val plain = fact.join(dim, fact("k") === dim("dk"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() === 100)
  }

  test("probe predicate evaluates inside whole-stage codegen") {
    val bloom = RuntimeFilter.bloomOfKeys(dim, "dk", fpp = 0.01)
    // spark.range is a codegen source; a local Seq would be folded
    // into the LocalTableScan by ConvertToLocalRelation at plan time
    val filtered = spark.range(1, 10001).select(col("id").as("k"))
      .filter(BloomFunctions.mightContainLong(col("k"), bloom))
    // the filter must sit under a WholeStageCodegen span (the `*(n)`
    // marker in treeString), not fall back to interpreted eval
    import org.apache.spark.sql.execution.{FilterExec, WholeStageCodegenExec}
    val codegenFilters = filtered.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.collect { case f: FilterExec => f }
    }.flatten
    assert(codegenFilters.exists(
      _.condition.toString.toLowerCase.contains("bloommightcontainlong")),
      filtered.queryExecution.executedPlan.toString())
    // and null keys are dropped, not crashed on
    val withNulls = Seq(Some(1L), None, Some(9999L)).toDF("k")
    val kept = withNulls
      .filter(BloomFunctions.mightContainLong(col("k"), bloom))
      .count()
    assert(kept <= 2)
  }
}
