package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed packing equals the window formulation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), size(split(col("text"), " ")).as("tokens"))
    val win = Packing.packByBudget(docs, "doc_id", "tokens", 1000L)
      .select("doc_id", "tokens_before", "pack_id")
      .as[(Long, Long, Long)].collect().toSet
    val dist = Packing.packByBudgetDistributed(docs, "doc_id", "tokens", 1000L, 7)
      .select("doc_id", "tokens_before", "pack_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(dist === win)
  }

  test("pack stats respect the budget up to one straddling doc") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), size(split(col("text"), " ")).as("tokens"))
    val packed = Packing.packByBudgetDistributed(docs, "doc_id", "tokens", 1000L)
    val stats = Packing.packStats(packed, "tokens", 1000L)
    val maxTok = docs.agg(max("tokens")).head().getInt(0)
    // each pack's tokens < budget + max single doc (straddle bound)
    assert(stats.filter(col("n_tokens") >= 1000L + maxTok).count() === 0)
    assert(stats.count() > 1)
  }
}
