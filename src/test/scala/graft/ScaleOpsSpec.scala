package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, Skew}

/** Scale-path operators: bucketed co-located joins (no shuffle) and
  * deterministic salting (identical results to the plain forms).
  */
class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"/tmp/graft-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Bucketing.writeBucketed(li.select("l_orderkey", "l_quantity"), "li_b", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(o.select("o_orderkey", "o_totalprice"), "o_b", 4, Seq("o_orderkey"))

    val bucketed = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plain = li.select("l_orderkey", "l_quantity").hint("merge") // force SMJ
      .join(o.select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
    assert(Bucketing.isShuffleFree(bucketed),
      s"expected no exchange:\n${bucketed.queryExecution.executedPlan}")
    assert(!Bucketing.isShuffleFree(plain))
    assert(bucketed.count() === plain.count())
  }

  test("salted join equals plain join") {
    val large = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val small = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = large.join(small, Seq("k"))
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 0))
      .head()
    val salted = Skew.saltedJoin(large, small, "k", 8)
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 0))
      .head()
    assert(salted === plain)
  }

  test("salted distinct count equals plain distinct count") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plain = df.groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n_distinct"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(df, "l_returnflag", "l_partkey", 8)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)

    // the plan must really be the two-stage rewrite: a partial
    // aggregate keyed by (key, __salt) feeding the final per-key sum —
    // the hot key's distinct state is spread over saltFactor reducers
    val plan = Skew.saltedDistinctCount(df, "l_returnflag", "l_partkey", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
    assert(plan.contains("hashpartitioning(l_returnflag"), plan)
  }
}
