package graft

import org.apache.spark.sql.catalyst.expressions.{Cast => CCast, GetStructField}

/** Round-18 extension of [[graft.plans.NestedRenamePushdown]] to
  * every expression position: join conditions and sort orders carry
  * the same `GetStructField(Cast(...))` extractions Filters did, and
  * each blocked SchemaPruning/pushdown the same way. The assertions
  * here are PLAN assertions — at 100 TB they are the difference
  * between reading one inner column and the whole struct on both
  * sides of a join.
  */
class Round18NestedPruningSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  private def renameCasts(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    plan.collect { case n =>
      n.expressions.map(_.collect {
        case GetStructField(CCast(_, _: org.apache.spark.sql.types.StructType, _, _), _, _) => 1
      }.sum).sum
    }.sum

  test("a join keyed on a nested-RENAMED field strips the cast and prunes both sides") {
    drop("r18_pj1"); drop("r18_pj2")
    Seq("r18_pj1", "r18_pj2").foreach { t =>
      spark.sql(s"""CREATE TABLE graft.$t (
        k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
        TBLPROPERTIES('key'='k')""")
      spark.sql(s"""INSERT INTO graft.$t
        SELECT id, named_struct('fmt', 'f', 'sz', id % 50) FROM range(100)""")
      spark.sql(s"ALTER TABLE graft.$t RENAME COLUMN meta.sz TO bytes")
    }
    val j = spark.sql("""
      SELECT count(*) AS n FROM graft.r18_pj1 a JOIN graft.r18_pj2 b
      ON a.meta.bytes = b.meta.bytes""")
    assert(j.as[Long].head() === 200L)
    assert(renameCasts(j.queryExecution.optimizedPlan) === 0,
      "the join condition still extracts through the rename cast:\n" +
        j.queryExecution.optimizedPlan.toString)
    val phys = j.queryExecution.executedPlan.toString
    // SchemaPruning reached both scans: each reads ONLY the joined
    // inner column
    assert(phys.split("ReadSchema: struct<meta:struct<sz:bigint>>", -1)
      .length - 1 === 2,
      s"both sides must prune to the one inner column:\n${phys.take(3000)}")
  }

  test("ORDER BY a nested-RENAMED field strips the cast and prunes the scan") {
    drop("r18_psort")
    spark.sql("""CREATE TABLE graft.r18_psort (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k')""")
    spark.sql("""INSERT INTO graft.r18_psort
      SELECT id, named_struct('fmt', 'f', 'sz', (id * 37) % 100)
      FROM range(100)""")
    spark.sql("ALTER TABLE graft.r18_psort RENAME COLUMN meta.sz TO bytes")
    val q = spark.sql("""
      SELECT meta.bytes AS b FROM graft.r18_psort
      ORDER BY meta.bytes DESC LIMIT 3""")
    assert(q.as[Long].collect().toSeq === Seq(99L, 98L, 97L))
    assert(renameCasts(q.queryExecution.optimizedPlan) === 0,
      "the sort order still extracts through the rename cast:\n" +
        q.queryExecution.optimizedPlan.toString)
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), phys.take(1500))
    assert(phys.contains("ReadSchema: struct<meta:struct<sz:bigint>>"),
      s"the scan must read only the sorted inner column:\n${phys.take(3000)}")
  }
}
