package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** NESTED data skipping (round 18): `statscols` may name struct
  * FIELDS (`meta.bytes`) — the manifest records the inner field's
  * typed min/max per batch, and a plain `.filter($"meta.bytes" > x)`
  * prunes batch dirs at optimize time exactly like a flat column
  * (the predicate's GetStructField chain maps to the dotted stats
  * path; after a nested RENAME the NestedRenamePushdown rewrite has
  * already re-bound the chain to the physical inner name the stats
  * were recorded under). The reference's nested documents model
  * (`agf_ingestion_lambda.py:207`) gets manifest-level skipping on
  * its struct fields with no flattening.
  */
class NestedStatsPruneSpec extends SparkTestBase {
  import spark.implicits._

  private def base(d: String): String = d.substring(d.lastIndexOf('/') + 1)

  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  test("a range filter on a struct field prunes to the intersecting batches") {
    val path = tmpDir("vt_nested_stats")
    Seq(0 until 100, 100 until 200, 200 until 300, 300 until 400)
      .foreach { r =>
        VersionedTable.append(
          r.toDF("k").selectExpr("CAST(k AS LONG) AS k",
            "named_struct('fmt', 'f', 'bytes', CAST(k AS LONG) * 10) AS meta"),
          path, statsCols = Seq("meta.bytes"))
      }
    val auto = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"meta.bytes" >= 2500L)
    val dirs = scannedDirs(auto)
    assert(dirs.size === 2, s"expected b3+b4 only, scanned $dirs")
    assert(dirs.forall(d => base(d).startsWith("b3_") || base(d).startsWith("b4_")))
    // the answer is readAt's (pruning never changes results)
    val expected = VersionedTable.readAt(spark, path, 4)
      .filter($"meta.bytes" >= 2500L).selectExpr("k", "meta.bytes")
      .as[(Long, Long)].collect().sorted
    assert(auto.selectExpr("k", "meta.bytes")
      .as[(Long, Long)].collect().sorted === expected)
    // an impossible range collapses to an empty LocalRelation
    val none = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"meta.bytes" > 100000L)
    assert(none.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l }.nonEmpty)
    assert(none.count() === 0L)
  }

  test("nested stats survive a nested RENAME: the logical predicate still prunes") {
    spark.sql("DROP TABLE IF EXISTS graft.nsp_renamed")
    spark.sql("""CREATE TABLE graft.nsp_renamed (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k', 'statscols'='meta.sz')""")
    (0 until 4).foreach { b =>
      spark.sql(s"""INSERT INTO graft.nsp_renamed
        SELECT id, named_struct('fmt', 'f', 'sz', id * 10)
        FROM range(${b * 100}, ${b * 100 + 100})""")
    }
    spark.sql("ALTER TABLE graft.nsp_renamed RENAME COLUMN meta.sz TO bytes")
    // the user's predicate speaks the LOGICAL name; stats were
    // recorded under the stable physical inner name — the rename
    // rewrite re-binds the extraction before the stats rule matches
    val q = spark.table("graft.nsp_renamed").filter($"meta.bytes" >= 2500L)
    val dirs = scannedDirs(q)
    assert(dirs.size === 2, s"expected 2 of 5 batch dirs, scanned $dirs")
    assert(q.count() === 150L)
    // ...and the statscols property follows the rename for future
    // writes (colProps rewrite)
    val props = spark.sql("SHOW TBLPROPERTIES graft.nsp_renamed")
      .as[(String, String)].collect().toMap
    assert(props("statscols") === "meta.bytes" || props("statscols") === "meta.sz",
      s"statscols after rename: ${props("statscols")}")
  }
}
