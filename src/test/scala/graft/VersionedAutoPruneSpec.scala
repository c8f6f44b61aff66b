package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** The automatic manifest-stats pruning contract
  * (VersionedStatsPruning + readAtAuto): a plain `.filter` composed
  * on a versioned scan drops non-intersecting batch dirs from the
  * plan at optimize time, never changes the answer, keeps stats-less
  * batches (no stats = no claim), and collapses to an empty
  * LocalRelation when no batch can match.
  */
class VersionedAutoPruneSpec extends SparkTestBase {
  import spark.implicits._

  private def base(d: String): String = d.substring(d.lastIndexOf('/') + 1)

  /** Batch dirs the optimized plan will actually scan. */
  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  private def buildTable(prefix: String): String = {
    val path = tmpDir(prefix)
    Seq(0 until 100, 100 until 200, 200 until 300, 300 until 400)
      .foreach { r =>
        VersionedTable.append(r.toDF("k").withColumn("v", $"k" * 2), path,
          statsCols = Seq("k"))
      }
    path
  }

  test("a range filter prunes to the intersecting batches; the answer is readAt's") {
    val path = buildTable("vt_auto_range")
    val auto = VersionedTable.readAtAuto(spark, path, 4).filter($"k" >= 250)
    val dirs = scannedDirs(auto)
    assert(dirs.size === 2, s"expected b3+b4 only, scanned $dirs")
    assert(dirs.forall(d => base(d).startsWith("b3_") || base(d).startsWith("b4_")))
    val expected = VersionedTable.readAt(spark, path, 4)
      .filter($"k" >= 250).as[(Int, Int)].collect().sorted
    assert(auto.as[(Int, Int)].collect().sorted === expected)
  }

  test("a point filter opens exactly one batch") {
    val path = buildTable("vt_auto_point")
    val auto = VersionedTable.readAtAuto(spark, path, 4).filter($"k" === 150)
    val dirs = scannedDirs(auto)
    assert(dirs.size === 1 && base(dirs.head).startsWith("b2_"), s"scanned $dirs")
    assert(auto.select("v").as[Int].collect() === Array(300))
  }

  test("an impossible range collapses the scan to an empty LocalRelation") {
    val path = buildTable("vt_auto_empty")
    val auto = VersionedTable.readAtAuto(spark, path, 4).filter($"k" > 1000)
    val locals = auto.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l
    }
    assert(locals.nonEmpty, "expected the scan to fold to LocalRelation")
    assert(auto.count() === 0L)
  }

  test("a stats-less batch is never pruned (no stats = no claim)") {
    val path = buildTable("vt_auto_nostats")
    // appended WITHOUT statsCols: makes no range claim, so it must
    // survive every pruning decision
    VersionedTable.append(Seq(120).toDF("k").withColumn("v", $"k" * 2), path)
    val auto = VersionedTable.readAtAuto(spark, path, 5).filter($"k" >= 250)
    val dirs = scannedDirs(auto)
    assert(dirs.size === 3, s"expected b3+b4+stats-less b5, scanned $dirs")
    // and the filter on top still excludes its out-of-range row
    assert(auto.count() === 150L)
  }

  test("pruning composes with merge-on-read tombstones") {
    val path = buildTable("vt_auto_tomb")
    VersionedTable.deleteKeys(Seq(260, 261, 10).toDF("k"), "k", path)
    val auto = VersionedTable.readAtAuto(spark, path, 5).filter($"k" >= 250)
    // the user filter reaches the scan through the anti-join, so b1/b2
    // are still pruned away
    val dirs = scannedDirs(auto).filterNot(d => base(d).startsWith("b5_"))
    assert(dirs.size === 2 && dirs.forall(d => base(d).startsWith("b3_") || base(d).startsWith("b4_")),
      s"scanned $dirs")
    assert(auto.count() === 148L) // 150 minus the two in-range deletes
  }

  test("disjunctions and non-integral predicates prune nothing but stay correct") {
    val path = buildTable("vt_auto_disj")
    val auto = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"k" < 50 || $"k" >= 350)
    assert(scannedDirs(auto).size === 4, "OR is not a conjunct: no pruning")
    assert(auto.count() === 100L)
  }
}
