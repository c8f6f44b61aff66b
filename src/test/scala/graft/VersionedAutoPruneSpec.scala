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

  test("compactByZOrder bounds BOTH dimensions: either column's filter opens a strict subset; 1-D clustering cannot") {
    import org.apache.spark.sql.DataFrame
    // x uniform 0..399; y a decorrelated permutation (x*7 mod 400) —
    // three arrival-order appends with NO stats, so before any
    // maintenance nothing can prune
    def fresh(prefix: String): String = {
      val path = tmpDir(prefix)
      val rows = (0 until 400).map(x => (x.toLong, (x * 7 % 400).toLong))
      Seq(rows.filter(_._1 % 3 == 0), rows.filter(_._1 % 3 == 1),
        rows.filter(_._1 % 3 == 2)).foreach { part =>
        VersionedTable.append(part.toDF("x", "y"), path)
      }
      path
    }
    def dirsFor(path: String, v: Long, f: DataFrame => DataFrame): Set[String] =
      scannedDirs(f(VersionedTable.readAtAuto(spark, path, v)))

    // 1-D clustering on x: x-filters skip, y-filters cannot
    val oneD = fresh("vt_zorder_1d")
    VersionedTable.compactByRange(spark, oneD, "x", 16)
    val oneDx = dirsFor(oneD, 4, _.filter($"x" < 100))
    val oneDy = dirsFor(oneD, 4, _.filter($"y" < 100))
    assert(oneDx.size <= 5, s"x-clustered x-filter should skip: $oneDx")
    assert(oneDy.size === 16,
      "1-D layout gives the OTHER column zero skipping — the measured baseline")

    // z-order on (x, y): both single-column filters skip
    val zD = fresh("vt_zorder_2d")
    VersionedTable.compactByZOrder(spark, zD, "x", "y", nBuckets = 16, bits = 2)
    val zx = dirsFor(zD, 4, _.filter($"x" < 100))
    val zy = dirsFor(zD, 4, _.filter($"y" < 100))
    assert(zx.size < 16 && zx.size <= 8, s"z-layout x-filter must skip: ${zx.size}")
    assert(zy.size < 16 && zy.size <= 8, s"z-layout y-filter must skip: ${zy.size}")

    // maintenance never changes content: both layouts answer every
    // filter identically to the pre-compaction table
    val before = VersionedTable.readAt(spark, zD, 3)
      .filter($"y" < 100).as[(Long, Long)].collect().sorted
    assert(VersionedTable.readAtAuto(spark, zD, 4).filter($"y" < 100)
      .as[(Long, Long)].collect().sorted === before)
    assert(VersionedTable.readAt(spark, oneD, 4).filter($"y" < 100)
      .as[(Long, Long)].collect().sorted === before)
  }

  test("an IN-list prunes to its value envelope") {
    val path = buildTable("vt_auto_in")
    val auto = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"k".isin(110L, 150L, 190L))
    val dirs = scannedDirs(auto)
    assert(dirs.size === 1 && base(dirs.head).startsWith("b2_"), s"scanned $dirs")
    assert(auto.select("v").as[Int].collect().sorted === Array(220, 300, 380))
  }

  test("the SQL surface prunes identically: graft_versioned TVF + WHERE") {
    val path = buildTable("vt_auto_sql")
    val df = spark.sql(
      s"SELECT k, v FROM graft_versioned('$path', 4) WHERE k >= 250")
    val dirs = scannedDirs(df)
    assert(dirs.size === 2 &&
      dirs.forall(d => base(d).startsWith("b3_") || base(d).startsWith("b4_")),
      s"SQL WHERE should prune like the DataFrame filter: $dirs")
    assert(df.count() === 150L)
    // versionless form reads the latest version
    assert(spark.sql(s"SELECT * FROM graft_versioned('$path')").count() === 400L)
  }

  test("graft_history and graft_changes TVFs: the commit log and the change feed from SQL text") {
    val path = buildTable("vt_tvf_hist")
    VersionedTable.deleteKeys(Seq(10).toDF("k"), "k", path)
    val kinds = spark.sql(
      s"SELECT kind FROM graft_history('$path') ORDER BY version")
      .as[String].collect()
    assert(kinds.toSeq === Seq("append", "append", "append", "append", "delete"))
    val feed = spark.sql(s"""
      SELECT _change_type, count(*) AS n
      FROM graft_changes('$path', 3, 5) GROUP BY 1 ORDER BY 1""")
      .as[(String, Long)].collect()
    // v4 appends 100 rows; v5 deletes one existing key
    assert(feed.toSeq === Seq(("delete", 1L), ("insert", 100L)))
  }

  test("disjunctions and non-integral predicates prune nothing but stay correct") {
    val path = buildTable("vt_auto_disj")
    val auto = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"k" < 50 || $"k" >= 350)
    assert(scannedDirs(auto).size === 4, "OR is not a conjunct: no pruning")
    assert(auto.count() === 100L)
  }
}
