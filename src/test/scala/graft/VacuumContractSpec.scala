package graft

import graft.operators.VersionedTable

/** The VACUUM vs concurrent-reader retention contract (round-15
  * verdict #6): a query plans against a version's manifest and scans
  * later, so retention must outlive the longest-running query. The
  * spec pins both legs — a planned scan over RETAINED versions
  * completes across a vacuum; a planned scan over a RECLAIMED version
  * fails loudly and the failure is attributable post hoc
  * ([[VersionedTable.diagnoseVacuumRace]] names the retention fix,
  * never "storage fault").
  */
class VacuumContractSpec extends SparkTestBase {
  import spark.implicits._

  test("scan planned at vN, vacuum reclaims vN: loud failure, diagnosable against the recorded floor") {
    val path = tmpDir("vac_race")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path) // v1
    // v2 REPLACES the content, so v1's batch is unreferenced by v2
    VersionedTable.overwrite(Seq((2L, 20L)).toDF("k", "v"), path) // v2
    // the reader PLANS at v1 (lazy — files resolved, not yet read)
    val planned = VersionedTable.readAt(spark, path, 1L)
    VersionedTable.vacuum(path, keep = 1)
    // the race lost: the scan fails LOUDLY (missing files are never
    // silently dropped) ...
    val e = intercept[Exception] { planned.count() }
    // ... and post hoc the failure is attributable to retention, not
    // storage: the vacuum recorded its floor
    assert(VersionedTable.vacuumFloor(path).map(_._1) === Some(2L))
    val diag = VersionedTable.diagnoseVacuumRace(path, e)
    assert(diag.isDefined, s"undiagnosed: ${e.getMessage}")
    assert(diag.get.contains("retention") && diag.get.contains("floor=v2"),
      diag.get)
    // a genuine storage fault (unrelated exception) is NOT claimed
    assert(VersionedTable.diagnoseVacuumRace(path,
      new RuntimeException("boom")) === None)
    // a NEW read of the reclaimed version refuses at the manifest,
    // before any plan exists
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.readAt(spark, path, 1L)
    }
    assert(e2.getMessage.contains("vacuumed"), e2.getMessage)
  }

  test("scan planned at the retention floor completes across a vacuum (the contract's good leg)") {
    val path = tmpDir("vac_ok")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path) // v1
    VersionedTable.overwrite(Seq((2L, 20L)).toDF("k", "v"), path) // v2
    VersionedTable.append(Seq((3L, 30L)).toDF("k", "v"), path) // v3
    val planned = VersionedTable.readAt(spark, path, 2L)
    VersionedTable.vacuum(path, keep = 2) // floor = 2: v2 retained
    assert(planned.as[(Long, Long)].collect().toSet === Set((2L, 20L)))
    assert(VersionedTable.vacuumFloor(path).map(_._1) === Some(2L))
  }
}
