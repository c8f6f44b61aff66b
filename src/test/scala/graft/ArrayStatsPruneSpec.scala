package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** ARRAY-ELEMENT data skipping (round 19): `statscols` may name a
  * field of an array element struct (`m.element.bytes`) — the
  * manifest records the batch's envelope over ALL elements
  * (per-row array_min/array_max, min/max across rows), and an
  * `exists(m, x -> x.bytes >= k)` predicate prunes batch dirs from
  * it: exists needs SOME element in range, which is exactly the
  * envelope question. The file_manifest query shape — "experiments
  * with any file over N bytes" — confines to the batches that can
  * answer, before any footer opens. Two exists conjuncts on opposite
  * sides merge to independent envelope sides (each answerable by a
  * DIFFERENT element) — never an empty-interval over-prune.
  */
class ArrayStatsPruneSpec extends SparkTestBase {
  import spark.implicits._

  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  /** 4 batches; batch b's element bytes live in [b*1000, b*1000+990]
    * (two elements per row, disjoint envelopes per batch).
    */
  private def build(prefix: String): String = {
    val path = tmpDir(prefix)
    (0 until 4).foreach { b =>
      VersionedTable.append(
        (0 until 100).map { i =>
          (b * 100L + i,
            Seq((s"f$b", b * 1000L + i), (s"g$b", b * 1000L + i + 890L)))
        }.toDF("k", "raw")
          .selectExpr("k",
            "transform(raw, x -> named_struct('fmt', x._1, 'bytes', x._2)) AS m"),
        path, statsCols = Seq("m.element.bytes"))
    }
    path
  }

  test("exists() range predicates prune to the intersecting batches") {
    val path = build("vt_astats")
    val q = VersionedTable.readAtAuto(spark, path, 4)
      .filter(expr("exists(m, x -> x.bytes >= 2500)"))
    val dirs = scannedDirs(q)
    assert(dirs.size === 2, s"b3+b4 only (envelopes reach 2989/3989): $dirs")
    val expected = VersionedTable.readAt(spark, path, 4)
      .filter(expr("exists(m, x -> x.bytes >= 2500)"))
      .select("k").as[Long].collect().sorted
    assert(q.select("k").as[Long].collect().sorted === expected)
    // equality probe: one batch's envelope admits
    val eq = VersionedTable.readAtAuto(spark, path, 4)
      .filter(expr("exists(m, x -> x.bytes = 1500)"))
    assert(scannedDirs(eq).size === 1, scannedDirs(eq).toString)
    assert(eq.count() === VersionedTable.readAt(spark, path, 4)
      .filter(expr("exists(m, x -> x.bytes = 1500)")).count())
  }

  test("opposite-side exists conjuncts stay independent (no empty-interval over-prune)") {
    val path = tmpDir("vt_astats_op")
    // one batch holding elements 1 and 11 in the same row
    VersionedTable.append(
      Seq((1L, Seq(1L, 11L))).toDF("k", "raw")
        .selectExpr("k",
          "transform(raw, x -> named_struct('bytes', x)) AS m"),
      path, statsCols = Seq("m.element.bytes"))
    val q = VersionedTable.readAtAuto(spark, path, 1)
      .filter(expr(
        "exists(m, x -> x.bytes >= 10) AND exists(m, x -> x.bytes <= 2)"))
    assert(q.count() === 1L,
      "a batch answering each side with different elements must survive")
    // and a genuinely unanswerable requirement prunes
    val none = VersionedTable.readAtAuto(spark, path, 1)
      .filter(expr("exists(m, x -> x.bytes >= 100)"))
    assert(none.count() === 0L)
    assert(scannedDirs(none).isEmpty ||
      none.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty, "the impossible exists should prune the only batch")
  }

  test("NULL and empty arrays stay conservative; un-stats'd batches are kept") {
    val path = build("vt_astats_null")
    // a batch with an empty array and a NULL array, WITH stats
    // declared (its envelope records nothing for the column)
    VersionedTable.append(
      Seq((900L, Some(Seq.empty[Long])), (901L, None))
        .toDF("k", "raw")
        .selectExpr("k",
          "transform(raw, x -> named_struct('bytes', x)) AS m"),
      path, statsCols = Seq("m.element.bytes"))
    // a batch with a matching element but NO stats: always a candidate
    VersionedTable.append(
      Seq((1000L, Seq(9999L))).toDF("k", "raw")
        .selectExpr("k",
          "transform(raw, x -> named_struct('bytes', x)) AS m"),
      path)
    val q = VersionedTable.readAtAuto(spark, path, 6)
      .filter(expr("exists(m, x -> x.bytes >= 9000)"))
    assert(q.select("k").as[Long].collect().toSeq === Seq(1000L))
  }
}
