package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** NESTED `bloomcols` (round 19): point-lookup skipping on struct
  * FIELDS — the q337 stats/bloom asymmetry closed. `bloomcols` may
  * name a dotted struct path (`meta.fmt`); the sidecar builder hashes
  * the extracted inner value under the dotted PHYSICAL key, and the
  * pruning rule's point probe matches a `GetStructField` chain to the
  * same key — so a `WHERE meta.fmt = 'x'` on a hash/arrival
  * layout (where every batch's min/max envelope spans the domain and
  * range stats are blind) opens only admitting batches. Composition
  * with nested RENAME follows statscols: sidecars key on the stable
  * physical inner name, and NestedRenamePushdown re-binds the logical
  * predicate before the rule matches. Superset contract throughout —
  * no sidecar (or NULL parents, or an unresolvable name) means no
  * claim, never a false negative.
  */
class NestedBloomSpec extends SparkTestBase {
  import spark.implicits._

  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  /** 4 appends; keys striped MOD 4 so every batch's [k-min, k-max]
    * spans the domain (zone maps blind), and each batch's element
    * format is unique to it — only the sidecar can prune.
    */
  private def buildStriped(prefix: String): String = {
    val path = tmpDir(prefix)
    (0 until 4).foreach { stripe =>
      VersionedTable.append(
        (0 until 400).filter(_ % 4 == stripe)
          .map(k => (k.toLong, s"f$stripe", k.toLong * 10))
          .toDF("k", "fmt", "bytes")
          .selectExpr("k", "named_struct('fmt', fmt, 'bytes', bytes) AS meta"),
        path, bloomCols = Seq("meta.fmt"))
    }
    path
  }

  test("a point probe on a struct field opens only admitting batches") {
    val path = buildStriped("vt_nbloom_eq")
    val q = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"meta.fmt" === "f2")
    val dirs = scannedDirs(q)
    assert(dirs.size === 1, s"meta.fmt = 'f2' is one stripe: $dirs")
    val expected = VersionedTable.readAt(spark, path, 4)
      .filter($"meta.fmt" === "f2").selectExpr("k", "meta.bytes")
      .as[(Long, Long)].collect().sorted
    assert(q.selectExpr("k", "meta.bytes")
      .as[(Long, Long)].collect().sorted === expected)
    assert(expected.length === 100)
  }

  test("an IN probe keeps the union of admitting batches") {
    val path = buildStriped("vt_nbloom_in")
    val q = VersionedTable.readAtAuto(spark, path, 4)
      .filter($"meta.fmt".isin("f0", "f3"))
    assert(scannedDirs(q).size === 2, s"two stripes: ${scannedDirs(q)}")
    assert(q.count() === 200L)
  }

  test("NULL parents and sidecar-less batches stay conservative") {
    val path = buildStriped("vt_nbloom_null")
    // a batch of NULL structs, indexed: hashes the null extraction
    VersionedTable.append(
      Seq(900L).toDF("k")
        .selectExpr("k",
          "CAST(NULL AS STRUCT<fmt: STRING, bytes: BIGINT>) AS meta"),
      path, bloomCols = Seq("meta.fmt"))
    // a batch WITHOUT a sidecar: always a candidate (no index = no claim)
    VersionedTable.append(
      Seq((1000L, "fX", 1L)).toDF("k", "fmt", "bytes")
        .selectExpr("k", "named_struct('fmt', fmt, 'bytes', bytes) AS meta"),
      path)
    val q = VersionedTable.readAtAuto(spark, path, 6)
      .filter($"meta.fmt" === "fX")
    assert(q.selectExpr("k").as[Long].collect().toSeq === Seq(1000L))
  }

  test("nested bloom survives a nested RENAME through the catalog") {
    spark.sql("DROP TABLE IF EXISTS graft.nbl_renamed")
    spark.sql("""CREATE TABLE graft.nbl_renamed (
      k BIGINT, meta STRUCT<fmt: STRING, sz: BIGINT>)
      TBLPROPERTIES('key'='k', 'bloomcols'='meta.fmt')""")
    (0 until 4).foreach { b =>
      spark.sql(s"""INSERT INTO graft.nbl_renamed
        SELECT id, named_struct('fmt', 'f$b', 'sz', id * 10)
        FROM range(${b * 100}, ${b * 100 + 100})""")
    }
    spark.sql("ALTER TABLE graft.nbl_renamed RENAME COLUMN meta.fmt TO kind")
    // the user's predicate speaks the LOGICAL name; sidecars were
    // keyed under the stable physical inner name — the rename rewrite
    // re-binds the extraction before the point probe matches
    val q = spark.table("graft.nbl_renamed").filter($"meta.kind" === "f1")
    val dirs = scannedDirs(q)
    assert(dirs.size === 1, s"one of 4 batch dirs: $dirs")
    assert(q.count() === 100L)
    // bloomcols property followed the rename for future writes
    val props = spark.sql("SHOW TBLPROPERTIES graft.nbl_renamed")
      .as[(String, String)].collect().toMap
    assert(props("bloomcols") === "meta.kind",
      s"bloomcols after rename: ${props("bloomcols")}")
    spark.sql("DROP TABLE graft.nbl_renamed")
  }
}
