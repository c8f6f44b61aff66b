package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Round-15 ADVICE hazards, reproduced then proven fixed:
  *
  *  1. (medium) the catalog declared merge keys non-nullable without
  *     anything enforcing it — a NULL key written through the PATH
  *     API (or adopted with data) gave the optimizer a false
  *     non-null guarantee and could silently wrong-answer
  *     `WHERE k IS NULL` / null-aware joins. Now every engine write
  *     path proves the batch null-free (footer null counts) before
  *     commit, and key ADOPTION validates existing batches first.
  *  2. (low) a torn put-if-absent manifest from a PRE-MARKER release
  *     (entries, no terminator, no `#mode=` line) read as an accepted
  *     legacy rename manifest; a strict-tear conf now covers the
  *     upgrade window.
  *
  * (The other three — zombie delta files, fixed-offset key synthesis,
  * ALTER last-writer-wins — are specced in GraftRowLevelSpec,
  * the q311/q312/q313/q316 oracles, and ColumnMappingSpec.)
  */
class Round15AdviceFixSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft-test-catalog"

  test("a PATH-API append of NULL keys into a keyed catalog table refuses loudly before commit") {
    spark.sql("DROP TABLE IF EXISTS graft.nn_path")
    spark.sql("""CREATE TABLE graft.nn_path (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.nn_path VALUES (1, 10)")
    val path = s"$root/nn_path"
    val bad = Seq((Some(2L), 20L), (None, 30L))
      .toDF("k", "v").select(col("k").cast("long"), col("v"))
    val e = intercept[IllegalStateException] {
      VersionedTable.append(bad, path)
    }
    assert(e.getMessage.contains("NULL") && e.getMessage.contains("'k'"),
      e.getMessage)
    // nothing was published — the table still reads its old content,
    // and the catalog's non-null claim stays TRUE
    assert(VersionedTable.latestVersion(path) === Some(1L))
    assert(spark.table("graft.nn_path").count() === 1L)
    assert(spark.sql("SELECT * FROM graft.nn_path WHERE k IS NULL")
      .isEmpty)
    // upsert and overwrite take the same gate
    val e2 = intercept[IllegalStateException] {
      VersionedTable.upsert(bad, "k", path)
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
    val e3 = intercept[IllegalStateException] {
      VersionedTable.overwrite(bad, path)
    }
    assert(e3.getMessage.contains("NULL"), e3.getMessage)
    // a clean batch through the same paths still commits
    VersionedTable.append(Seq((2L, 20L)).toDF("k", "v"), path)
    assert(spark.table("graft.nn_path").count() === 2L)
    spark.sql("DROP TABLE IF EXISTS graft.nn_path")
  }

  test("declaring a key over a path-built table with NULL keys refuses at ADOPTION, not at read") {
    val name = "nn_adopt"
    val path = s"$root/$name"
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    // a key-LESS path build may hold NULLs legitimately
    VersionedTable.append(Seq((Some(1L), 10L), (None, 20L)).toDF("k", "v")
      .select(col("k").cast("long"), col("v")), path)
    // adopting it as a KEYED table must refuse: the claim would be
    // false for committed data
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$name SET TBLPROPERTIES('key'='k')")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
    // the meta write never happened — the table stays key-less
    assert(graft.catalog.GraftTableMeta.readLatest(path)
      .forall(!_.props.contains("key")))
    // after deleting the offending row content via overwrite, the
    // adoption succeeds
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), path)
    spark.sql(s"ALTER TABLE graft.$name SET TBLPROPERTIES('key'='k')")
    spark.sql(s"DROP TABLE IF EXISTS graft.$name")
  }

  test("strict-tear conf: a marker-less, terminator-less manifest refuses under the upgrade window") {
    val path = tmpDir("nn_tear")
    VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
    // hand-forge the PRE-UPGRADE torn put-if-absent manifest: entries
    // present, no terminator, no #mode= marker (the old release wrote
    // no marker — a torn create looks exactly like this)
    val p = new org.apache.hadoop.fs.Path(s"$path/_v2.manifest")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = {
      val in = f.open(new org.apache.hadoop.fs.Path(s"$path/_v1.manifest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filterNot(_.startsWith("#")).mkString("\n")
      finally in.close()
    }
    val out = f.create(p, true)
    try out.write(entries.getBytes("UTF-8")) finally out.close()
    // default: accepted as a legacy rename manifest (pre-terminator
    // builds committed exactly this shape — refusing them by default
    // would break every old table)
    assert(VersionedTable.readAt(spark, path, 2L).count() === 1L)
    // upgrade window: tables known to use put-if-absent opt into
    // strict tear detection and the same file refuses loudly
    spark.conf.set(VersionedTable.StrictTearConf, "true")
    try {
      val e = intercept[java.io.IOException] {
        VersionedTable.readAt(spark, path, 2L).count()
      }
      assert(e.getMessage.contains("torn"), e.getMessage)
    } finally spark.conf.unset(VersionedTable.StrictTearConf)
  }
}
