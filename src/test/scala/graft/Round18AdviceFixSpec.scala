package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.GraftSql

/** Round-18 ADVICE hazards, each spec'd at the exact failure shape the
  * review named:
  *
  *  1. a key-moving UPDATE with a NON-DETERMINISTIC predicate must
  *     delete exactly the keys it re-inserts (the matched frame is
  *     cached for the attempt — without the pin, rand() re-evaluates
  *     per job and the delete set diverges from the insert set,
  *     silently losing or duplicating rows);
  *  2. a key-moving UPDATE matching ZERO rows publishes NOTHING — no
  *     empty tombstone batch, no spurious version bump, no empty CDC
  *     commit;
  *  3. RENAME COLUMN refuses loudly when a stored CHECK constraint
  *     does not parse (silently skipping left the constraint speaking
  *     the old name — failing every later write, or re-binding to a
  *     re-added column);
  *  4. a column-list INSERT may name a column added by ALTER TABLE
  *     ADD COLUMNS before any batch carries it — the alignment target
  *     is the declared metadata schema completed over content, not
  *     the data-derived schema alone.
  */
class Round18AdviceFixSpec extends SparkTestBase {
  import spark.implicits._

  private def dropT(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  test("key-moving UPDATE with a non-deterministic WHERE never loses or duplicates rows") {
    val path = tmpDir("adv18_rand_move")
    GraftSql.register("t_rmove", path, "k")
    try {
      VersionedTable.append(
        spark.range(100).select($"id".as("k"), $"id".as("v")), path)
      // rand() in the WHERE: without the cached matched frame the
      // delete-set scan and the re-insert scan would each draw their
      // own sample — rows sampled by one but not the other are lost
      // (tombstoned, not re-inserted) or duplicated (re-keyed copy
      // lands while the original survives)
      spark.sql("UPDATE t_rmove SET k = k + 1000 WHERE rand(7) < 0.5")
      val rows = VersionedTable.readLatest(spark, path)
        .select("k", "v").as[(Long, Long)].collect()
      assert(rows.length === 100, s"row count drifted: ${rows.length}")
      assert(rows.map(_._2).distinct.length === 100,
        "a row was lost and another duplicated")
      // every surviving row is self-consistent: either unmoved or
      // moved exactly once
      rows.foreach { case (k, v) =>
        assert(k == v || k == v + 1000, s"inconsistent row ($k, $v)")
      }
    } finally GraftSql.unregister("t_rmove")
  }

  test("zero-match key-moving UPDATE publishes no version") {
    val path = tmpDir("adv18_noop_move")
    GraftSql.register("t_nmove", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), path)
      val before = VersionedTable.latestVersion(path).get
      val v = spark.sql("UPDATE t_nmove SET k = k + 100 WHERE v > 999")
        .as[Long].head()
      assert(v === before, "the command must report the unchanged version")
      assert(VersionedTable.latestVersion(path) === Some(before),
        "a zero-match key-moving UPDATE committed a spurious version")
      assert(VersionedTable.readLatest(spark, path).count() === 2L)
    } finally GraftSql.unregister("t_nmove")
  }

  test("RENAME COLUMN refuses loudly over an unparsable CHECK constraint") {
    dropT("adv18_badcheck")
    spark.sql("""CREATE TABLE graft.adv18_badcheck (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.adv18_badcheck VALUES (1, 10)")
    val path = "/tmp/graft-test-catalog/adv18_badcheck"
    // inject an unparsable stored constraint (CREATE/ALTER validate
    // parsing, so only corruption or a version skew produces one)
    val m = graft.catalog.GraftTableMeta.readLatest(path).get
    graft.catalog.GraftTableMeta.writeGen(path, m.copy(gen = m.gen + 1,
      props = m.props + ("check.broken" -> "v > (unbalanced")))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.adv18_badcheck RENAME COLUMN v TO w")
    }
    assert(e.getMessage.contains("does not parse"), e.getMessage)
    // the rename must NOT have landed half-way: v is still v
    assert(spark.table("graft.adv18_badcheck").columns.contains("v"))
  }

  test("column-list INSERT names an ALTER-added column before its first batch") {
    dropT("adv18_addcol")
    spark.sql("""CREATE TABLE graft.adv18_addcol (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.adv18_addcol VALUES (1, 10)")
    spark.sql("ALTER TABLE graft.adv18_addcol ADD COLUMNS (w BIGINT)")
    val path = "/tmp/graft-test-catalog/adv18_addcol"
    GraftSql.register("t_addcol", path, "k")
    try {
      // w exists in NO committed batch — the declared metadata schema
      // must make it nameable (previously: "w does not exist")
      spark.sql("INSERT INTO t_addcol (k, w) VALUES (2, 200)")
      val got = spark.table("graft.adv18_addcol")
        .orderBy("k").select("k", "v", "w")
        .as[(Long, Option[Long], Option[Long])].collect()
      assert(got === Array((1L, Some(10L), None), (2L, None, Some(200L))))
      // unknown names still refuse loudly
      val e = intercept[Exception] {
        spark.sql("INSERT INTO t_addcol (k, nope) VALUES (3, 3)")
      }
      assert(e.getMessage.contains("do not exist"), e.getMessage)
    } finally GraftSql.unregister("t_addcol")
  }
}
