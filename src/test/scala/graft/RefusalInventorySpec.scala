package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Skew, VersionedTable}

/** The REFUSAL INVENTORY (round 19 — round-20 prep): the engine's
  * honesty model is that it never degrades silently — every
  * capability boundary is a LOUD refusal whose message names the
  * contract being protected and, where one exists, the workaround.
  * This spec walks each documented refusal in one place so "refuses"
  * can be diffed against "documented" mechanically; the matching
  * table lives in PLANS.md (round 19). Heavier contracts that need
  * real streams/stores keep their full behavioral coverage in their
  * owning specs (cited per case) — here each fires once, cheaply,
  * and its MESSAGE is the assertion.
  *
  * Refusals that Spark's own analyzer front-runs (map-entry DDL,
  * SET NOT NULL, narrowing ALTER TYPE on V2 tables) are still
  * asserted loud at the SQL surface; the catalog's defense-in-depth
  * twin backs the non-SQL TableCatalog surface.
  */
class RefusalInventorySpec extends SparkTestBase {
  import spark.implicits._

  private def chain(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }
  private def refusal(body: => Any): String =
    chain(intercept[Exception] { body })
  private def drop(t: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS graft.$t")

  test("nested-DDL boundaries: map entries, bare array elements, last field, constrained paths") {
    drop("ri_nested")
    spark.sql("""CREATE TABLE graft.ri_nested (
      k BIGINT, meta STRUCT<only: BIGINT>,
      m ARRAY<STRUCT<x: BIGINT, y: BIGINT>>, mp MAP<STRING, BIGINT>)
      TBLPROPERTIES('key'='k')""")
    // map entries are values, not schema positions (ArrayNestedDdlSpec)
    val m1 = refusal(
      spark.sql("ALTER TABLE graft.ri_nested ADD COLUMNS (mp.value.z BIGINT)"))
    assert(m1.contains("not a struct") || m1.contains("map"), m1)
    // an array element is a position, not a field — the path must
    // continue INTO the element struct
    val m2 = refusal(
      spark.sql("ALTER TABLE graft.ri_nested RENAME COLUMN m.element TO e2"))
    assert(m2.contains("array element") || m2.contains("not a struct")
      || m2.contains("does not exist"), m2)
    // the last field of a struct cannot be dropped — workaround named
    val m3 = refusal(
      spark.sql("ALTER TABLE graft.ri_nested DROP COLUMN meta.only"))
    assert(m3.contains("drop the column itself"), m3)
    // a CHECK-constrained nested path cannot be dropped from under
    // its constraint (Round18NestedCheckSpec)
    spark.sql("""ALTER TABLE graft.ri_nested
      ADD COLUMNS (m2 STRUCT<sz: BIGINT>)""")
    spark.sql("""ALTER TABLE graft.ri_nested SET TBLPROPERTIES(
      'check.szpos' = 'm2.sz IS NULL OR m2.sz >= 0')""")
    val m4 = refusal(
      spark.sql("ALTER TABLE graft.ri_nested DROP COLUMN m2.sz"))
    assert(m4.contains("CHECK constraint"), m4)
    drop("ri_nested")
  }

  test("type and nullability boundaries: lossy/narrowing changes, inner NOT NULL claims") {
    drop("ri_types")
    spark.sql("""CREATE TABLE graft.ri_types (k BIGINT, s STRING, n BIGINT)
      TBLPROPERTIES('key'='k')""")
    // lossy type change (the q319 lossless matrix names its rows)
    val m1 = refusal(
      spark.sql("ALTER TABLE graft.ri_types ALTER COLUMN s TYPE BIGINT"))
    assert(m1.contains("lossless") || m1.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      m1)
    // narrowing
    val m2 = refusal(
      spark.sql("ALTER TABLE graft.ri_types ALTER COLUMN n TYPE INT"))
    assert(m2.contains("lossless") || m2.contains("does not contain") ||
      m2.contains("NOT_SUPPORTED_CHANGE_COLUMN"), m2)
    // an added column must be nullable — old rows NULL-fill
    val m3 = refusal(
      spark.sql("ALTER TABLE graft.ri_types ADD COLUMNS (c BIGINT NOT NULL)"))
    assert(m3.contains("nullable") && m3.contains("NULL-fill"), m3)
    // an INNER non-null claim is enforced by no write path — refused
    // at CREATE rather than trusted by the optimizer (ADVICE r18)
    val m4 = refusal(spark.sql(
      """CREATE TABLE graft.ri_inner (k BIGINT,
         meta STRUCT<x: BIGINT NOT NULL>) TBLPROPERTIES('key'='k')"""))
    assert(m4.contains("top-level columns only"), m4)
    // SET NOT NULL adoption goes through a CHECK constraint — the
    // direct ALTER refuses (Spark's V2 analyzer; the catalog
    // catch-all names the CHECK route for non-SQL callers)
    val m5 = refusal(
      spark.sql("ALTER TABLE graft.ri_types ALTER COLUMN n SET NOT NULL"))
    assert(m5.toLowerCase.contains("not null") ||
      m5.toLowerCase.contains("nullable"), m5)
    drop("ri_types")
  }

  test("history boundaries: bare VACUUM, foreign maintenance targets, time travel past retention") {
    drop("ri_hist")
    spark.sql("CREATE TABLE graft.ri_hist (k BIGINT) TBLPROPERTIES('key'='k')")
    spark.sql("INSERT INTO graft.ri_hist VALUES (1)")
    // history is never destroyed by default
    val m1 = refusal(spark.sql("VACUUM graft.ri_hist"))
    assert(m1.contains("explicit retention") &&
      m1.contains("never destroyed by default"), m1)
    // maintenance verbs over a non-graft identifier name the fix
    val m2 = refusal(spark.sql("OPTIMIZE some_other_table"))
    assert(m2.contains("not a graft table") &&
      m2.contains("GraftSql.register"), m2)
    // a timestamp before the first commit (or vacuumed past the
    // floor) is not addressable
    val m3 = refusal(spark.sql(
      "SELECT * FROM graft.ri_hist TIMESTAMP AS OF '1990-01-01'").collect())
    assert(m3.contains("no retained version") &&
      m3.contains("retention floor"), m3)
    drop("ri_hist")
  }

  test("DML boundaries: keyless row-level ops, key collisions, stale writers, partition clauses") {
    // row-level DML needs a declared row identity (a filter-only
    // DELETE legitimately succeeds batch-wise without one — whole
    // matching rows, no rewrite — so UPDATE is the refusing surface)
    drop("ri_nokey")
    spark.sql("CREATE TABLE graft.ri_nokey (k BIGINT)")
    spark.sql("INSERT INTO graft.ri_nokey VALUES (1)")
    val m1 = refusal(
      spark.sql("UPDATE graft.ri_nokey SET k = 2 WHERE k = 1"))
    assert(m1.contains("TBLPROPERTIES('key'=") &&
      m1.contains("ALTER TABLE SET"), m1)
    drop("ri_nokey")
    // a key-moving UPDATE may not collapse two rows onto one key
    drop("ri_collide")
    spark.sql("CREATE TABLE graft.ri_collide (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql("INSERT INTO graft.ri_collide VALUES (1, 10), (2, 20)")
    val m2 = refusal(
      spark.sql("UPDATE graft.ri_collide SET k = 9 WHERE k IN (1, 2)"))
    assert(m2.contains("two or more rows") && m2.contains("DELETE + INSERT"),
      m2)
    drop("ri_collide")
    // a stale writer naming a DROPPED column cannot resurrect data
    drop("ri_stale")
    spark.sql("CREATE TABLE graft.ri_stale (k BIGINT, junk BIGINT) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql("INSERT INTO graft.ri_stale VALUES (1, 77)")
    spark.sql("ALTER TABLE graft.ri_stale DROP COLUMN junk")
    val path = "/tmp/graft-test-catalog/ri_stale"
    val m3 = refusal(VersionedTable.upsertWithRetry(
      Seq((2L, 5L)).toDF("k", "junk"), "k", path))
    assert(m3.contains("DROPPED") && m3.contains("resurrect"), m3)
    drop("ri_stale")
    // batch layout belongs to the table, not the DDL
    val m4 = refusal(spark.sql(
      """CREATE TABLE graft.ri_part (k BIGINT) PARTITIONED BY (k)
         TBLPROPERTIES('key'='k')"""))
    assert(m4.contains("OPTIMIZE") && m4.contains("ZORDER"), m4)
  }

  test("scale-contract boundaries: stats-driven join sides, residual rebalance, widen+CDC streams") {
    // the skew planner's remedies (salt, broadcast) are one-sided
    val df = Seq((1L, 1L)).toDF("k", "v")
    val m1 = refusal(Skew.statsDrivenJoin(df, df, "k",
      minShareBp = 100L, saltFactor = 4, broadcastRowLimit = 1000L,
      joinType = "right"))
    assert(m1.contains("inner/left"), m1)
    // residual-coded IVFADC stores quantize against the centroids a
    // rebalance would replace (IvfIndexSpec owns the recall legs)
    val dim = 64
    val emb = Seq.tabulate(24) { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 31 + j) % 17).toFloat))
    }.toDF("vec_id", "embedding")
    val centroids = Seq.tabulate(4) { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 13 + j) % 11).toFloat))
    }.toDF("cid", "cv")
    val root = tmpDir("ri_residual")
    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "cid", "cv", m = 4, kCodes = 16, subDim = 16, iters = 1,
      root, residual = true)
    val m2 = refusal(Similarity.ivfPqIndexRebalance(spark,
      kClusters = 4, kmIters = 1, m = 4, kCodes = 16, subDim = 16, root))
    assert(m2.contains("residual") && m2.contains("rebuild"), m2)
    // widen + readChangeFeed COMPOSE since round 19 (the per-commit
    // feed walk reads under the widened schema — StreamingWidenSpec
    // owns the behavior); the former construction-time refusal is
    // lifted, so constructing the composed stream must NOT throw
    val vt = tmpDir("ri_widen_cdc")
    VersionedTable.append(Seq((1L, 2L)).toDF("k", "v"), vt)
    spark.readStream.format("graft")
      .option("widen", "true").option("readChangeFeed", "true").load(vt)
    ()
  }

  test("stream boundary: a shape-changing DDL mid-stream names the RESTART contract") {
    import org.apache.spark.sql.streaming.Trigger
    drop("ri_stream")
    spark.sql("CREATE TABLE graft.ri_stream (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql("INSERT INTO graft.ri_stream VALUES (1, 10)")
    spark.sql("INSERT INTO graft.ri_stream VALUES (2, 20)")
    val path = "/tmp/graft-test-catalog/ri_stream"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.option("checkpointLocation", tmpDir("ri_stream_ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        if (fired.compareAndSet(false, true)) {
          // the DROP lands while the query is between batches
          spark.sql("ALTER TABLE graft.ri_stream DROP COLUMN v")
          spark.sql("INSERT INTO graft.ri_stream VALUES (3)")
        }
        ()
      }.start()
    val m = chain(intercept[Exception] { q.awaitTermination(120000) })
    assert(m.contains("mid-stream") && m.contains("RESTART"), m)
    drop("ri_stream")
  }
}
