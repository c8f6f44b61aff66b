package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.GraftSql

/** Round-13 ADVICE closures, each hazard reproduced then closed:
  *
  *  1. put-if-absent torn manifest (create visible before close)
  *     detected via the terminator line — repairable, never wedged;
  *     rename-mode legacy manifests (no terminator) still read;
  *  2. SQL INSERT conforms positional values to the table's CURRENT
  *     types (no mixed physical parquet types); lossy coercions
  *     refuse loudly;
  *  3. DML interception matches EXACT multipart identifiers only —
  *     an unrelated `db.t` with a colliding bare name passes through
  *     to Spark untouched;
  *  4. Bloom point-lookups try_cast probe keys (ANSI-safe): an
  *     out-of-range probe filters instead of failing the lookup;
  *  5. consumeChanges sweeps crash-leftover `_version.<N>.tmp`
  *     checkpoint markers.
  */
class Round13AdviceFixSpec extends SparkTestBase {
  import spark.implicits._

  private def hfs(dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("put-if-absent: a torn manifest is detected, repairable, and never wedges the version") {
    val path = tmpDir("r13_torn")
    spark.conf.set(VersionedTable.CommitModeConf, "put-if-absent")
    try {
      VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
      val (f, p) = hfs(path)
      // crash between create and close: the manifest exists, empty
      f.create(new Path(p, "_v2.manifest"), false).close()
      assert(VersionedTable.latestVersion(path).contains(2L))
      val e = intercept[java.io.IOException] {
        VersionedTable.readAt(spark, path, 2L)
      }
      assert(e.getMessage.contains("torn"), e.getMessage)
      assert(e.getMessage.contains("_v2"), "repair path must name the file")
      // a PREFIX of real content without the terminator is torn too.
      // Round-14 refinement: tear is judged by the manifest's OWN
      // mode marker (put-if-absent commits lead with it), never the
      // reader's session conf — so the simulated torn pia commit
      // carries the marker a real one writes first
      val out = f.create(new Path(p, "_v3.manifest"), false)
      out.write("#mode=put-if-absent\nb1_somebatch\n".getBytes("UTF-8"))
      out.close()
      val e2 = intercept[java.io.IOException] {
        VersionedTable.readAt(spark, path, 3L)
      }
      assert(e2.getMessage.contains("torn"))
      // repair: delete the torn manifests; commits proceed normally
      f.delete(new Path(p, "_v2.manifest"), false)
      f.delete(new Path(p, "_v3.manifest"), false)
      VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), path)
      assert(VersionedTable.readLatest(spark, path).count() === 2L)
    } finally spark.conf.unset(VersionedTable.CommitModeConf)
  }

  test("rename mode: pre-terminator (legacy) manifests still read; empty manifests refuse in any mode") {
    val path = tmpDir("r13_legacy")
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val (f, p) = hfs(path)
    val m = new Path(p, "_v1.manifest")
    // strip the terminator, simulating a manifest committed by a
    // pre-round-13 build
    val in = f.open(m)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val legacy = text.split("\n").filterNot(_.trim == "#eof").mkString("\n")
    f.delete(m, false)
    val out = f.create(m, true)
    out.write(legacy.getBytes("UTF-8")); out.close()
    assert(VersionedTable.readAt(spark, path, 1L).count() === 2L,
      "rename-mode reads must accept legacy manifests")
    // an EMPTY manifest is torn in any mode
    val out2 = f.create(m, true); out2.close()
    val e = intercept[java.io.IOException] {
      VersionedTable.readAt(spark, path, 1L)
    }
    assert(e.getMessage.contains("torn"))
  }

  test("SQL INSERT conforms positional values to the table's current types; lossy refuses") {
    val path = tmpDir("r13_insert_cast")
    GraftSql.register("t13_ins", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L)).toDF("k", "v"), path)
      // VALUES (2, 20) are INTs: without the conformance cast this
      // committed an int-typed batch and later reads inferred a
      // file-pick-order-dependent schema
      spark.sql("INSERT INTO t13_ins VALUES (2, 20)")
      val (f, p) = hfs(path)
      val dirs = f.listStatus(new Path(p, "data")).map(_.getPath)
      dirs.foreach { d =>
        val sch = spark.read.parquet(d.toString).schema
        assert(sch("k").dataType === org.apache.spark.sql.types.LongType,
          s"batch $d must be long-typed")
        assert(sch("v").dataType === org.apache.spark.sql.types.LongType)
      }
      assert(VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().sorted === Array((1L, 10L), (2L, 20L)))
      // lossy: a BIGINT literal into an INT column refuses loudly
      val intPath = tmpDir("r13_insert_int")
      GraftSql.register("t13_insi", intPath, "k")
      try {
        VersionedTable.append(Seq((1, 10)).toDF("k", "v"), intPath)
        val e = intercept[Exception] {
          spark.sql("INSERT INTO t13_insi VALUES (5000000000, 1)")
        }
        assert(e.getMessage.contains("not lossless"), e.getMessage)
      } finally GraftSql.unregister("t13_insi")
    } finally GraftSql.unregister("t13_ins")
  }

  test("DML interception is exact-multipart only: a colliding bare name passes through") {
    val path = tmpDir("r13_collide")
    GraftSql.register("t13_col", path, "k")
    try {
      VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
      val e = intercept[Exception] {
        spark.sql("DELETE FROM somedb.t13_col WHERE k = 1")
      }
      assert(!e.getMessage.contains("graft SQL DML"),
        s"must pass through to Spark's resolution, got: ${e.getMessage}")
      assert(VersionedTable.readLatest(spark, path).count() === 1L,
        "the graft table must be untouched by DML on the unrelated name")
    } finally GraftSql.unregister("t13_col")
  }

  test("bloom lookup try_casts probe keys: an out-of-range probe filters, never throws") {
    val path = tmpDir("r13_bloom_ansi")
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v") // INT key
    VersionedTable.append(df, path, bloomCols = Seq("k"))
    // long probe 2^40 overflows int: ANSI cast() threw here before
    val got = VersionedTable.lookupKeys(spark, path, 1L, "k",
      Seq(2L, 1L << 40))
      .select(col("k").cast("long"), col("v")).as[(Long, String)].collect()
    assert(got.toSeq === Seq((2L, "b")))
  }

  test("consumeChanges sweeps crash-leftover _version.<N>.tmp markers") {
    val path = tmpDir("r13_ckpt")
    val ckpt = tmpDir("r13_ckpt_dir")
    VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), path)
    val (f, cp) = hfs(ckpt)
    // a previous advance that died between create and rename
    val out = f.create(new Path(cp, "_version.1.tmp"), true)
    out.write("1".getBytes("UTF-8")); out.close()
    val delivered = VersionedTable.consumeChanges(spark, path, ckpt) {
      (df, _, _) => assert(df.count() === 2L)
    }
    assert(delivered.contains((0L, 2L)))
    val names = f.listStatus(cp).map(_.getPath.getName).toSet
    assert(names.contains("_version.2"))
    assert(!names.exists(_.endsWith(".tmp")),
      s"stale tmp markers must be swept, got $names")
  }
}
