package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.sql.{GraftMergeIntoCommand, GraftSql}

/** Round-14 ADVICE closures, each hazard reproduced then closed:
  *
  *  1. (high) conditional-MERGE serializability: the commit is pinned
  *     to the statement's OWN snapshot read, so a commit interleaving
  *     anywhere inside the read-modify-write window — including
  *     between the command's snapshot read and upsertWithDeletes'
  *     former internal re-read — conflicts and recomputes instead of
  *     being silently absorbed with stale clause evaluations;
  *  2. (medium) torn-manifest detection keys off the manifest's OWN
  *     mode marker, never the reader session's conf: a put-if-absent
  *     session no longer refuses legacy rename-committed manifests
  *     (whose "repair" advice would have destroyed committed data),
  *     while a genuinely torn put-if-absent manifest is detected
  *     under ANY session mode;
  *  3. (medium) INSERT ... BY NAME validates the column set: unknown
  *     columns refuse loudly, missing columns null-fill typed so the
  *     committed batch always carries the full table schema (never a
  *     narrower parquet file re-creating pick-order-dependent reads);
  *  4. (low) the session builder's catalog root defaults under the
  *     warehouse-dir convention, not world-shared /tmp;
  *  5. (low) OPTIMIZE/VACUUM over a non-graft identifier DELEGATE to
  *     the downstream parser (a co-installed engine receives its own
  *     verbs); the loud refusal fires only when nobody parses it.
  */
class Round14AdviceFixSpec extends SparkTestBase {
  import spark.implicits._

  private def hfs(dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("conditional MERGE: a commit interleaving after the snapshot read conflicts and recomputes (never absorbed)") {
    val path = tmpDir("r14_merge_ser")
    GraftSql.register("r14_ser", path, "k")
    try {
      VersionedTable.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), path)
      Seq((1L, 5L), (3L, 7L)).toDF("k", "v")
        .createOrReplaceTempView("r14_ser_src")
      // interleave INSIDE the window the fix closes: right after the
      // command's snapshot read, BEFORE its read-modify-write commits.
      // The competing commit bumps k=1 to v=100, so the conditional
      // clause (v < 50 → update) must re-evaluate against it: the
      // serial order "them, then us" gives k=1 → deleted (100+5? no:
      // 100 >= 50 → DELETE clause), not 15.
      var injected = false
      GraftMergeIntoCommand.testAfterSnapshot = Some { _ =>
        if (!injected) {
          injected = true
          VersionedTable.upsert(Seq((1L, 100L)).toDF("k", "v"), "k", path)
        }
      }
      try {
        spark.sql("""
          MERGE INTO r14_ser AS t USING r14_ser_src AS s ON t.k = s.k
          WHEN MATCHED AND t.v < 50 THEN UPDATE SET v = t.v + s.v
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED THEN INSERT *""")
      } finally GraftMergeIntoCommand.testAfterSnapshot = None
      assert(injected, "the interleave must actually have fired")
      val rows = VersionedTable.readLatest(spark, path)
        .as[(Long, Long)].collect().toMap
      // serial order them→us: k=1 at 100 → matched, v>=50 → DELETE;
      // k=2 not in the source → untouched; k=3 unmatched → inserted
      assert(!rows.contains(1L),
        s"k=1 must be DELETEd under the post-interleave view, got $rows")
      assert(rows(2L) === 20L)
      assert(rows(3L) === 7L)
    } finally GraftSql.unregister("r14_ser")
  }

  test("upsertWithDeletes pinned to the caller's snapshot: an interleaved commit throws instead of absorbing") {
    val path = tmpDir("r14_uwd_pin")
    VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), path)
    val snapshot = VersionedTable.latestVersion(path).get
    // the pre-fix hazard: a commit lands AFTER the caller's snapshot
    // read but BEFORE upsertWithDeletes' internal latestVersion
    // re-read — formerly absorbed silently, committing stale clause
    // results at newLatest+1
    VersionedTable.append(Seq((9L, "z")).toDF("k", "v"), path)
    val e = intercept[java.io.IOException] {
      VersionedTable.upsertWithDeletes(
        Some(Seq((1L, "STALE")).toDF("k", "v")), None, "k", path,
        expectedSnapshot = Some(snapshot))
    }
    assert(e.getMessage.contains("already committed"))
    // nothing was published by the refused attempt
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, String)].collect().sorted
      === Array((1L, "a"), (9L, "z")))
  }

  test("torn detection follows the manifest's mode marker, not the reader's session conf") {
    val path = tmpDir("r14_torn_marker")
    // a legacy rename-committed manifest (no marker, no terminator)
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val (f, p) = hfs(path)
    val m = new Path(p, "_v1.manifest")
    val in = f.open(m)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val legacy = text.split("\n")
      .filterNot(l => l.trim == "#eof" || l.trim.startsWith("#mode="))
      .mkString("\n")
    val out = f.create(m, true)
    out.write(legacy.getBytes("UTF-8")); out.close()
    // pre-fix: a put-if-absent READER refused this fully-committed
    // manifest as torn and advised deleting it — data destruction
    spark.conf.set(VersionedTable.CommitModeConf, "put-if-absent")
    try {
      assert(VersionedTable.readAt(spark, path, 1L).count() === 2L,
        "a legacy manifest must read under ANY session mode")
    } finally spark.conf.unset(VersionedTable.CommitModeConf)
    // and the converse: a marker-carrying manifest without the
    // terminator is torn even for a RENAME-mode reader
    val torn = new Path(p, "_v2.manifest")
    val out2 = f.create(torn, true)
    out2.write("#mode=put-if-absent\nb2_partial\n".getBytes("UTF-8"))
    out2.close()
    val e = intercept[java.io.IOException] {
      VersionedTable.readAt(spark, path, 2L)
    }
    assert(e.getMessage.contains("torn"))
    // a truncated marker line (comments-only prefix) is torn too
    val out3 = f.create(torn, true)
    out3.write("#mode=put-if".getBytes("UTF-8")); out3.close()
    val e2 = intercept[java.io.IOException] {
      VersionedTable.readAt(spark, path, 2L)
    }
    assert(e2.getMessage.contains("torn"))
  }

  test("INSERT BY NAME: unknown columns refuse; missing columns null-fill to the full table schema") {
    val path = tmpDir("r14_byname")
    GraftSql.register("r14_byname", path, "k")
    try {
      VersionedTable.append(
        Seq((1L, "a", 10L)).toDF("k", "v", "w"), path)
      // unknown column: loud refusal (formerly landed silently)
      val e = intercept[Exception] {
        spark.sql(
          "INSERT INTO r14_byname BY NAME SELECT 2L AS k, 'zz' AS nope")
      }
      assert(e.getMessage.contains("nope"), e.getMessage)
      // missing column: typed null-fill — the committed batch carries
      // the FULL table schema (formerly a narrower parquet file)
      spark.sql("INSERT INTO r14_byname BY NAME SELECT 'b' AS v, 2L AS k")
      val (f, p) = hfs(path)
      val dirs = f.listStatus(new Path(p, "data")).map(_.getPath)
      dirs.foreach { d =>
        assert(spark.read.parquet(d.toString).schema.fieldNames.sorted
          === Array("k", "v", "w"),
          s"batch $d must carry the full table schema")
      }
      val rows = VersionedTable.readLatest(spark, path)
        .as[(Long, String, Option[Long])].collect().sortBy(_._1)
      assert(rows === Array((1L, "a", Some(10L)), (2L, "b", None)))
    } finally GraftSql.unregister("r14_byname")
  }

  test("the default catalog root lives under the warehouse convention, not shared /tmp") {
    val root = GraftSession.defaultCatalogRoot
    assert(new java.io.File(root).isAbsolute)
    assert(root.replace('\\', '/').endsWith("spark-warehouse/graft_catalog"))
    assert(!root.startsWith("/tmp/"),
      "a world-shared /tmp default collides across users and test runs")
  }

  test("OPTIMIZE/VACUUM over non-graft names delegate to the downstream parser; refusal only when nobody parses") {
    // a co-installed engine below us parses its own OPTIMIZE: the
    // screen must return None and the delegate's plan must surface
    val marker = org.apache.spark.sql.catalyst.plans.logical.LocalRelation(Nil)
    val real = spark.sessionState.sqlParser
    val fake = new ParserInterface {
      override def parsePlan(t: String) = marker
      override def parseExpression(t: String) = real.parseExpression(t)
      override def parseTableIdentifier(t: String) = real.parseTableIdentifier(t)
      override def parseFunctionIdentifier(t: String) = real.parseFunctionIdentifier(t)
      override def parseMultipartIdentifier(t: String) = real.parseMultipartIdentifier(t)
      override def parseQuery(t: String) = real.parseQuery(t)
      override def parseRoutineParam(t: String) = real.parseRoutineParam(t)
      override def parseTableSchema(t: String) = real.parseTableSchema(t)
      override def parseDataType(t: String) = real.parseDataType(t)
    }
    val chained = new graft.sql.GraftDmlParser(fake)
    assert(chained.parsePlan("OPTIMIZE somebody_elses_table") eq marker,
      "a downstream parser that accepts the verb must receive it")
    assert(chained.parsePlan("VACUUM other.t RETAIN 5 VERSIONS") eq marker)
    // bare Spark below us: nobody parses it — the helpful refusal
    // (the shared session's parser chain, GraftMaintenanceSqlSpec
    // also covers this) — here prove the refusal NAMES the fix
    val e = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE definitely_not_graft_r14")
    }
    assert(e.getMessage.contains("not a graft table"))
  }
}
