package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Per-batch Bloom sidecars: point lookups and insert-if-absent
  * existence checks open only the batches that might hold the probed
  * keys — on hash/arrival-distributed layouts where min/max stats
  * are blind — and pruning NEVER changes an answer (no false
  * negatives by construction; false positives only cost a scan).
  */
class VersionedBloomSpec extends SparkTestBase {
  import spark.implicits._

  /** keys striped MOD 4 across four appends: every batch's [min,max]
    * spans the whole domain, so zone maps cannot prune anything —
    * the layout Bloom sidecars exist for.
    */
  private def buildStriped(prefix: String, blooms: Boolean): String = {
    val path = tmpDir(prefix)
    (0 until 4).foreach { stripe =>
      val rows = (0 until 400).filter(_ % 4 == stripe)
        .map(k => (k.toLong, k.toLong * 10))
      VersionedTable.append(rows.toDF("k", "v"), path,
        bloomCols = if (blooms) Seq("k") else Nil)
    }
    path
  }

  test("lookupKeys opens only candidate batches and matches the full-scan answer") {
    val path = buildStriped("vt_bloom_lookup", blooms = true)
    // keys 8 and 17 live in stripes 0 and 1 -> at most 2 candidate
    // batches (plus Bloom false positives, none at this density)
    val hit = VersionedTable.lookupKeys(spark, path, 4L, "k", Seq(8L, 17L))
    val batches = hit.inputFiles.toSeq.flatMap("b\\d+_[0-9a-f]+".r.findFirstIn(_)).toSet
    assert(batches.size <= 2, s"bloom pruning opened $batches")
    val expected = VersionedTable.readAt(spark, path, 4L)
      .filter($"k".isin(8L, 17L)).as[(Long, Long)].collect().sorted
    assert(hit.as[(Long, Long)].collect().sorted === expected)
    // the sidecar is invisible to data scans
    assert(VersionedTable.readAt(spark, path, 4L).count() === 400L)
  }

  test("a tombstoned key stays deleted through the pruned lookup") {
    val path = buildStriped("vt_bloom_tomb", blooms = true)
    VersionedTable.deleteKeys(Seq(8L).toDF("k"), "k", path)
    val hit = VersionedTable.lookupKeys(spark, path, 5L, "k", Seq(8L, 17L))
    assert(hit.as[(Long, Long)].collect().toSeq === Seq((17L, 170L)))
  }

  test("sidecar-less batches are always candidates (no index = no claim)") {
    val path = buildStriped("vt_bloom_mixed", blooms = true)
    // a fifth batch WITHOUT a sidecar: it must be scanned even though
    // no Bloom admits the probed key
    VersionedTable.append(Seq((1000L, 1L)).toDF("k", "v"), path)
    val hit = VersionedTable.lookupKeys(spark, path, 5L, "k", Seq(1000L))
    assert(hit.as[(Long, Long)].collect().toSeq === Seq((1000L, 1L)))
  }

  test("the optimizer probes sidecars for point predicates: WHERE IN prunes with no API") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scanned(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
      }.flatten.toSet
    val path = buildStriped("vt_bloom_rule", blooms = true)
    // NO statsCols on this table: the min/max envelope is blind; only
    // the sidecar probe can prune. Keys 8, 17 live in stripes 0, 1.
    val auto = VersionedTable.readAtAuto(spark, path, 4L)
      .filter($"k".isin(8L, 17L))
    val dirs = scanned(auto)
    assert(dirs.size === 2, s"bloom rule should keep 2 of 4 stripes: $dirs")
    assert(auto.as[(Long, Long)].collect().sorted ===
      Array((8L, 80L), (17L, 170L)))
    // equality probe, through the SQL TVF surface
    val sqlDf = spark.sql(s"SELECT v FROM graft_versioned('$path', 4) WHERE k = 8")
    assert(scanned(sqlDf).size === 1, s"k = 8 is one stripe: ${scanned(sqlDf)}")
    assert(sqlDf.as[Long].collect() === Array(80L))
    // a key no batch holds: the scan folds to an empty LocalRelation
    val none = VersionedTable.readAtAuto(spark, path, 4L)
      .filter($"k" === 40400L)
    assert(none.count() === 0L)
    assert(scanned(none).isEmpty, "all batches bloom-pruned")
  }

  test("clustering compaction rebuilds the index layer: range stats on x, blooms on y") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scanned(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
      }.flatten.toSet
    val path = tmpDir("vt_compact_index")
    val rows = (0 until 400).map(x => (x.toLong, (x * 7 % 400).toLong))
    VersionedTable.append(rows.toDF("x", "y"), path)
    // cluster on x, Bloom on y: range queries prune by stats, point
    // queries on the OTHER column prune by sidecar — maintenance
    // leaves the table with both access paths
    VersionedTable.compactByRange(spark, path, "x", 4, bloomCols = Seq("y"))
    // <= 99, not < 100: the rule widens strict bounds to inclusive,
    // so < 100 would conservatively keep the bucket starting at 100
    val range = VersionedTable.readAtAuto(spark, path, 2L).filter($"x" <= 99)
    assert(scanned(range).size === 1, s"x-range should open one bucket: ${scanned(range)}")
    val point = VersionedTable.readAtAuto(spark, path, 2L).filter($"y" === 77L)
    assert(scanned(point).size < 4, s"y-point should bloom-prune: ${scanned(point)}")
    assert(point.as[(Long, Long)].collect().toSeq === Seq((11L, 77L)))
    // plain compact keeps the layer too when asked
    val p2 = tmpDir("vt_compact_index2")
    VersionedTable.append(rows.toDF("x", "y"), p2)
    VersionedTable.compact(spark, p2, statsCols = Seq("x"), bloomCols = Seq("x"))
    assert(VersionedTable.countAt(spark, p2, 2L) === Some(400L))
    assert(VersionedTable.readAtAuto(spark, p2, 2L).filter($"x" === 13L)
      .as[(Long, Long)].collect().toSeq === Seq((13L, 91L)))
  }

  test("countAt: footer-only counts, sidecar-proof, tombstones refuse") {
    val path = buildStriped("vt_count", blooms = true)
    // blooms on: the sidecar parquet files must not inflate the count
    assert(VersionedTable.countAt(spark, path, 4L) === Some(400L))
    VersionedTable.deleteKeys(Seq(8L, 9L).toDF("k"), "k", path)
    // unabsorbed tombstone: metadata cannot answer — refuse, never lie
    assert(VersionedTable.countAt(spark, path, 5L) === None)
    VersionedTable.compact(spark, path)
    assert(VersionedTable.countAt(spark, path, 6L) === Some(398L))
    assert(VersionedTable.readAt(spark, path, 6L).count() === 398L)
  }

  test("appendChecked: clean commits, loud refusals with an intact table, quarantine splits") {
    import graft.operators.Expectations._
    val path = tmpDir("vt_checked")
    val ok = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val rules = Seq(NotNull("v"), Check("v_nonneg", $"v" >= 0))
    assert(VersionedTable.appendChecked(ok, path, rules) === 1L)
    // a violating batch without quarantine: refused, previous version
    // intact, staged dir is an orphan the manifest never references
    val bad = Seq((3L, 30L), (4L, -4L)).toDF("k", "v")
    val e = intercept[IllegalStateException] {
      VersionedTable.appendChecked(bad, path, rules)
    }
    assert(e.getMessage.contains("v_nonneg (1 rows)"))
    assert(VersionedTable.latestVersion(path) === Some(1L))
    assert(VersionedTable.readLatest(spark, path).count() === 2L)
    // with quarantine: valid rows commit, violators land in the DLQ
    // (itself a versioned table)
    val dlq = tmpDir("vt_checked_dlq")
    val mixed = Seq[(java.lang.Long, java.lang.Long)](
      (5L, 50L), (6L, -6L), (7L, null)).toDF("k", "v")
    assert(VersionedTable.appendChecked(mixed, path, rules,
      quarantine = Some(dlq)) === 2L)
    assert(VersionedTable.readLatest(spark, path).select("k")
      .as[Long].collect().sorted === Array(1L, 2L, 5L))
    assert(VersionedTable.readLatest(spark, dlq).select("k")
      .as[Long].collect().sorted === Array(6L, 7L))
    // a unique violation is not row-attributable: quarantine refuses
    val dupes = Seq((9L, 1L), (9L, 2L)).toDF("k", "v")
    val e2 = intercept[IllegalStateException] {
      VersionedTable.appendChecked(dupes, path, rules :+ Unique(Seq("k")),
        quarantine = Some(dlq))
    }
    assert(e2.getMessage.contains("unique:k"))
    // referential rule splits through the broadcast ref-key mark
    val ref = Seq(1L, 2L, 5L).toDF("rk")
    val fk = Seq((5L, 1L), (8L, 99L)).toDF("k", "fk")
    val p2 = tmpDir("vt_checked_fk")
    assert(VersionedTable.appendChecked(fk, p2,
      Seq(InReference("fk", ref.select($"rk".as("fk")), "fk")),
      quarantine = Some(dlq)) === 1L)
    assert(VersionedTable.readLatest(spark, p2).select("k")
      .as[Long].collect() === Array(5L))
  }

  test("appendChecked quarantine is exactly-once under txnId, even across the two-commit window") {
    import graft.operators.Expectations._
    val path = tmpDir("vt_chk_txn")
    val dlq = tmpDir("vt_chk_txn_dlq")
    val batch = Seq((1L, 10L), (2L, -2L)).toDF("k", "v")
    val rules = Seq(Check("v_nonneg", $"v" >= 0))
    // simulate the crash window: the DLQ leg committed, the table
    // commit did not — then the whole appendChecked replays
    VersionedTable.append(batch.filter($"v" < 0), dlq,
      txnId = Some("load7-dlq"))
    val v = VersionedTable.appendChecked(batch, path, rules,
      quarantine = Some(dlq), txnId = Some("load7"))
    assert(v === 1L)
    // and a full second replay no-ops on BOTH tables
    assert(VersionedTable.appendChecked(batch, path, rules,
      quarantine = Some(dlq), txnId = Some("load7")) === 1L)
    assert(VersionedTable.readLatest(spark, path)
      .as[(Long, Long)].collect().toSeq === Seq((1L, 10L)))
    assert(VersionedTable.readLatest(spark, dlq)
      .as[(Long, Long)].collect().toSeq === Seq((2L, -2L)))
    assert(VersionedTable.latestVersion(dlq) === Some(1L))
  }

  test("statsRange: exact envelope, empty-batch tolerance, honest refusals") {
    val path = tmpDir("vt_range")
    VersionedTable.append((0L to 9L).toDF("k"), path, statsCols = Seq("k"))
    VersionedTable.append((20L to 29L).toDF("k"), path, statsCols = Seq("k"))
    assert(VersionedTable.statsRange(spark, path, 2L, "k") === Some((0L, 29L)))
    // an EMPTY stats-less batch is ignorable (footer count 0)
    VersionedTable.append(spark.range(0).select(col("id").as("k")), path)
    assert(VersionedTable.statsRange(spark, path, 3L, "k") === Some((0L, 29L)))
    // a NON-empty stats-less batch makes unbounded claims: refuse
    VersionedTable.append(Seq(100L).toDF("k"), path)
    assert(VersionedTable.statsRange(spark, path, 4L, "k") === None)
    // a tombstone may have held the extremum: refuse
    val p2 = tmpDir("vt_range2")
    VersionedTable.append((0L to 9L).toDF("k"), p2, statsCols = Seq("k"))
    VersionedTable.deleteKeys(Seq(9L).toDF("k"), "k", p2)
    assert(VersionedTable.statsRange(spark, p2, 2L, "k") === None)
  }

  test("history classifies commit kinds and marks the vacuum retention floor") {
    val path = tmpDir("vt_history")
    VersionedTable.append(Seq((1L, 1L)).toDF("k", "v"), path)
    VersionedTable.append(Seq((2L, 2L)).toDF("k", "v"), path,
      txnId = Some("t2"))
    VersionedTable.deleteKeys(Seq(1L).toDF("k"), "k", path)
    VersionedTable.upsert(Seq((2L, 20L), (3L, 3L)).toDF("k", "v"), "k", path)
    VersionedTable.compact(spark, path)
    val h = VersionedTable.history(spark, path)
      .select("version", "kind", "txn").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(h.map(_._2).toSeq ===
      Seq("append", "append", "delete", "upsert", "compact"))
    assert(h(1)._3 === "t2")
    // vacuum to the last two versions: the oldest retained manifest
    // is cumulative state, not a single commit's delta — history
    // must say so instead of misclassifying it
    VersionedTable.vacuum(path, keep = 2)
    val hv = VersionedTable.history(spark, path)
      .select("version", "kind").as[(Long, String)].collect().sortBy(_._1)
    assert(hv.toSeq === Seq((4L, "history-truncated"), (5L, "compact")))
  }

  test("bloom-pruned insert-if-absent equals the unpruned semantics exactly") {
    val pruned = buildStriped("vt_bloom_upsert_p", blooms = true)
    val plain = buildStriped("vt_bloom_upsert_n", blooms = false)
    // 50 and 151 exist (stripes 2 and 3), 500 is new; existing keys'
    // CHANGED values must be ignored by insert-if-absent
    val incoming = Seq((50L, -1L), (151L, -1L), (500L, 5000L)).toDF("k", "v")
    VersionedTable.upsert(incoming, "k", pruned, insertOnly = true,
      bloomCols = Seq("k"))
    VersionedTable.upsert(incoming, "k", plain, insertOnly = true)
    val a = VersionedTable.readLatest(spark, pruned)
      .as[(Long, Long)].collect().sorted
    val b = VersionedTable.readLatest(spark, plain)
      .as[(Long, Long)].collect().sorted
    assert(a === b)
    assert(a.length === 401)
    assert(a.find(_._1 == 50L).get._2 === 500L, "existing value must survive")
    assert(a.find(_._1 == 500L).get._2 === 5000L, "new key must insert")
  }
}
