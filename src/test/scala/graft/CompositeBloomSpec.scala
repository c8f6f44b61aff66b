package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Round-16 verdict #4: full-tuple Bloom lanes for composite keys.
  * On a FIRST-COMPONENT-HOT table (every batch holds the hot
  * component) the old first-component probe is a sound superset that
  * prunes NOTHING; the composite lane (`bloomcols` spec `a+b`) hashes
  * the whole tuple and opens exactly the batch(es) holding the probe
  * tuple — a STRICT subset on this crafted fixture. Dirs without the
  * composite lane fall back to the first-component probe (never worse
  * than before), and the exact semi-join on top keeps results
  * identical either way.
  */
class CompositeBloomSpec extends SparkTestBase {
  import spark.implicits._

  private def dataDirs(path: String): Seq[String] = {
    val d = new java.io.File(s"$path/data")
    Option(d.listFiles()).toSeq.flatten.filter(_.isDirectory)
      .map(_.getName).toSeq
  }

  test("composite lane prunes a first-component-hot table to a strict subset; fallback dirs stay sound") {
    val path = tmpDir("r16-comp-bloom") + "/t"
    // 8 batches, ALL carrying experiment_id = 1 (the hot component);
    // file_path values are disjoint per batch
    (0 until 8).foreach { b =>
      VersionedTable.append(
        (0 until 100).map(j => (1L, s"b${b}_path_$j", (b * 100 + j).toLong))
          .toDF("experiment_id", "file_path", "size_c"),
        path, bloomCols = Seq("experiment_id+file_path"))
    }
    val dirs = dataDirs(path)
    assert(dirs.size === 8)
    val probe = Seq((1L, "b3_path_42")).toDF("experiment_id", "file_path")
    // first-component probe: every batch claims the hot component
    val first = VersionedTable.bloomCandidateDirsMulti(spark, path, dirs,
      Seq("experiment_id"), probe.select("experiment_id"))
    assert(first.size === 8)
    // full-tuple lane: exactly the one batch holding the tuple
    val comp = VersionedTable.bloomCandidateDirsMulti(spark, path, dirs,
      Seq("experiment_id", "file_path"), probe)
    assert(comp.size === 1)
    assert(comp.subsetOf(first))
    // the surviving dir really holds the tuple
    val latest = VersionedTable.latestVersion(path).get
    val hit = VersionedTable.lookupKeysMulti(spark, path, latest,
      Seq("experiment_id", "file_path"), probe)
    assert(hit.select("size_c").as[Long].collect().toSeq === Seq(342L))
    // a batch WITHOUT the composite lane falls back to the
    // first-component probe: it stays a candidate (sound), and the
    // exact semi-join still returns only true matches
    VersionedTable.append(
      Seq((1L, "b9_path_7", 907L)).toDF("experiment_id", "file_path",
        "size_c"),
      path, bloomCols = Seq("experiment_id"))
    val dirs2 = dataDirs(path)
    val comp2 = VersionedTable.bloomCandidateDirsMulti(spark, path, dirs2,
      Seq("experiment_id", "file_path"), probe)
    assert(comp2.size === 2) // the true dir + the lane-less fallback
    val v2 = VersionedTable.latestVersion(path).get
    val hit2 = VersionedTable.lookupKeysMulti(spark, path, v2,
      Seq("experiment_id", "file_path"), probe)
    assert(hit2.select("size_c").as[Long].collect().toSeq === Seq(342L))
    // an upsert's insert-if-absent anti-join rides the same pruning
    // and stays exact: re-inserting an existing tuple is dropped,
    // a new tuple lands
    VersionedTable.upsertMulti(
      Seq((1L, "b3_path_42", -1L), (1L, "b9_path_8", 908L))
        .toDF("experiment_id", "file_path", "size_c"),
      Seq("experiment_id", "file_path"), path, insertOnly = true,
      bloomCols = Seq("experiment_id+file_path"))
    val v3 = VersionedTable.latestVersion(path).get
    val after = VersionedTable.lookupKeysMulti(spark, path, v3,
      Seq("experiment_id", "file_path"),
      Seq((1L, "b3_path_42"), (1L, "b9_path_8"))
        .toDF("experiment_id", "file_path"))
    assert(after.orderBy("file_path").select("size_c").as[Long]
      .collect().toSeq === Seq(342L, 908L))
  }

  test("OPTIMIZE preserves the composite lane: the rebuilt batch's sidecar still carries it") {
    val path = tmpDir("r16-comp-opt") + "/t"
    (0 until 3).foreach { b =>
      VersionedTable.append(
        (0 until 50).map(j => (1L, s"b${b}_p$j", j.toLong))
          .toDF("experiment_id", "file_path", "size_c"),
        path, bloomCols = Seq("experiment_id+file_path"))
    }
    // the maintenance pass re-derives bloom specs from the sidecars
    // (bloomColumnsOf) — the canonical `a+b` lane name round-trips
    // through writeBloomSidecar's component parser
    VersionedTable.compact(spark, path,
      bloomCols = VersionedTable.bloomColumnsOf(spark, path,
        VersionedTable.latestVersion(path).get))
    val dirs = dataDirs(path)
    val probe = Seq((1L, "b1_p7")).toDF("experiment_id", "file_path")
    val latest = VersionedTable.latestVersion(path).get
    val cand = VersionedTable.bloomCandidateDirsMulti(spark, path, dirs,
      Seq("experiment_id", "file_path"), probe)
    // the compacted batch claims the composite lane (it is the only
    // live batch, and it is a CANDIDATE through the lane, not through
    // the no-claim fallback — prove by probing an absent tuple)
    val miss = VersionedTable.bloomCandidateDirsMulti(spark, path,
      VersionedTable.lookupKeysMulti(spark, path, latest,
        Seq("experiment_id", "file_path"), probe)
        .inputFiles.map(f => f.split("/data/")(1).split("/").head)
        .distinct.toSeq,
      Seq("experiment_id", "file_path"),
      Seq((1L, "nowhere_p999")).toDF("experiment_id", "file_path"))
    assert(miss.isEmpty) // the lane makes a real absence claim
    assert(VersionedTable.lookupKeysMulti(spark, path, latest,
      Seq("experiment_id", "file_path"), probe)
      .select("size_c").as[Long].collect().toSeq === Seq(7L))
    assert(cand.nonEmpty)
  }

  test("composite lane type-casts per batch: a long-typed probe finds an int-typed batch") {
    val path = tmpDir("r16-comp-bloom-int") + "/t"
    VersionedTable.append(
      (0 until 50).map(j => (j, s"p$j", j.toLong))
        .toDF("a", "b", "v"), // `a` stored as INT
      path, bloomCols = Seq("a+b"))
    val dirs = dataDirs(path)
    val probe = Seq((7L, "p7")).toDF("a", "b") // LONG-typed probe
    val cand = VersionedTable.bloomCandidateDirsMulti(spark, path, dirs,
      Seq("a", "b"), probe)
    assert(cand === dirs.toSet) // one batch, and it must stay
    // an overflowing probe component matches nothing — and never
    // drops a dir for OTHER probe rows
    val over = Seq((1L << 40, "p7"), (7L, "p7")).toDF("a", "b")
    val cand2 = VersionedTable.bloomCandidateDirsMulti(spark, path, dirs,
      Seq("a", "b"), over)
    assert(cand2 === dirs.toSet)
  }
}
