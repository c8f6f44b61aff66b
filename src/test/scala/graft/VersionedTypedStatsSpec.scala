package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** TYPED manifest stats + typed auto-pruning (round 12): a plain
  * `.filter` with a DATE / TIMESTAMP / STRING / DECIMAL / DOUBLE
  * literal on a same-typed column prunes batch dirs from the
  * KB-sized manifest — the #1 real predicate at 100 TB is a date
  * range, and before this round it opened every batch unless the
  * caller pre-encoded epoch longs. Contracts under test: pruning
  * never changes the answer, a truncated string max claims no upper
  * bound, stats in a different domain make no claim, and the typed
  * grammar coexists with legacy long stats in one manifest.
  */
class VersionedTypedStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def base(d: String): String = d.substring(d.lastIndexOf('/') + 1)

  private def scannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  private def dateDf(days: Seq[String]) =
    days.toDF("ds").select(to_date($"ds").as("dt"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"ds")).as("n"))

  test("a plain date-range filter prunes date-stats batches; answer unchanged") {
    val path = tmpDir("vt_typed_date")
    VersionedTable.append(
      dateDf(Seq("2024-01-05", "2024-02-20")), path, statsCols = Seq("dt"))
    VersionedTable.append(
      dateDf(Seq("2024-03-10", "2024-04-25")), path, statsCols = Seq("dt"))
    VersionedTable.append(
      dateDf(Seq("2024-05-15", "2024-06-30")), path, statsCols = Seq("dt"))
    val lo = java.sql.Date.valueOf("2024-03-01")
    val hi = java.sql.Date.valueOf("2024-05-01")
    val auto = VersionedTable.readAtAuto(spark, path, 3)
      .filter($"dt" >= lit(lo) && $"dt" < lit(hi))
    val dirs = scannedDirs(auto)
    assert(dirs.size === 1 && base(dirs.head).startsWith("b2_"),
      s"date range should open only the March-April batch, scanned $dirs")
    assert(auto.select("dt").as[java.sql.Date].collect().map(_.toString).sorted
      === Array("2024-03-10", "2024-04-25"))
    // SQL text prunes identically (the TVF surface)
    val sql = spark.sql(
      s"SELECT * FROM graft_versioned('$path') WHERE dt >= DATE '2024-03-01' " +
        "AND dt < DATE '2024-05-01'")
    assert(scannedDirs(sql) === dirs, "SQL text must prune like the DataFrame")
    // an impossible date range folds to an empty LocalRelation
    val none = VersionedTable.readAtAuto(spark, path, 3)
      .filter($"dt" > lit(java.sql.Date.valueOf("2030-01-01")))
    assert(none.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l }.nonEmpty)
    assert(none.count() === 0L)
  }

  test("a timestamp-range filter prunes micros-stats batches") {
    val path = tmpDir("vt_typed_ts")
    def tsDf(ts: Seq[String]) =
      ts.toDF("s").select(to_timestamp($"s").as("at"), length($"s").as("n"))
    VersionedTable.append(tsDf(Seq("2024-01-01 00:00:01", "2024-01-01 06:00:00")),
      path, statsCols = Seq("at"))
    VersionedTable.append(tsDf(Seq("2024-01-01 12:00:00", "2024-01-01 18:00:00")),
      path, statsCols = Seq("at"))
    val auto = VersionedTable.readAtAuto(spark, path, 2)
      .filter($"at" >= lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    val dirs = scannedDirs(auto)
    assert(dirs.size === 1 && base(dirs.head).startsWith("b2_"), s"scanned $dirs")
    assert(auto.count() === 2L)
  }

  test("string stats: equality and ranges prune; a truncated max claims no upper bound") {
    val path = tmpDir("vt_typed_str")
    VersionedTable.append(Seq(("alpha", 1), ("bravo", 2)).toDF("w", "n"),
      path, statsCols = Seq("w"))
    VersionedTable.append(Seq(("mike", 3), ("november", 4)).toDF("w", "n"),
      path, statsCols = Seq("w"))
    // third batch: its max is a 100-char string, truncated on the
    // manifest -> upper bound unbounded; its min ("papa") still bounds
    val longWord = "zulu-" + ("x" * 95)
    VersionedTable.append(Seq(("papa", 5), (longWord, 6)).toDF("w", "n"),
      path, statsCols = Seq("w"))
    // point lookup lands in batch 2 only
    val eq = VersionedTable.readAtAuto(spark, path, 3).filter($"w" === "mike")
    val eqDirs = scannedDirs(eq)
    assert(eqDirs.size === 1 && base(eqDirs.head).startsWith("b2_"),
      s"scanned $eqDirs")
    assert(eq.select("n").as[Int].collect() === Array(3))
    // a range above every bounded max: batch 3 must SURVIVE (its
    // truncated max makes no upper claim) while batches 1-2 prune
    val high = VersionedTable.readAtAuto(spark, path, 3)
      .filter($"w" >= "zzz")
    val highDirs = scannedDirs(high)
    assert(highDirs.size === 1 && base(highDirs.head).startsWith("b3_"),
      s"the truncated-max batch must not be pruned above: $highDirs")
    assert(high.count() === 0L, "no actual row is >= zzz")
    // a range below batch 3's min prefix prunes it (prefix min is a
    // valid lower bound)
    val low = VersionedTable.readAtAuto(spark, path, 3)
      .filter($"w" <= "charlie")
    val lowDirs = scannedDirs(low)
    assert(lowDirs.size === 1 && base(lowDirs.head).startsWith("b1_"),
      s"scanned $lowDirs")
    assert(low.select("w").as[String].collect().sorted
      === Array("alpha", "bravo"))
  }

  test("decimal and double stats prune under exact-typed literals") {
    val path = tmpDir("vt_typed_num")
    def decDf(vs: Seq[String]) = vs.toDF("s")
      .select(expr("CAST(s AS DECIMAL(10,2))").as("price"),
        expr("CAST(s AS DOUBLE) * 2").as("score"))
    VersionedTable.append(decDf(Seq("10.50", "20.25")), path,
      statsCols = Seq("price", "score"))
    VersionedTable.append(decDf(Seq("90.00", "99.99")), path,
      statsCols = Seq("price", "score"))
    val dec = VersionedTable.readAtAuto(spark, path, 2)
      .filter($"price" >= expr("CAST(50 AS DECIMAL(10,2))"))
    val decDirs = scannedDirs(dec)
    assert(decDirs.size === 1 && base(decDirs.head).startsWith("b2_"),
      s"scanned $decDirs")
    assert(dec.count() === 2L)
    val dbl = VersionedTable.readAtAuto(spark, path, 2)
      .filter($"score" < lit(50.0))
    val dblDirs = scannedDirs(dbl)
    assert(dblDirs.size === 1 && base(dblDirs.head).startsWith("b1_"),
      s"scanned $dblDirs")
    assert(dbl.count() === 2L)
  }

  test("typed stats in a different domain than the literal make no claim") {
    val path = tmpDir("vt_typed_mixed")
    // dt carries DATE stats; comparing it to a STRING literal goes
    // through a cast in the plan, so no bare-attribute conjunct
    // matches -> nothing prunes, and the answer is still right
    VersionedTable.append(dateDf(Seq("2024-01-05")), path, statsCols = Seq("dt"))
    VersionedTable.append(dateDf(Seq("2024-06-15")), path, statsCols = Seq("dt"))
    val cast = VersionedTable.readAtAuto(spark, path, 2)
      .filter($"dt".cast("string") >= "2024-05")
    assert(scannedDirs(cast).size === 2, "a cast predicate must not prune")
    assert(cast.count() === 1L)
    // legacy long stats and typed stats coexist in one manifest
    val path2 = tmpDir("vt_typed_coexist")
    val df = Seq((1L, "2024-01-05"), (2L, "2024-01-06")).toDF("k", "ds")
      .select($"k", to_date($"ds").as("dt"))
    VersionedTable.append(df, path2, statsCols = Seq("k", "dt"))
    val df2 = Seq((100L, "2024-06-05"), (101L, "2024-06-06")).toDF("k", "ds")
      .select($"k", to_date($"ds").as("dt"))
    VersionedTable.append(df2, path2, statsCols = Seq("k", "dt"))
    val byLong = VersionedTable.readAtAuto(spark, path2, 2).filter($"k" >= 50L)
    assert(scannedDirs(byLong).size === 1)
    val byDate = VersionedTable.readAtAuto(spark, path2, 2)
      .filter($"dt" >= lit(java.sql.Date.valueOf("2024-03-01")))
    assert(scannedDirs(byDate).size === 1)
    assert(byLong.count() === 2L && byDate.count() === 2L)
  }

  test("compactByRange on a DATE column: typed buckets prune from date literals") {
    val path = tmpDir("vt_typed_cluster")
    // arrival-order churn: every append spans the full year
    VersionedTable.append(dateDf(Seq("2024-01-05", "2024-12-20")), path)
    VersionedTable.append(dateDf(Seq("2024-03-10", "2024-10-25")), path)
    VersionedTable.append(dateDf(Seq("2024-05-15", "2024-08-30")), path)
    val before = VersionedTable.readLatest(spark, path)
      .select($"dt".cast("string"), $"n")
      .as[(String, Int)].collect().sorted.toSeq
    val v4 = VersionedTable.compactByRange(spark, path, "dt", nBuckets = 3)
    assert(VersionedTable.readLatest(spark, path)
      .select($"dt".cast("string"), $"n")
      .as[(String, Int)].collect().sorted.toSeq === before,
      "clustering on a date column changed the content")
    val q = VersionedTable.readAtAuto(spark, path, v4)
      .filter($"dt" >= lit(java.sql.Date.valueOf("2024-11-01")))
    val buckets = scannedDirs(q).flatMap(
      _.split("/").find(_.startsWith("__rb=")))
    assert(buckets.size === 1,
      s"a tail date slice should open one typed bucket, opened $buckets")
    assert(q.count() === 1L)
  }

  test("compactByZOrderN: three typed dimensions each prune to strict subsets") {
    val path = tmpDir("vt_typed_zn")
    val rnd = new scala.util.Random(7)
    val rows = (1 to 600).map { i =>
      val day = 1 + rnd.nextInt(330)
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19700L + day)),
        rnd.nextInt(100000).toLong, rnd.nextInt(900).toLong, i)
    }
    VersionedTable.append(
      rows.toDF("dt", "k", "region", "n"), path)
    val v2 = VersionedTable.compactByZOrderN(spark, path,
      Seq("dt", "k", "region"), nBuckets = 8, bits = 4)
    assert(VersionedTable.readAt(spark, path, v2).count() === 600L)
    def bucketsOf(df: DataFrame): Set[String] =
      scannedDirs(df).flatMap(_.split("/").find(_.startsWith("__zb=")))
    val all = bucketsOf(VersionedTable.readAtAuto(spark, path, v2))
    assert(all.size === 8)
    // each single-column slice opens a strict subset of the buckets —
    // the n-D zone-map trade: every dimension keeps SOME skipping
    val byDate = bucketsOf(VersionedTable.readAtAuto(spark, path, v2)
      .filter($"dt" < lit(java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(19700L + 40).toString))))
    val byKey = bucketsOf(VersionedTable.readAtAuto(spark, path, v2)
      .filter($"k" < 12000L))
    val byRegion = bucketsOf(VersionedTable.readAtAuto(spark, path, v2)
      .filter($"region" < 100L))
    assert(byDate.size < all.size, s"date slice opened $byDate of $all")
    assert(byKey.size < all.size, s"key slice opened $byKey of $all")
    assert(byRegion.size < all.size, s"region slice opened $byRegion of $all")
    // and every slice's answer equals the unpruned one
    val plain = VersionedTable.readAt(spark, path, v2)
    assert(VersionedTable.readAtAuto(spark, path, v2)
      .filter($"k" < 12000L).count() === plain.filter($"k" < 12000L).count())
  }

  test("clustering on a string column is SUPPORTED since r13 (refusal lifted)") {
    // the r12-era refusal is gone: strings cluster through the
    // globalRank-derived rank space (StringClusteringSpec owns the
    // full proof — content identity, pruning subset, nulls, skew);
    // this guards against the refusal regressing back in
    val path = tmpDir("vt_typed_strcluster")
    VersionedTable.append(Seq(("a", 1), ("m", 2), ("z", 3)).toDF("w", "n"),
      path)
    VersionedTable.compactByRange(spark, path, "w", 2)
    assert(VersionedTable.readAt(spark, path, 2L).count() === 3L)
    assert(VersionedTable.statsColumnsOf(path, 2L) === Seq("w"),
      "@s typed stats recorded on the clustered buckets")
  }
}
