package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.queries._

/** PLANS.md's claims, enforced: pushdown reaches the scan, small
  * sides broadcast, top-k never globally sorts, aggregation is
  * two-phase. A regression that silently de-optimizes a plan fails
  * here instead of surfacing as a 100x slowdown at scale.
  */
class PlanAssertionsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case qs: QueryStageExec => scans(qs.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  private def executed(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection are pushed into the parquet scan") {
    val df = Relational.q02.run(spark, sf)
    df.collect()
    val scan = scans(df.queryExecution.executedPlan).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
    assert(pushed != "[]", s"no pushed filters: $pushed")
    val readSchema = scan.metadata.getOrElse("ReadSchema", "")
    // lineitem has 11+ columns; the query needs 4
    assert(readSchema.split(",").length <= 5, s"scan reads too much: $readSchema")
  }

  test("q03: dimension side broadcasts and top-k is a streaming heap, not a global sort") {
    val plan = executed(Relational.q03.run(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q01: aggregation is two-phase (map-side partial before the exchange)") {
    val plan = executed(Relational.q01.run(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"), plan)
  }

  test("q17: top-k per group is a bounded-heap object aggregate, not a window sort") {
    val plan = executed(SparkEntry.queries("q17_topk_per_group")(spark, sf))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q90: distributed equi-depth matches the ntile window form, no global Window sort") {
    import spark.implicits._
    import graft.operators.Histogram
    // ties across tile boundaries and n not divisible by ntiles —
    // the two places ntile arithmetic can go wrong
    val df = (1 to 103).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val windowed = Histogram.equiDepth(df, "v", Seq("id"), 10)
      .as[(Long, Long, Double, Double)].collect().toSet
    val dist = Histogram.equiDepthDistributed(df, "v", Seq("id"), 10, 8)
    val got = dist.as[(Long, Long, Double, Double)].collect().toSet
    assert(got === windowed)
    assert(!dist.queryExecution.executedPlan.toString.contains("Window"),
      "distributed equi-depth must not plan a global Window sort")
    // the declared q90 ships the distributed form
    val q90 = SparkEntry.queries("q90_histogram_depth")(spark, sf)
    q90.collect()
    assert(!q90.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("q109: dimension sides broadcast, no cartesian in the five-way join") {
    val plan = executed(Relational.q109.run(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q98a: approx table stats plan one hash aggregate, no Expand") {
    import graft.operators.TableStats
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice")
    val approx = TableStats.approxNumericStats(li, cols)
    approx.collect()
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx stats must not plan an Expand")
    // the exact twin DOES pay the Expand — that asymmetry is the point
    val exact = TableStats.numericStats(li, cols)
    exact.collect()
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("q48: deterministic sampling is a pure scan filter — no exchange at all") {
    val plan = executed(ScaleQueries.q48.run(spark, sf))
    assert(!plan.contains("Exchange"), plan)
  }

  test("q114: temperature mix joins the rate table by broadcast — corpus rows never sort-merge") {
    val plan = executed(ScaleQueries.q114.run(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q116: within-cluster self-join reuses ONE cached cluster-keyed exchange") {
    val df = SimilarityQueries.q116.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the cached members frame feeds both self-join sides: the pair
    // stage must read InMemoryTableScan, not re-shuffle the corpus
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("runtime bloom filter injects into shuffle inner joins (and never anti-joins)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("bloom_assert")
    spark.range(200000)
      .select(col("id"), concat(lit("v"), col("id")).as("pad"))
      .write.parquet(s"$dir/fact")
    spark.range(50000)
      .select(col("id").as("fk"), (col("id") % 97).as("attr"))
      .write.parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("attr") === 3)
    // the GraftSession default thresholds engage at cluster scale
    // (application-side scan > 10GB); lower them here so the local
    // plan shows the injection the 100 TB deployment gets for free
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      def bloom(joinType: String): Boolean =
        fact.join(dim, fact("id") === dim("fk"), joinType)
          .queryExecution.optimizedPlan.toString.contains("bloom_filter")
      assert(bloom("inner"), "no bloom_filter_agg in the inner shuffle-join plan")
      assert(bloom("left_semi"), "no bloom_filter_agg in the semi shuffle-join plan")
      // anti-joins must NOT get one: pruning probe rows that miss the
      // filter would drop rows an anti-join has to KEEP
      assert(!bloom("left_anti"), "bloom filter unexpectedly injected into an anti-join")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q125: bucketed co-located join — the only exchange is the final rollup") {
    import graft.operators.Bucketing
    val df = ScaleQueries.q125.run(spark, sf)
    df.collect()
    // join inputs read pre-bucketed: zero shuffles on either side;
    // the single remaining exchange carries the partial-agg rows
    assert(Bucketing.countShuffles(df) <= 1,
      df.queryExecution.executedPlan.toString)
  }

  test("q138: PQ search never sort-merges — codebook and distance table broadcast") {
    val df = graft.operators.ProductQuantization.adcTopK(
      spark, Tables.embeddings(spark, sf), "vec_id", "embedding",
      m = 4, k = 8, subDim = 16, iters = 1, queryId = 0L, topK = 5)
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q133: triangle counting plans equi-joins only — no cartesian, no nested loop") {
    val plan = executed(MiningQueries.q133.run(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q141: sketch rollup aggregates are two-phase (partial sketches combine map-side)") {
    val df = graft.operators.Sketches.mergeableDistinctRollup(
      Tables.events(spark, sf), "event_type",
      org.apache.spark.sql.functions.expr("ts div 86400000000000"), "user_id")
    val plan = executed(df)
    assert(plan.contains("partial_hllsketchagg") || plan.contains("partial_hll"),
      plan)
  }

  test("q224: correlated EXISTS decorrelates to a LEFT SEMI join, no cartesian") {
    val plan = executed(Relational.q224.run(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q225: the EXISTS/NOT-EXISTS chain plans one semi and one anti join") {
    val plan = executed(Relational.q225.run(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q228: the global scalar re-aggregate REUSES the per-part exchange (one fact scan)") {
    val df = Relational.q228.run(spark, sf)
    val plan = executed(df)
    // the per-part aggregate feeds both the probe side and the global
    // (count, sum); AQE must reuse the shuffle stage, not re-scan
    assert(plan.contains("ReusedExchange"),
      s"pr exchange not reused — lineitem scanned twice:\n$plan")
  }

  test("q226: the disjunction's per-side implications push to BOTH scans") {
    val df = Relational.q226.run(spark, sf)
    // static plan, NOT executedPlan: at sf0.001 the filtered part side
    // is empty and AQE's empty-relation propagation erases both scans
    // from the final plan — pushdown is a compile-time property
    val ss = scans(df.queryExecution.sparkPlan)
    assert(ss.nonEmpty,
      s"no FileSourceScans found in:\n${df.queryExecution.sparkPlan}")
    def pushedFor(table: String): String = ss
      .filter(_.metadata.getOrElse("Location", "").contains(table))
      .map(_.metadata.getOrElse("PushedFilters", "[]")).mkString
    // lineitem scan: the quantity OR-chain extracted from the disjunction
    val lPushed = pushedFor("lineitem")
    assert(lPushed.contains("Or") && lPushed.contains("l_quantity"),
      s"quantity disjunction not pushed to lineitem scan: $lPushed")
    // part scan: the brand/size OR-chain
    val pPushed = pushedFor("part")
    assert(pPushed.contains("Or") && pPushed.contains("p_brand"),
      s"brand/size disjunction not pushed to part scan: $pPushed")
  }

  test("q238: customer dim broadcasts; top-10 is a TakeOrderedAndProject heap, no global sort") {
    val plan = executed(Relational.q238.run(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q239: the order filter stays in the outer join; zero-order customers survive") {
    val df = Relational.q239.run(spark, sf)
    val plan = executed(df)
    // the priority filter must NOT become a customer-deleting inner
    // join — LeftOuter is the query's semantics, not an accident
    assert(plan.contains("LeftOuter"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q240: the revenue view's exchange is reused by the max scalar (one fact scan)") {
    val plan = executed(Relational.q240.run(spark, sf))
    assert(plan.contains("ReusedExchange"),
      s"rev exchange not reused — lineitem scanned twice:\n$plan")
  }

  test("q241: blocked suppliers are a broadcast LeftAnti; distinct count has no Expand") {
    val plan = executed(Relational.q241.run(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // single-distinct aggregate plans as a two-level hash aggregate,
    // never the multi-distinct Expand blow-up
    assert(!plan.contains("Expand"), plan)
  }

  test("q242: the correlated average is a partitioned window — one fact scan, no self-join") {
    val df = Relational.q242.run(spark, sf)
    val plan = executed(df)
    // Window partitioned by l_partkey (bounded rows per part), never
    // the join-back form that scans lineitem twice
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val nScans = scans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("lineitem"))
    assert(nScans <= 1, s"lineitem scanned $nScans times:\n$plan")
  }

  test("statsDrivenJoin: each hot key takes the remedy its stats chose; output = plain join") {
    import spark.implicits._
    import graft.operators.Skew
    // crafted skew: key 0 = 60% of rows with a 1-row dim (fits the
    // broadcast budget), key 1 = 30% with a 5-row dim (exceeds it),
    // keys 2..11 cold at 1% each
    val large = ((1 to 600).map(i => (0L, i)) ++ (1 to 300).map(i => (1L, i)) ++
      (2 to 11).flatMap(k => (1 to 10).map(i => (k.toLong, i)))).toDF("k", "v")
    val small = ((0L, 100) +: (1 to 5).map(i => (1L, 200 + i)) ++:
      (2 to 11).map(k => (k.toLong, 300 + k))).toDF("k", "w")

    val decisions = Skew.joinPlanDecisions(large, small, "k",
        minShareBp = 2000L, broadcastRowLimit = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(decisions === Map(0L -> "broadcast_hot", 1L -> "salted"),
      s"wrong per-key remedies: $decisions")

    val out = Skew.statsDrivenJoin(large, small, "k",
      minShareBp = 2000L, saltFactor = 4, broadcastRowLimit = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").as[(Long, Int, Int)]
        .collect().sorted.toSeq
    assert(rows(out) === rows(large.join(small, Seq("k"))),
      "stats-driven join diverged from the plain join")
    // the hot-wide key's rows actually flowed through the salt
    // machinery, and the hot-narrow key through a broadcast join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salted branch in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast branch in plan:\n$plan")
  }

  test("statsDrivenJoin left mode: null keys and unmatched keys survive; output = plain left join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Skew
    // key 0 hot with a 1-row dim (broadcast), key 1 hot with NO dim
    // rows at all (empty broadcast must still null-extend), key 2 hot
    // and too wide for the budget (salted left), null keys cold
    val large = ((1 to 500).map(i => (Some(0L), i)) ++
      (1 to 300).map(i => (Some(1L), i)) ++
      (1 to 250).map(i => (Some(2L), i)) ++
      (1 to 30).map(i => (Option.empty[Long], i)) ++
      (3 to 8).flatMap(k => (1 to 5).map(i => (Some(k.toLong), i))))
      .toDF("k", "v")
    val small = ((0L, 100) +: (1 to 5).map(i => (2L, 200 + i)) ++:
      (3 to 8).map(k => (k.toLong, 300 + k))).toDF("k", "w")

    val out = Skew.statsDrivenJoin(large, small, "k",
      minShareBp = 2000L, saltFactor = 4, broadcastRowLimit = 1L,
      joinType = "left")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").as[(Option[Long], Int, Option[Int])]
        .collect().sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(rows(out) === rows(large.join(small, Seq("k"), "left")),
      "stats-driven left join diverged from the plain left join")
    // every null-key row survived, null-extended, exactly once
    assert(out.filter(col("k").isNull).count() === 30L)
    // the no-dim hot key null-extended all its rows
    assert(out.filter(col("k") === 1L && col("w").isNull).count() === 300L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salted branch in plan:\n$plan")
  }

  test("q272: the lang-ID profile table broadcasts; no shuffle join anywhere") {
    val plan = executed(SparkEntry.queries("q272_langid_holdout_accuracy")(spark, sf))
    // the 5x200-row profile table must never shuffle-join the gram
    // stream; the only windows are per-doc / per-language (bounded).
    // Assert on the FINAL AQE plan: the tiny confusion/total join is
    // SMJ in the initial plan and runtime-converted to broadcast —
    // exactly the AQE behavior we rely on
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"), plan)
    assert(!finalPlan.contains("SortMergeJoin"), plan)
  }

  test("q273: the chi-squared grid is broadcast-composed; one corpus scan family") {
    val plan = executed(SparkEntry.queries("q273_langid_fixture_independence")(spark, sf))
    // margins and the total broadcast onto the 155-cell grid — the
    // corpus-sized side never sort-merge-joins
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q275: manifest stats pruning keeps non-matching batch dirs out of the scan") {
    val df = SparkEntry.queries("q275_versioned_pruned_read")(spark, sf)
    val files = df.inputFiles.toSeq
    // three date-keyed batches committed; the 12-month range
    // intersects only the middle one. b3 carries stats and misses the
    // range -> pruned from the manifest before any file opens. (b1 is
    // EMPTY at sf0.001, so it recorded no stats and is correctly kept
    // — no stats = no claim; an empty batch contributes no rows.)
    assert(files.exists(_.contains("/data/b2_")),
      s"the matching batch is missing from the scan: $files")
    assert(!files.exists(_.contains("/data/b3_")),
      s"a stats-carrying non-matching batch was not pruned: $files")
  }

  test("q281: the filter ALONE prunes versioned batches (no pruning hint in the query)") {
    val df = SparkEntry.queries("q281_versioned_auto_skipping")(spark, sf)
    val files = df.inputFiles.toSeq
    // q275's layout, but the query carries no readAtPruned bounds —
    // the injected VersionedStatsPruning rule derives the pruning
    // from the plain .filter. The six-month range intersects only b2
    // among the stats-carrying batches; b3 must be gone from the
    // final plan. (b1 is empty at sf0.001: no stats, correctly kept.)
    assert(files.exists(_.contains("/data/b2_")),
      s"the matching batch is missing from the scan: $files")
    assert(!files.exists(_.contains("/data/b3_")),
      s"the filter did not prune the stats-carrying non-matching batch: $files")
  }

  test("q282: both z-ordered slices auto-prune — the union scans a strict subset of the 16 buckets") {
    val df = SparkEntry.queries("q282_versioned_zorder_compaction")(spark, sf)
    val buckets = df.inputFiles.toSeq.flatMap { f =>
      "__zb=\\d+".r.findFirstIn(f)
    }.toSet
    assert(buckets.nonEmpty, "expected z-bucket dirs in the scan")
    // two single-column range filters over a 16-bucket z-layout:
    // even their UNION must leave buckets unopened (each slice alone
    // is ~1/4; the spec measures the per-slice subsets)
    assert(buckets.size < 16,
      s"z-order auto-pruning opened every bucket: $buckets")
  }

  test("q283: the bloom probe confines the point lookup to the odd-stripe batches") {
    val df = SparkEntry.queries("q283_versioned_bloom_lookup")(spark, sf)
    // four data batches striped by o_orderkey % 4 (b1..b4 hold
    // stripes 0..3); every probed key is odd, so only the stripe-1
    // and stripe-3 batches (b2, b4) can match. min/max stats are
    // BLIND on this layout — only the sidecar probe can prune.
    val dataBatches = df.inputFiles.toSeq
      .flatMap("/data/(b[1-4])_[0-9a-f]+/".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(dataBatches === Set("b2", "b4"),
      s"bloom pruning should open exactly the odd stripes: $dataBatches")
  }

  test("q287: the filter alone prunes catalog-tagged files on a plain parquet dir") {
    val df = SparkEntry.queries("q287_file_skipping_auto")(spark, sf)
    val opened = df.inputFiles.length
    // 16-file range-sorted layout, two-day range: most files must
    // never enter the plan — with NO bounds restated in the query
    assert(opened > 0 && opened < 16,
      s"expected automatic file pruning, opened $opened/16")
  }

  test("q290: both pruning regimes fire through the SQL surface on the lifecycle table") {
    SparkEntry.queries("q290_lakehouse_recipe")(spark, sf).collect() // build
    val path = "/tmp/graft_q290_vt_life_" + sf.replaceAll("[^A-Za-z0-9.]", "_")
    val slice = spark.sql(s"""
      SELECT count(*) FROM graft_versioned('$path', 4)
      WHERE o_date_s >= 804556800 AND o_date_s < 820454400""")
    slice.collect()
    val sliceFiles = slice.inputFiles.length
    val lookup = spark.sql(s"""
      SELECT count(*) FROM graft_versioned('$path', 4)
      WHERE o_orderkey IN (3, 41, 555, 997, 1203)""")
    lookup.collect()
    val lookupFiles = lookup.inputFiles.length
    val full = spark.sql(s"SELECT count(*) FROM graft_versioned('$path', 4)")
      .inputFiles.length
    // 8 z-buckets: the date range must prune by the stats envelope,
    // the IN-list by the orderkey Bloom sidecars — both from plain
    // SQL WHERE clauses
    assert(sliceFiles < full, s"date slice opened $sliceFiles/$full")
    assert(lookupFiles < full, s"point lookup opened $lookupFiles/$full")
  }

  test("q278: after clustering compaction the range read opens a strict subset of buckets") {
    val df = SparkEntry.queries("q278_versioned_clustering_compaction")(spark, sf)
    val buckets = df.inputFiles.toSeq
      .flatMap(_.split("/").find(_.startsWith("__rb="))).distinct
    assert(buckets.nonEmpty && buckets.size < 4,
      s"clustered range read opened $buckets of 4 buckets — no skipping")
  }

  test("q277: PII scan is scan-local — no shuffle before the 4-row rollup") {
    val plan = executed(SparkEntry.queries("q277_pii_scan_redact")(spark, sf))
    // regexp work happens per-row in codegen; the only exchanges
    // carry category rollups (and the final tiny join)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q245: the DSIR ratio table broadcasts; selection is a TakeOrdered heap") {
    val plan = executed(SparkEntry.queries("q245_dsir_importance_selection")(spark, sf))
    // the 64-row bucket table must never shuffle-join the token stream
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q246: image near-dup candidates are an equi-join — no cartesian, no nested loop") {
    val plan = executed(SparkEntry.queries("q246_image_neardup_pairs")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q247: token-budget mix has no Window; the offset table broadcasts") {
    val df = SparkEntry.queries("q247_token_budget_mix")(spark, sf)
    val plan = executed(df)
    // the per-source cumulative must ride the global prefix sum
    // (whose single range shuffle lives inside the prefix-sum RDD
    // lineage, upstream of this SQL plan), never a per-source window
    // — one window partition per source would carry a corpus share
    // at scale; the |sources|-row offset table must broadcast
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q257: k-anonymity audit is two hash aggregates — nothing sorts or collects") {
    val plan = executed(SparkEntry.queries("q257_k_anonymity_audit")(spark, sf))
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("catalog reads: the V1 swap keeps filter pushdown AND manifest-stats batch pruning") {
    import graft.operators.VersionedTable
    spark.sql("DROP TABLE IF EXISTS graft.plan_cat")
    spark.sql("""CREATE TABLE graft.plan_cat (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k', 'statscols'='k')""")
    spark.sql("INSERT INTO graft.plan_cat SELECT id, id FROM range(0, 1000)")
    spark.sql("INSERT INTO graft.plan_cat SELECT id, id FROM range(1000, 2000)")
    val df = spark.sql("SELECT v FROM graft.plan_cat WHERE k >= 1500")
    df.collect()
    val scan = scans(df.queryExecution.executedPlan).head
    // pushdown: the predicate reaches the parquet scan through the
    // resolution-rule swap (a V2 scan would re-negotiate pushdown;
    // the V1 plan inherits Catalyst's, proving the swap is lossless)
    val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
    assert(pushed.contains("GreaterThanOrEqual(k,1500)"), pushed)
    // batch pruning: only the second INSERT's dir is opened (the
    // statscols table property indexed both commits)
    val files = scan.relation.location.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("b2_")), files.toSeq)
    // column pruning: the scan reads only what the SELECT needs
    assert(scan.metadata.get("ReadSchema").exists(s =>
      s.contains("k") && s.contains("v")), scan.metadata.get("ReadSchema"))
    spark.sql("DROP TABLE graft.plan_cat")
  }

  test("native DELETE: the plan is a delta write over the SWAPPED V1 read with the predicate pushed") {
    spark.sql("DROP TABLE IF EXISTS graft.plan_rl")
    spark.sql("""CREATE TABLE graft.plan_rl (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.plan_rl SELECT id, id FROM range(0, 100)")
    val plan = spark.sql("EXPLAIN EXTENDED DELETE FROM graft.plan_rl WHERE k >= 90")
      .collect()(0).getString(0)
    // the analyzer rewrote DELETE to a delta write (row-level route)…
    assert(plan.contains("WriteDelta"), plan)
    // …whose read is the V1 parquet scan (never a V2 BatchScan — the
    // swap rule fired on the rewritten read), with the DELETE
    // predicate pushed into it
    assert(plan.contains("Scan parquet") || plan.contains("FileScan"), plan)
    assert(!plan.contains("BatchScan"), plan)
    assert(plan.contains("GreaterThanOrEqual(k,90)"), plan)
    spark.sql("DROP TABLE graft.plan_rl")
  }

  test("native MERGE with NOT MATCHED BY SOURCE plans MergeRows + WriteDelta, joins stay equi") {
    spark.sql("DROP TABLE IF EXISTS graft.plan_mrg")
    spark.sql("""CREATE TABLE graft.plan_mrg (k BIGINT, v BIGINT)
      TBLPROPERTIES('key'='k')""")
    spark.sql("INSERT INTO graft.plan_mrg SELECT id, id FROM range(0, 100)")
    spark.sql("SELECT id AS k, id * 2 AS v FROM range(50, 150)")
      .createOrReplaceTempView("plan_mrg_src")
    val plan = spark.sql("""EXPLAIN EXTENDED
      MERGE INTO graft.plan_mrg AS t USING plan_mrg_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      .collect()(0).getString(0)
    assert(plan.contains("MergeRows"), plan)
    assert(plan.contains("WriteDelta"), plan)
    assert(!plan.contains("BatchScan"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    spark.sql("DROP TABLE graft.plan_mrg")
  }
}
