package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration this engine is
  * designed against, identical for local testing and (with a real
  * master) cluster deployment.
  */
object GraftSession {

  /** Builder pre-loaded with the engine's settings:
    *  - AQE on, with skew-join splitting and partition coalescing —
    *    the runtime re-plan layer the 100 TB design leans on;
    *  - shuffle partitions sized for the local harness (cores, not
    *    the 200 default — on a cluster, set to 2-3x total cores);
    *  - UTC session time zone (oracle parity);
    *  - nanos-as-long parquet reads (the events table);
    *  - graft SQL extensions (vec_dot et al.).
    */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // coalesce floor at 256kb. Round 19 lowered it globally from the
      // 1m default to 64kb so compute-dense stages over SMALL byte
      // footprints (shingle-array verify joins) kept their tasks, but
      // the measured r20 A/B showed that blanket floor taxes EVERY
      // small shuffle with 16x the tasks — q108 6.6->4.1 s, q132
      // 2.4->1.7, q80 and the whole catalog/DDL family 1.3-2x faster
      // with the floor raised. The stages that really need fine
      // partitions (q82's verify join, q196's levenshtein scoring) are
      // now pinned at their operators with explicit repartitions
      // (user-specified partition counts are exempt from AQE
      // coalescing) — byte-based coalescing cannot see compute
      // density, so no single floor serves both. 256kb measured equal
      // to 1m on the overhead-tax set and strictly gentler on the
      // compute-dense set. At cluster scale the floor barely binds —
      // the parallelismFirst target (bytes/parallelism) is far above
      // it on real inputs. Parameterised for A/B
      // (SPARK_GRAFT_AQE_MIN_PARTITION).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "256kb"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // runtime bloom-filter injection: a selective filter on one join
      // side becomes a bloom pre-filter on the other side's scan.
      // Applies to shuffle INNER/SEMI equi-joins only (the dedup
      // verify joins, candidate->payload fetches); Catalyst cannot
      // inject into anti-joins — pruning probe rows that miss the
      // filter would change anti semantics. Fires at cluster scale:
      // the application-side scan must exceed 10GB (default
      // threshold), so local plans show it only with thresholds
      // lowered (asserted in PlanAssertionsSpec).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // partition values stay strings (a date-typed partition column
      // would silently change the sync_runs.date schema on read-back)
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      // the graft TableCatalog: versioned tables by NAME (CREATE TABLE
      // graft.t / INSERT / MERGE / OPTIMIZE with no register() call).
      // The default root lives under the session's warehouse-dir
      // convention ($PWD/spark-warehouse), NOT a world-shared /tmp
      // path: two users on one host must not collide on CREATE TABLE,
      // and /tmp cleaners must not silently drop catalog tables.
      // Shared/cluster deployments set the root explicitly at the
      // shared warehouse prefix.
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.root", defaultCatalogRoot)
      .config("spark.ui.enabled", "false")

  /** Default graft-catalog root: under the process's warehouse-dir
    * convention ($PWD/spark-warehouse), never a world-shared /tmp
    * path — concurrent users/test runs on one host must not collide
    * on CREATE TABLE, and /tmp cleaners must not drop catalog tables.
    */
  def defaultCatalogRoot: String =
    new java.io.File("spark-warehouse/graft_catalog").getAbsolutePath

  /** RocksDB state store provider for stateful streaming at scale:
    * the default HDFS-backed provider keeps every key in executor
    * heap, so unbounded-key workloads (dedup over billions of ids,
    * wide sessionization) OOM before they spill. RocksDB keeps state
    * on local disk with a block-cache bound. Results are
    * provider-independent (asserted by RocksDbStateStoreSpec running
    * the streaming dedup + sessionize scenarios under both); the
    * default stays HDFS-backed for the state-light oracle runs.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def withRocksDbStateStore(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)

  def local(cores: Int): SparkSession = {
    val spark = builder(cores).master(s"local[$cores]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    muteBoundedWindowWarning()
    spark
  }

  /** Silence WindowExec's no-partition warning for this session.
    *
    * Every partitionless window in this engine is BOUNDED — k seed
    * rows after a limit(k) (kmeans / PQ codebooks / BM25 top-k),
    * calendar-day rows (CUSUM), or milestone-grid rows (vocabulary
    * growth) — and each site carries a `BOUNDED window` comment
    * saying why. The honest fix would be a constant partition key
    * stating the boundedness in the plan, but Spark 4's
    * `EliminateWindowPartitions` optimizer rule folds foldable
    * partition keys away, so the warning cannot be silenced
    * per-site. Corpus-sized single-partition windows remain a
    * design error here regardless of the warning: the shared
    * `globalRank`/`globalPrefixSum` two-phase discipline exists for
    * exactly that case, and the per-round plan audit greps every
    * partitionless window against its boundedness comment.
    */
  def muteBoundedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
