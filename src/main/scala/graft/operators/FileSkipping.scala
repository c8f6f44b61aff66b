package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit file-level zone maps — the manifest-style data skipping
  * layer (Delta add-file stats, Iceberg manifest min/max) on plain
  * parquet directories. q66/Layout already gets ROW-GROUP skipping
  * from parquet footers, but every footer must still be opened; a
  * zone-map catalog moves the min/max one level up, so a range query
  * against a 100k-file table opens only the files whose range
  * overlaps — the other 99k are never listed into the scan at all.
  *
  * The catalog is one row per file (path, min, max, count): the same
  * order of magnitude as the filesystem listing every query already
  * pays for, so collecting the matching paths onto the driver is the
  * bounded catalog lookup every table format does, not a data
  * collect.
  */
object FileSkipping {

  /** Build the zone map for one column of a parquet directory: one
    * row per file. One full scan — amortized over every later pruned
    * read, exactly like any index build (q42/q81 pattern). The scan
    * reads only `column` (plus file names from split metadata), so
    * the build cost is one column's bytes, not the table's.
    */
  def fileStats(spark: SparkSession, path: String, column: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("min_v"), max(col(column)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** The catalog lookup: paths of files whose [min_v, max_v] range
    * overlaps [lo, hi]. Driver-side by design (bounded by file count).
    */
  def overlappingFiles(stats: DataFrame, lo: Column, hi: Column): Seq[String] =
    stats.filter(col("min_v") <= hi && col("max_v") >= lo)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Read only the overlapping files. Callers still apply the exact
    * row predicate — zone maps are conservative (a file overlapping
    * the range can hold out-of-range rows); pruning is a physical
    * optimization, never a semantic filter. An empty overlap returns
    * an empty frame with the table's schema.
    */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
      lo: Column, hi: Column): DataFrame = {
    val files = overlappingFiles(stats, lo, hi)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*)
  }

  /** AUTOMATIC zone-map reads on plain parquet directories — the
    * [[prunedRead]] contract with the caller-supplied bounds deleted,
    * by the same optimizer integration the versioned table's
    * `readAtAuto` rides: the returned frame's scan carries the
    * catalog's per-FILE min/max as a read option (file-grain roots,
    * one per catalog row), and any `.filter` the caller composes on
    * top is folded into file pruning at optimize time by
    * `graft.plans.VersionedStatsPruning`. Multiple columns' catalogs
    * compose — pass several (column, fileStats) pairs and each
    * filter column prunes independently.
    *
    * Integral-typed columns only (the rule's stats domain; values are
    * recorded cast to long). The driver-side collect is the catalog
    * lookup every table format pays — one row per file, never data.
    */
  def taggedRead(spark: SparkSession, path: String,
      colStats: (String, DataFrame)*): DataFrame = {
    require(colStats.nonEmpty, "taggedRead needs at least one catalog")
    val perFile = scala.collection.mutable.LinkedHashMap.empty[String, String]
    colStats.foreach { case (c, stats) =>
      require(!c.exists(";:".contains(_)),
        s"column name $c would corrupt the stats grammar")
      stats.select(col("file"),
          col("min_v").cast("long"), col("max_v").cast("long"))
        .collect().foreach { r =>
          if (!r.isNullAt(1) && !r.isNullAt(2)) {
            val f = r.getString(0)
            perFile(f) = perFile.getOrElse(f, "") +
              s";$c:${r.getLong(1)}:${r.getLong(2)}"
          }
        }
    }
    val files = perFile.keys.toSeq
    // keys are full file URIs; the rule matches roots by suffix, and
    // a file IS its own root here, so the basename suffices
    val lines = graft.plans.VersionedStatsPruning.encode(
      perFile.toSeq.map { case (f, stats) =>
        f.substring(f.lastIndexOf('/') + 1) -> stats
      })
    spark.read
      .option(graft.plans.VersionedStatsPruning.StatsOption, lines)
      .parquet(files: _*)
  }

  /** Per-file Bloom catalog — the POINT-LOOKUP twin of [[fileStats]].
    * Zone maps prune range queries on range-clustered layouts; on a
    * hash-distributed layout every file's [min, max] spans the whole
    * key domain and min/max pruning degenerates to a full read. A
    * per-file Bloom filter (here k = 2 seeded xxhash64 lanes over m
    * bits, stored as the sorted set bit list) prunes point lookups on
    * exactly those layouts — the Delta bloom-filter-index /
    * Parquet-bloom shape, lifted to the file level so non-matching
    * files are never opened at all.
    *
    * Catalog size: one row per file, <= min(m, 2·n_distinct) ints of
    * bit positions — bounded by bits/32 KB per file regardless of row
    * count. The build is one scan of the key column.
    */
  def bloomFileStats(spark: SparkSession, path: String, column: String,
      bits: Int = 1 << 16): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(column).as("v"))
      .select(col("file"), explode(bloomBits(col("v"), bits)).as("bit"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("bit"))).as("bits"))

  /** The two Bloom lanes of one key: seeded xxhash64 positions in
    * [0, bits). Seeding by hashing (v, laneId) keeps both engines of
    * the build/probe pair inside Spark's own hash — probe-time
    * constants fold at plan time for literal keys.
    */
  private[operators] def bloomBits(v: Column, bits: Int): Column =
    array(pmod(xxhash64(v, lit(1)), lit(bits.toLong)),
      pmod(xxhash64(v, lit(2)), lit(bits.toLong)))

  /** [[bloomBits]] over a COMPOSITE value: the two lanes hash the
    * whole column tuple (xxhash64 is variadic; the lane seed rides as
    * the last argument, exactly like the single-column form — which
    * is the one-element special case). Build and probe must pass the
    * components in the SAME order; callers canonicalize by sorting
    * the component names.
    */
  private[operators] def bloomBitsMulti(vs: Seq[Column], bits: Int): Column =
    array(pmod(xxhash64((vs :+ lit(1)): _*), lit(bits.toLong)),
      pmod(xxhash64((vs :+ lit(2)): _*), lit(bits.toLong)))

  /** Files that MIGHT contain any of `keys`: both Bloom lanes of at
    * least one key are set. Superset of the true file set (no false
    * negatives by construction); false positives cost an extra file
    * read and are removed by the exact row filter that follows.
    * Driver-side by design — bounded by file count, like
    * [[overlappingFiles]].
    */
  def bloomCandidateFiles(stats: DataFrame, keys: Seq[Long],
      bits: Int = 1 << 16): Seq[String] = {
    require(keys.nonEmpty, "bloom probe needs at least one key")
    val hit = keys.map { k =>
      val b = bloomBits(lit(k), bits)
      array_contains(col("bits"), b.getItem(0)) &&
        array_contains(col("bits"), b.getItem(1))
    }.reduce(_ || _)
    stats.filter(hit).select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Batch point lookup through the Bloom catalog: read only
    * candidate files, then apply the exact key filter (which also
    * removes Bloom false positives). `keys` is the caller's lookup
    * batch — query input, bounded by construction.
    */
  def bloomPointRead(spark: SparkSession, path: String, stats: DataFrame,
      column: String, keys: Seq[Long], bits: Int = 1 << 16): DataFrame = {
    val files = bloomCandidateFiles(stats, keys, bits)
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(column).isin(keys: _*))
  }
}
