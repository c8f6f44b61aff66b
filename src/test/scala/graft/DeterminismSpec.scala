package graft

/** Layout-independence sweep: the driver's oracle gate runs each query
  * under ONE partition layout, so it cannot catch results that depend
  * on shuffle width, partial-aggregation grouping, or task order. The
  * engine's determinism claims (md5-keyed sampling, min-struct
  * canonical selection, floor-grid rounding, bounded-heap top-k with
  * total-order ties) all imply a stronger property: identical ROWS
  * under any shuffle width. This sweep asserts it for a
  * representative query from each family.
  */
class DeterminismSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // one representative per family: exact dedup, LSH (capped), iterative
  // components, distributed histogram, canonical selection, mix,
  // winnowing, entropy, rank fusion
  private val names = Seq(
    "q20_dedup_exact",
    "q22_dedup_minhash_lsh",
    "q47_dedup_components_largestar",
    "q90_histogram_depth",
    "q107_keep_best_canonical",
    "q114_temperature_mix",
    "q117_winnowing_fingerprints",
    "q118_char_entropy",
    "q121_hybrid_rrf")

  private def rows(name: String, parts: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      spark.catalog.clearCache()
    }
  }

  for (n <- names)
    test(s"$n: identical rows at shuffle widths 5 and 17") {
      assert(rows(n, 5) === rows(n, 17))
    }
}
