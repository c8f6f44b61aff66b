package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.operators.Similarity

/** The written IVF index (corpus partitioned by cluster_id) must turn
  * probe selection into parquet partition pruning: an nprobe=2 search
  * opens only the probed cluster directories, and returns exactly the
  * join-pruned ivfTopK results.
  */
class IvfIndexSpec extends SparkTestBase {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case qs: QueryStageExec => scans(qs.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  test("indexed IVF search prunes the corpus scan to probed clusters and matches ivfTopK") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val queries = emb.filter(col("vec_id") < 3)
    val idx = tmpDir("ivf_idx") + "/index"

    Similarity.ivfIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", idx)
    // one file per cluster directory (repartition by cluster_id)
    val allFiles = spark.read.parquet(idx).inputFiles.length
    assert(allFiles === 8, s"expected 8 one-file cluster partitions, got $allFiles")

    val indexed = Similarity.ivfTopKIndexed(spark, idx, queries, centroids,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
    val rows = indexed.collect() // drive the scan so metrics populate

    // the corpus scan read at most nQueries*nprobe (=6) of 8 cluster
    // files — and strictly fewer than the full index
    val scan = scans(indexed.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("index"))
    assert(scan.nonEmpty, "no FileSourceScan over the index found")
    val filesRead = scan.map(_.metrics("numFiles").value).max
    assert(filesRead < allFiles && filesRead <= 6,
      s"scan read $filesRead of $allFiles cluster files — not pruned")
    assert(scan.exists(_.partitionFilters.exists(_.toString.contains("cluster_id"))),
      "no partition filter on cluster_id")

    // identical results through the physically different plan
    val direct = Similarity.ivfTopK(queries, emb, centroids,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet === direct)
    assert(rows.nonEmpty)
  }

  test("a hot cluster splits into multiple files proportional to its size") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val queries = emb.filter(col("vec_id") < 3)
    val idx = tmpDir("ivf_salt") + "/index"

    // 500 vectors over 8 clusters; targetRowsPerFile=20 forces every
    // cluster with >20 members to salt-split
    Similarity.ivfIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", idx, targetRowsPerFile = 20L)

    val byCluster = spark.read.parquet(idx).inputFiles
      .groupBy(f => f.split("cluster_id=")(1).split("/")(0))
      .view.mapValues(_.length).toMap
    val clusterSizes = spark.read.parquet(idx)
      .groupBy(col("cluster_id")).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val hot = clusterSizes.maxBy(_._2)
    assert(hot._2 > 20, s"test premise: hot cluster has ${hot._2} rows")
    assert(byCluster(hot._1) > 1,
      s"hot cluster ${hot._1} (${hot._2} rows) wrote ${byCluster(hot._1)} file(s) — not salted")
    clusterSizes.foreach { case (c, n) =>
      val expect = math.ceil(n / 20.0).toInt
      assert(byCluster(c) <= expect,
        s"cluster $c: ${byCluster(c)} files for $n rows exceeds ceil(n/20)=$expect")
    }

    // pruning + results survive the salted layout
    val indexed = Similarity.ivfTopKIndexed(spark, idx, queries, centroids,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
    val rows = indexed.collect()
    val scan = scans(indexed.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("index"))
    assert(scan.exists(_.partitionFilters.exists(_.toString.contains("cluster_id"))),
      "no partition filter on cluster_id")
    val direct = Similarity.ivfTopK(queries, emb, centroids,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet === direct)
  }

  test("append places new vectors in existing cluster dirs; inventory equals full build") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val partial = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val incr = tmpDir("ivf_incr") + "/index"
    val full = tmpDir("ivf_full") + "/index"

    Similarity.ivfIndexWrite(partial, centroids, "vec_id", "embedding",
      "vec_id", "embedding", incr)
    Similarity.ivfIndexAppend(delta, centroids, "vec_id", "embedding",
      "vec_id", "embedding", incr)
    Similarity.ivfIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", full)

    def inventory(p: String) = spark.read.parquet(p)
      .groupBy(col("cluster_id")).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(inventory(incr) === inventory(full))
    // no new partition directories beyond the build's clusters
    val dirs = spark.read.parquet(incr).inputFiles
      .map(f => f.split("cluster_id=")(1).split("/")(0)).distinct.sorted
    assert(dirs.length <= 8)
    // appended ids are present exactly once
    val ids = spark.read.parquet(incr).groupBy(col("id")).count()
      .filter(col("count") > 1).count()
    assert(ids === 0L, "append duplicated ids")
  }

  test("IVF x PQ search prunes the index scan to probed clusters (IVFADC composition)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val queries = emb.filter(col("vec_id") < 3)
    val root = tmpDir("ivfpq_idx")

    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1, root)
    // completeness guard validates the stored geometry, not just
    // _SUCCESS markers: mismatched PQ parameters force a rebuild
    assert(Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    assert(!Similarity.ivfPqIndexComplete(spark, root, 8, 16, 8),
      "geometry-mismatched store passed the completeness check")
    // the partitioned layout survives the extra codes column
    val allFiles = spark.read.parquet(root + "/index").inputFiles.length
    assert(allFiles === 8, s"expected 8 one-file cluster partitions, got $allFiles")
    // stored codes are m=4 entries in [0, kCodes)
    val codes = spark.read.parquet(root + "/index")
      .select(col("codes")).head().getSeq[Long](0)
    assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 16),
      s"stored PQ codes malformed: $codes")

    val out = Similarity.ivfPqTopK(spark, root, queries,
      "vec_id", "embedding", k = 5, nprobe = 2, shortlistN = 20)
    val rows = out.collect()
    assert(rows.length === 15, s"expected 3 queries x 5 neighbors, got ${rows.length}")

    // the index scan opened at most nQueries*nprobe (=6) of 8 cluster
    // files — probe selection became a partition filter
    val scan = scans(out.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("index"))
    assert(scan.nonEmpty, "no FileSourceScan over the index found")
    val filesRead = scan.map(_.metrics("numFiles").value).max
    assert(filesRead < allFiles && filesRead <= 6,
      s"scan read $filesRead of $allFiles cluster files — not pruned")
    assert(scan.exists(_.partitionFilters.exists(_.toString.contains("cluster_id"))),
      "no partition filter on cluster_id")
    // the ADC branch reads codes WITHOUT the float vector column —
    // PQ's compression pays off only if the big column stays pruned
    val readSchemas = scan.map(_.metadata.getOrElse("ReadSchema", ""))
    assert(readSchemas.exists(rs => rs.contains("codes") && !rs.contains("v:")),
      s"no codes-only ADC scan found; ReadSchemas: $readSchemas")

    // ADC is a lower-bound screen, exact cosine the final order: each
    // query's list is sorted by (cosine desc, id asc) and self-free
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(r => (-r.getDouble(3), r.getLong(1)))
      assert(rs.toSeq === sorted.toSeq, s"query $q result not re-ranked by cosine")
      assert(!rs.exists(_.getLong(1) == q), s"query $q matched itself")
    }
  }

  test("IVFADC append encodes against the stored codebook; mismatched geometry refused") {
    import graft.operators.ProductQuantization
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val root = tmpDir("ivfpq_append")
    Similarity.ivfPqIndexWrite(base, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1, root)
    Similarity.ivfPqIndexAppend(spark, delta, "vec_id", "embedding",
      m = 4, kCodes = 16, subDim = 16, root)
    val idx = spark.read.parquet(root + "/index")
    // every id present exactly once after the append
    assert(idx.groupBy(col("id")).count().filter(col("count") > 1).count() === 0L)
    assert(idx.count() === emb.count())
    // appended codes = re-encoding the delta against the STORED codebook
    val cb = spark.read.parquet(root + "/codebook")
    val expected = ProductQuantization.assignCodes(
        ProductQuantization.subspaces(delta, "vec_id", "embedding", 4, 16), cb)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s("code")).as("codes"))
    val mismatches = idx.select(col("id"), col("codes"))
      .join(expected.withColumnRenamed("codes", "exp_codes"), Seq("id"))
      .filter(col("codes") =!= col("exp_codes")).count()
    assert(mismatches === 0L, "appended codes differ from stored-codebook encoding")
    // the geometry guard refuses an append under different PQ params
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexAppend(spark, delta, "vec_id", "embedding",
        m = 8, kCodes = 16, subDim = 8, root)
    }
  }

  test("IVFADC vacuum removes deleted vectors; untouched cluster files stay byte-identical") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val root = tmpDir("ivfpq_vac")
    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1, root)

    // delete two ids from ONE cluster so exactly one partition dir is affected
    val byCluster = spark.read.parquet(root + "/index")
      .select(col("cluster_id").cast("string").as("c"), col("id"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    val (victimCluster, victimIds) =
      byCluster.find { case (_, ids) => ids.length >= 3 && !ids.take(2).exists(_ < 3) }
        .map { case (c, ids) => (c, ids.filter(_ >= 3).take(2)) }.get

    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root + "/index"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = fileState()

    Similarity.ivfPqIndexVacuum(spark, victimIds.toSeq.toDF("vec_id"),
      "vec_id", m = 4, kCodes = 16, subDim = 16, root)

    // marker survives the swap; deleted ids are gone from the index
    assert(Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    assert(spark.read.parquet(root + "/index")
      .filter(col("id").isin(victimIds.toSeq: _*)).count() === 0L)
    // the stage dir was cleaned up
    assert(!new java.io.File(root + "/index_stage").exists())

    // untouched clusters: every file byte-identical (path, length, mtime);
    // the affected cluster's files were rewritten
    val after = fileState()
    val untouched = before.keys.filter(p => !p.contains(s"cluster_id=$victimCluster")
      && !p.endsWith("_SUCCESS"))
    untouched.foreach { p =>
      assert(after.get(p).contains(before(p)), s"untouched file changed: $p")
    }
    assert(before.keys.exists(p => p.contains(s"cluster_id=$victimCluster") &&
      !after.contains(p)), "affected cluster files were not rewritten")

    // search no longer returns the deleted ids, for a query probing that cluster
    val out = Similarity.ivfPqTopK(spark, root, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, nprobe = 8, shortlistN = 500)
    assert(!out.select("neighbor_id").as[Long].collect().toSet
      .exists(victimIds.contains), "vacuumed ids still reachable via search")

    // refusal: a marker-less (incomplete) store must not be vacuumed
    new java.io.File(s"$root/_GRAFT_STORE_COMPLETE").delete()
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexVacuum(spark, Seq(99L).toDF("vec_id"),
        "vec_id", m = 4, kCodes = 16, subDim = 16, root)
    }
  }

  test("IVFADC vacuum whose swap rename fails leaves the index incomplete (forced rebuild)") {
    import spark.implicits._
    // failrename:// refuses to move cluster_id=* dirs out of *_stage
    // parents — the silent swap failure; parquet committer renames
    // (src parent = task dir) are unaffected, so staging still works
    spark.sparkContext.hadoopConfiguration.set(
      "fs.failrename.impl", classOf[FailRenameFileSystem].getName)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val root = "failrename://" + tmpDir("ivfpq_vac_failswap")
    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1, root)
    assert(Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    val e = intercept[java.io.IOException] {
      Similarity.ivfPqIndexVacuum(spark, Seq(11L).toDF("vec_id"),
        "vec_id", m = 4, kCodes = 16, subDim = 16, root)
    }
    assert(e.getMessage.contains("rename"))
    // marker dropped before the swap, never republished: the index
    // reads as incomplete and only a rebuild brings it back
    assert(!Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexVacuum(spark, Seq(12L).toDF("vec_id"),
        "vec_id", m = 4, kCodes = 16, subDim = 16, root)
    }
  }

  test("IVFADC rebalance preserves content exactly; codes carried over; residual refused") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val root = tmpDir("ivfpq_rebalance")
    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1,
      root, targetRowsPerFile = 256L)
    val before = spark.read.parquet(s"$root/index")
      .select(col("id"), col("codes")).as[(Long, Seq[Long])]
      .collect().sortBy(_._1).toSeq
    // full-probe search before, as content ground truth
    val fullBefore = Similarity.ivfPqTopK(spark, root,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        k = 5, nprobe = 8, shortlistN = 999)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().sorted.toSeq

    Similarity.ivfPqIndexRebalance(spark, kClusters = 8, kmIters = 1,
      m = 4, kCodes = 16, subDim = 16, root, targetRowsPerFile = 256L)

    assert(Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    // every (id, codes) row survives byte-for-byte: rebalance moves
    // rows between clusters but NEVER re-encodes
    val after = spark.read.parquet(s"$root/index")
      .select(col("id"), col("codes")).as[(Long, Seq[Long])]
      .collect().sortBy(_._1).toSeq
    assert(after === before, "rebalance changed ids or codes")
    // staging dirs are gone; centroids are the retrained ones (doubles)
    assert(!new java.io.File(s"$root/index_stage").exists())
    assert(!new java.io.File(s"$root/centroids_stage").exists())
    // full-probe search equals pre-rebalance: layout changed, content identical
    val fullAfter = Similarity.ivfPqTopK(spark, root,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        k = 5, nprobe = 8, shortlistN = 999)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(fullAfter === fullBefore, "rebalance changed full-probe results")

    // residual stores are refused: their codes quantize against the
    // centroids being replaced
    val resRoot = tmpDir("ivfpq_rebalance_residual")
    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1,
      resRoot, residual = true)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexRebalance(spark, kClusters = 8, kmIters = 1,
        m = 4, kCodes = 16, subDim = 16, resRoot)
    }
  }

  test("IVFADC rebalance whose swap fails leaves the index incomplete (forced rebuild)") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.set(
      "fs.failrename.impl", classOf[FailRenameFileSystem].getName)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = "failrename://" + tmpDir("ivfpq_rb_failswap")
    Similarity.ivfPqIndexWrite(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", "vec_id", "embedding",
      m = 4, kCodes = 16, subDim = 16, iters = 1, root)
    assert(Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    val e = intercept[java.io.IOException] {
      Similarity.ivfPqIndexRebalance(spark, kClusters = 8, kmIters = 1,
        m = 4, kCodes = 16, subDim = 16, root)
    }
    assert(e.getMessage.contains("rename"))
    // marker dropped before the swap, never republished
    assert(!Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
  }

  test("residual and raw IVFADC stores are mutually invalid; residual append re-encodes residuals") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") < 8)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val root = tmpDir("ivfpq_residual")
    Similarity.ivfPqIndexWrite(base, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1,
      root, residual = true)
    // the marker distinguishes the coding: residual codes decoded as
    // raw codes (or vice versa) would be silent garbage, so a store
    // built under one coding must read as incomplete under the other
    assert(Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16, residual = true))
    assert(!Similarity.ivfPqIndexComplete(spark, root, 4, 16, 16))
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexAppend(spark, delta, "vec_id", "embedding",
        m = 4, kCodes = 16, subDim = 16, root) // raw append onto residual store
    }
    // residual append: the streamed-in delta is searchable, and the
    // whole index equals a residual full rebuild row-for-row
    Similarity.ivfPqIndexAppend(spark, delta, "vec_id", "embedding",
      m = 4, kCodes = 16, subDim = 16, root, residual = true)
    val appended = Similarity.ivfPqTopK(spark, root,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nprobe = 2, shortlistN = 20, residual = true)
    val rebuiltRoot = tmpDir("ivfpq_residual_rebuild")
    Similarity.ivfPqIndexWrite(emb, centroids, "vec_id", "embedding",
      "vec_id", "embedding", m = 4, kCodes = 16, subDim = 16, iters = 1,
      rebuiltRoot, residual = true)
    val rebuilt = Similarity.ivfPqTopK(spark, rebuiltRoot,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nprobe = 2, shortlistN = 20, residual = true)
    // NOTE: codebooks differ (trained on base vs full corpus), so
    // only compare when training corpora match — here they do not;
    // instead prove the append against ITS OWN store's re-encoding
    val cb = spark.read.parquet(root + "/codebook")
    val cents = spark.read.parquet(root + "/centroids")
    import graft.operators.ProductQuantization
    val rv = Similarity.residualVectors(delta, cents,
      "vec_id", "embedding", "centroid_id", "cv")
    val expected = ProductQuantization.assignCodes(
        ProductQuantization.subspaces(rv, "id", "rv", 4, 16), cb)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s("code")).as("codes"))
    val idx = spark.read.parquet(root + "/index")
    val mismatches = idx.select(col("id"), col("codes"))
      .join(expected.withColumnRenamed("codes", "exp_codes"), Seq("id"))
      .filter(col("codes") =!= col("exp_codes")).count()
    assert(mismatches === 0L,
      "appended residual codes differ from stored-codebook residual encoding")
    // both searches return k rows per query regardless
    assert(appended.groupBy(col("query_id")).count()
      .filter(col("count") =!= 5).count() === 0L)
    assert(rebuilt.groupBy(col("query_id")).count()
      .filter(col("count") =!= 5).count() === 0L)
  }
}
