package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Multimodal}
import graft.functions.{TextFunctions => T}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
    (3L, "completely different content with unrelated words here now"),
    (4L, "the quick brown fox jumps over the lazy dog today"))    // exact dup of 1
    .toDF("doc_id", "text")

  test("exact groups collapse identical text") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() === 3)
    assert(g.filter(col("n_copies") === 2).head().getAs[Long]("canonical_id") === 1L)
  }

  test("minhash LSH finds the pairs exact jaccard finds (high threshold)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 4, 4, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // LSH candidates are a subset of all pairs; after the exact verify
    // step, every reported pair is a true pair.
    assert(lsh.subsetOf(exact))
    // the exact dup pair must always survive banding (identical sigs)
    assert(lsh.contains((1L, 4L)))
    assert(exact.contains((1L, 2L))) // near-dup found by exact
  }

  test("sorted-neighborhood finds same-prefix near-dups, misses cross-prefix ones, no Window planned") {
    // 1-2: near-dups sharing the normalized prefix -> adjacent ranks.
    // 9: a TRUE content near-dup of 1 whose first word sorts it past
    // the m-prefixed fillers -> outside the window, reported by q21's
    // content blocking but NOT here. That asymmetry is SNM semantics.
    val snm = Seq(
      (1L, "alpha alpha common text here one"),
      (2L, "alpha alpha common text here two"),
      (3L, "m01 walrus quartz banjo lantern pepper"),
      (4L, "m02 orbit velvet crayon thunder maple"),
      (5L, "m03 ginger falcon marble tunnel spice"),
      (6L, "m04 copper wizard saddle prism nutmeg"),
      (7L, "m05 hazel rocket mirror canyon tulip"),
      (8L, "m06 ember salmon drizzle pocket quill"),
      (9L, "zeta alpha common text here one"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(snm, "doc_id", "text",
      n = 3, window = 4, threshold = 0.5, numPartitions = 3)
    val got = pairs.select("id1", "id2", "rank_dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L)))
    assert(!pairs.queryExecution.executedPlan.toString.contains("Window"),
      "SNM rank must come from prefix offsets, not a global Window sort")
    // content blocking DOES find the cross-prefix pair — the recall
    // gap a second SNM pass with a different key would close
    val content = Dedup.ngramJaccardPairs(snm, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(content.contains((1L, 9L)))
    // partition-count invariance: ranks are a function of the total
    // order alone, so the pair set must not depend on the layout
    val got1 = Dedup.sortedNeighborhoodPairs(snm, "doc_id", "text",
      n = 3, window = 4, threshold = 0.5, numPartitions = 1)
      .select("id1", "id2", "rank_dist").as[(Long, Long, Long)].collect().toSet
    assert(got1 === got)
  }

  test("multi-pass SNM recovers the cross-prefix near-dup via the reversed key") {
    val snm = Seq(
      (1L, "alpha alpha common text here one"),
      (2L, "alpha alpha common text here two"),
      (3L, "m01 walrus quartz banjo lantern pepper"),
      (4L, "m02 orbit velvet crayon thunder maple"),
      (5L, "m03 ginger falcon marble tunnel spice"),
      (6L, "m04 copper wizard saddle prism nutmeg"),
      (7L, "m05 hazel rocket mirror canyon tulip"),
      (8L, "m06 ember salmon drizzle pocket quill"),
      (9L, "zeta alpha common text here one"))
      .toDF("doc_id", "text")
    val norm = Dedup.snmNormalized(col("text"))
    val multi = Dedup.sortedNeighborhoodMultiPass(snm, "doc_id", "text",
      n = 3, window = 4, threshold = 0.5,
      sortKeys = Seq(substring(norm, 1, 16), substring(reverse(norm), 1, 16)),
      numPartitions = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // pass 1 (prefix) finds (1,2); only pass 2 (reversed = suffix
    // blocking) can neighbor 1 and 9, whose difference is the FIRST word
    assert(multi === Set((1L, 2L), (1L, 9L)))
  }

  test("signature-store search equals the in-memory cross-corpus dedup, corpus never re-tokenized") {
    val store = tmpDir("sig_store")
    val newBatch = docs.filter(col("doc_id") === 4)
    val corpus = docs.filter(col("doc_id") =!= 4)
    Dedup.signatureStoreWrite(corpus, "doc_id", "text", 3, 4, 4, store)
    assert(new java.io.File(s"$store/shingles/_SUCCESS").exists())
    assert(new java.io.File(s"$store/bands/_SUCCESS").exists())
    val inMem = Dedup.minhashLshPairsAcross(newBatch, corpus,
      "doc_id", "text", 3, 4, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val stored = Dedup.minhashLshPairsAgainstStore(newBatch, store,
      "doc_id", "text", 3, 4, 4, 0.5)
    val got = stored.as[(Long, Long, Double)].collect().toSet
    assert(got === inMem)
    assert(got.map(p => (p._1, p._2)) === Set((4L, 1L))) // exact dup of doc 1
    // the search reads the stored signatures: both parquet scans in
    // the plan point at the store — the corpus table appears nowhere,
    // so nothing re-tokenizes it
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(qs.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(f.metadata.getOrElse("Location", ""))
      case other => other.children.flatMap(scans)
    }
    val locs = scans(stored.queryExecution.executedPlan)
    assert(locs.nonEmpty && locs.forall(_.contains("sig_store")), locs.toString)
  }

  test("streaming micro-batch dedup against the store equals the batch run") {
    val store = tmpDir("sig_store_stream")
    val corpus = docs.filter(col("doc_id") <= 3)
    Dedup.signatureStoreWrite(corpus, "doc_id", "text", 3, 4, 4, store)
    // two arrival files -> micro-batches via maxFilesPerTrigger=1
    val arrivals = tmpDir("arrivals")
    val newA = Seq((4L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val newB = Seq((5L, "completely different content with unrelated words here now"))
      .toDF("doc_id", "text")
    newA.coalesce(1).write.parquet(s"$arrivals/batchA")
    newB.coalesce(1).write.parquet(s"$arrivals/batchB")
    val stream = spark.readStream
      .schema(newA.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(arrivals)
    val acc = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = graft.streaming.EventStreams.dedupAgainstStoreStreaming(
      stream, store, "doc_id", "text", 3, 4, 4, 0.5) { pairs =>
      acc.synchronized { acc ++= pairs.as[(Long, Long, Double)].collect() }
    }
    q.awaitTermination()
    val batchEquivalent = Dedup.minhashLshPairsAgainstStore(
      newA.unionByName(newB), store, "doc_id", "text", 3, 4, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(acc.toSet === batchEquivalent)
    // doc 4 duplicates stored doc 1; doc 5 duplicates stored doc 3 —
    // each found in its own micro-batch
    assert(acc.map(p => (p._1, p._2)) === Set((4L, 1L), (5L, 3L)))
  }

  test("signature-store append: the next batch dedupes against admitted docs too") {
    val store = tmpDir("sig_store_append")
    // initial corpus: docs 1-3
    Dedup.signatureStoreWrite(docs.filter(col("doc_id") <= 3),
      "doc_id", "text", 3, 4, 4, store)
    // batch 1: doc 4 (dup of stored doc 1) — found, then ADMITTED
    val batch1 = docs.filter(col("doc_id") === 4)
    val found1 = Dedup.minhashLshPairsAgainstStore(batch1, store,
      "doc_id", "text", 3, 4, 4, 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(found1 === Set((4L, 1L)))
    Dedup.signatureStoreAppend(batch1, "doc_id", "text", 3, 4, 4, store)
    // batch 2: doc 6 duplicates the ADMITTED doc 4's text — the grown
    // store must surface both the original and the admitted copy
    val batch2 = Seq((6L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val found2 = Dedup.minhashLshPairsAgainstStore(batch2, store,
      "doc_id", "text", 3, 4, 4, 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(found2 === Set((6L, 1L), (6L, 4L)))
  }

  test("ngram jaccard df-cap drops stop-shingle postings") {
    // docs 1/2/4 share the 8-shingle boilerplate prefix, so those
    // shingles have df=3; doc pairs among them rely on that prefix
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // default cap (1000) changes nothing
    val defaulted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxDf = 1000)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(defaulted === uncapped && uncapped.nonEmpty)
    // maxDf=2 drops the df-3 boilerplate shingles: pair (1,2) loses
    // every shared shingle (no candidate row at all) and pair (1,4)
    // keeps only the df-2 tail shingle, undercounting inter to 1 so
    // its jaccard falls below threshold — the documented one-sided
    // approximation: capping only ever LOSES pairs, never invents them
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxDf = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped.isEmpty)
    assert(uncapped === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("prefix-filtered jaccard pairs equal the full posting-list pairs") {
    // the toy docs, plus the real corpus slice: identical (id1, id2,
    // jaccard) triples through the linear-class candidate stage
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    for (d <- Seq(docs, corpus)) {
      val full = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.ngramJaccardPrefixPairs(d, "doc_id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref === full)
    }
  }

  test("prefix filter keeps corpus-wide stop-shingles out of posting lists") {
    // every doc shares the stop-shingle run "x x x"; true similar pair
    // is (1, 2) only. The full path needs a df cap to survive this
    // shape; the prefix path never indexes the stop-shingle at all.
    val boiler = Seq(
      (1L, "x x x alpha beta gamma delta"),
      (2L, "x x x alpha beta gamma epsilon"),
      (3L, "x x x totally different words qrs"),
      (4L, "x x x unrelated other content tuv"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPrefixPairs(boiler, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhash bucketed pairs equal the cross-join version") {
    val brute = Dedup.simhashPairs(docs, "doc_id", "text", 3, 12)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val bucketed = Dedup.simhashBucketedPairs(docs, "doc_id", "text", 3, 12)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(bucketed === brute)
    assert(brute.exists { case (a, b, h) => a == 1 && b == 4 && h == 0 })
  }

  test("simhash multi-index pairs equal the cross-join version at radius 12") {
    val brute = Dedup.simhashPairs(docs, "doc_id", "text", 3, 12)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val mih = Dedup.simhashMihPairs(docs, "doc_id", "text", 3, 12, chunks = 4)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(mih === brute)
  }

  test("simhash MIH candidate stage is an equi-join, not a nested loop") {
    val plan = Dedup.simhashMihPairs(docs, "doc_id", "text", 3, 12, chunks = 4)
      .queryExecution.executedPlan.toString
    // the only nested-loop-ish node allowed is the broadcast of the
    // bounded mask table; the pair join itself must be hash-keyed
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), "no hash/merge pair join found")
  }

  test("brute-force topk is deterministic and self-excluding") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.01f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", 2)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(top === Seq(3L, 1L))
  }

  test("ivf assignment picks the nearest centroid") {
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.1f, 0.2f)), (3L, Seq(9.5f, 10.2f)))
      .toDF("vec_id", "embedding")
    val assign = Similarity.ivfAssign(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", "vec_id", "embedding")
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(assign(2L) === 0L && assign(3L) === 1L)
    assert(assign(0L) === 0L && assign(1L) === 1L)
  }

  test("char entropy: zero for repeated filler, exact bits for uniform alphabets") {
    import graft.functions.{QualityFunctions => Q}
    val e = Seq((1L, "aaaaaaaa"), (2L, "abababab"), (3L, "abcdabcd"), (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Q.charEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(e(1L) === 0.0) // single symbol: -0.0 must normalize to +0.0
    assert(e(2L) === 1.0) // two uniform symbols = exactly 1 bit
    assert(e(3L) === 2.0) // four uniform symbols = exactly 2 bits
    assert(e(4L) === 0.0) // empty text
  }

  test("winnowing fingerprints: shared runs collide and survive content shifts") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val shifted = "xx yy " + base // front insertion shifts every gram position
    val other = "one two three four five six seven eight nine ten"
    val fps = Dedup.winnowedFingerprints(
      Seq((1L, base), (2L, shifted), (3L, other)).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // the winnowing guarantee: doc2 contains doc1 verbatim, so every
    // doc1 window recurs in doc2 — its fingerprints survive the shift
    assert(fps(1L).subsetOf(fps(2L)), s"${fps(1L)} not within ${fps(2L)}")
    assert((fps(1L) intersect fps(3L)).isEmpty, "unrelated docs must not collide")
    // selection is sparse: fewer fingerprints than grams (8 grams here)
    assert(fps(1L).size < 8)
    // short doc (< window grams) still yields its global-min fingerprint
    val short = Dedup.winnowedFingerprints(
      Seq((9L, "tiny little doc here")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect()
    assert(short.length === 1)
  }

  test("semantic dedup drops within-cluster near-dups, keeps the min-id canonical") {
    // cluster A near (0,10): ids 10, 11 nearly parallel (near-dups),
    // id 12 well-separated in angle; cluster B near (10,0): id 20
    // angled away from the centroid member so nothing else collides
    val emb = Seq(
      (0L, Seq(0.0f, 10.0f)),   // centroid A (cos to 10 = 0.936)
      (1L, Seq(10.0f, 0.0f)),   // centroid B (cos to 20 = 0.976)
      (10L, Seq(3.0f, 8.0f)),
      (11L, Seq(3.05f, 8.1f)),  // near-dup of 10, larger id -> dropped
      (12L, Seq(6.0f, 8.0f)),   // cluster A, cos to 10/11 ~ 0.96
      (20L, Seq(9.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", "vec_id", "embedding", threshold = 0.995)
      .select("id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(out(10L) === true)
    assert(out(11L) === false) // the only near-dup with a smaller-id mate
    assert(out(12L) === true)  // same cluster, below threshold
    assert(out(20L) === true)  // different cluster
    assert(out(0L) === true && out(1L) === true)
  }

  test("real PNG decode round-trips the test pattern pixel-exactly") {
    val ids = Seq(1L, 2L, 5L).toDF("doc_id")
    val decoded = Multimodal.decodeFrames(Multimodal.syntheticClips(ids)).collect()
    assert(decoded.map(_.doc_id).distinct.sorted === Array(1L, 2L, 5L))
    assert(decoded.length === Seq(1L, 2L, 5L).map(id => Multimodal.clipDims(id)._3).sum)
    decoded.foreach { d =>
      val (w, h, nf) = Multimodal.clipDims(d.doc_id)
      assert(d.width === w && d.height === h && d.n_frames === nf)
      // every pixel of the decoded raster equals the generator pattern:
      // proves the PNG bytes went through a real codec round-trip
      for (y <- 0 until h; x <- 0 until w)
        assert((d.pixels(y * w + x) & 0xff) ===
          Multimodal.patternPixel(d.doc_id, d.frame_idx, x, y))
    }
  }

  test("nearest-neighbor resize samples the expected source pixels") {
    val dec = Multimodal.decodeFrames(Multimodal.syntheticClips(Seq(3L).toDF("doc_id")))
    val rs = Multimodal.resizeNearest(dec, 64, 64).collect()
    val (w, h, nf) = Multimodal.clipDims(3L)
    assert(rs.length === nf)
    rs.foreach { r =>
      var acc = 1125899906842597L
      for (i <- 0 until 64) {
        val sx = (i % 64) * w / 64
        val sy = ((i * 37) % 64) * h / 64
        acc = acc * 31L + Multimodal.patternPixel(3L, r.frame_idx, sx, sy)
      }
      assert(r.resized_digest === acc)
      assert(r.scale_x_bp === 640000L / w && r.scale_y_bp === 640000L / h)
    }
  }

  test("frame sampling keeps every 2nd frame") {
    // doc_id 2 -> 3 frames; stride 2 keeps frames 0 and 2
    val dec = Multimodal.decodeFrames(Multimodal.syntheticClips(Seq(2L).toDF("doc_id")))
    val kept = Multimodal.frameSample(dec, 2).collect().map(_.frame_idx).sorted
    assert(kept === Array(0, 2))
  }

  test("audio fingerprint matches the hand-computed energy-delta bits") {
    // replay the sawtooth contract for doc 7: windows of 32 samples
    // every 16, integer mean square, sign-of-delta bits
    val (n, _) = Multimodal.audioDims(7L)
    val samples = (0 until n).map(i => Multimodal.pcmSample(7L, i))
    val ms = (0 to 12).map { f =>
      samples.slice(f * 16, f * 16 + 32).map(v => v.toLong * v).sum / 32
    }
    var expected = 0L
    (0 until 12).foreach(b => if (ms(b + 1) > ms(b)) expected |= 1L << b)
    val got = Multimodal.audioFingerprints(
      Multimodal.decodeWavFrames(
        Multimodal.syntheticWavs(Seq(7L).toDF("doc_id")),
        window = 32, stride = 16),
      bits = 12).head().getLong(1)
    assert(got === expected,
      "decoded-PCM fingerprint differs from the formula-replayed bits")
  }

  test("aHash matches the hand-computed pattern hash; bucketed pairs equal exhaustive") {
    // hand-replay the 8x8 mean-threshold hash for doc 5, frame 0
    val (w, h, _) = Multimodal.clipDims(5L)
    val samples = (0 until 64).map { k =>
      Multimodal.patternPixel(5L, 0, (k % 8) * w / 8, (k / 8) * h / 8)
    }
    val tot = samples.sum
    val expected = new Array[Long](4)
    samples.zipWithIndex.foreach { case (s, k) =>
      if (s * 64 >= tot) expected(k / 16) |= 1L << (k % 16)
    }
    val hashed = Multimodal.perceptualHashes(Multimodal.decodeFrames(
        Multimodal.syntheticClips(Seq(5L).toDF("doc_id"))))
      .filter(col("frame_idx") === 0).head()
    assert(Seq(hashed.c0, hashed.c1, hashed.c2, hashed.c3) === expected.toSeq,
      "decoded-raster aHash differs from the pattern-formula hash")

    // pigeonhole recall proof: bucketed pairs == exhaustive cross-compare
    val ids = (0L until 60L).toDF("doc_id")
    val hashes = Multimodal.perceptualHashes(Multimodal.decodeFrames(
      Multimodal.syntheticClips(ids))).toDF().cache()
    val bucketed = Multimodal.perceptualNearDupPairs(hashes, maxHamming = 3)
      .select("id1", "frame1", "id2", "frame2").collect().map(_.toSeq).toSet
    val a = hashes.select(col("doc_id").as("id1"), col("frame_idx").as("frame1"),
      col("c0").as("a0"), col("c1").as("a1"), col("c2").as("a2"), col("c3").as("a3"))
    val b = hashes.select(col("doc_id").as("id2"), col("frame_idx").as("frame2"),
      col("c0").as("b0"), col("c1").as("b1"), col("c2").as("b2"), col("c3").as("b3"))
    val ham = (0 until 4).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"b$i")))).reduce(_ + _)
    val exhaustive = a.crossJoin(b)
      .filter(col("id1") < col("id2") ||
        (col("id1") === col("id2") && col("frame1") < col("frame2")))
      .filter(ham <= 3)
      .select("id1", "frame1", "id2", "frame2").collect().map(_.toSeq).toSet
    assert(bucketed === exhaustive,
      s"bucketed pairs missed ${(exhaustive -- bucketed).size} / gained ${(bucketed -- exhaustive).size}")
    assert(exhaustive.nonEmpty, "fixture produced no near-dup pairs to verify")
  }

  test("signature store marker validates build parameters as a unit") {
    val store = tmpDir("sig_store_params")
    Dedup.signatureStoreWrite(docs, "doc_id", "text", 3, 4, 4, store)
    assert(Dedup.signatureStoreComplete(store, 3, 4, 4))
    // same path, different geometry: the marker refuses, forcing a rebuild
    assert(!Dedup.signatureStoreComplete(store, 3, 8, 2))
    intercept[IllegalArgumentException] {
      Dedup.signatureStoreAppend(docs, "doc_id", "text", 3, 8, 2, store)
    }
    // per-table _SUCCESS alone is not enough: no store marker -> incomplete
    new java.io.File(s"$store/_GRAFT_STORE_COMPLETE").delete()
    assert(!Dedup.signatureStoreComplete(store, 3, 4, 4))
  }

  test("LSH hot-band cap bounds degenerate band buckets and reports them via the observed metric") {
    // 20 identical boilerplate docs: every band bucket they share has
    // df=20 — the degenerate stop-signature case. Plus one identical
    // pair of distinct text whose buckets have df=2 and must survive.
    val boiler = (1L to 20L).map(i => (i, "the same boilerplate text repeated everywhere always"))
    val pair = Seq((100L, "genuinely rare content alpha beta gamma"),
      (101L, "genuinely rare content alpha beta gamma"))
    val corpus = (boiler ++ pair).toDF("doc_id", "text")
    var observed: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("lsh_band_cap").foreach { row =>
          observed = Some((row.getAs[Long]("dropped_band_rows"), row.getAs[Long]("max_band_df_seen")))
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 4, threshold = 0.5, maxBandDf = 8)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      // boilerplate candidates (df=20 buckets) are capped away; the
      // rare identical pair (df=2 buckets) survives
      assert(pairs === Set((100L, 101L)))
      val deadline = System.currentTimeMillis() + 5000
      while (observed.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(observed.exists(_._1 > 0), s"expected dropped_band_rows > 0, got $observed")
      assert(observed.exists(_._2 === 20L), s"expected max_band_df_seen = 20, got $observed")
    } finally spark.listenerManager.unregister(listener)
  }

  test("store search above the broadcast gate degrades to a shuffle join with identical output") {
    val store = tmpDir("sig_store_gate")
    val newBatch = docs.filter(col("doc_id") === 4)
    val corpus = docs.filter(col("doc_id") =!= 4)
    Dedup.signatureStoreWrite(corpus, "doc_id", "text", 3, 4, 4, store)
    val hinted = Dedup.minhashLshPairsAgainstStore(newBatch, store,
      "doc_id", "text", 3, 4, 4, 0.5)
    val gated = Dedup.minhashLshPairsAgainstStore(newBatch, store,
      "doc_id", "text", 3, 4, 4, 0.5, broadcastMaxBandRows = 0L)
    // same pairs either way
    assert(gated.select("new_id", "corpus_id").as[(Long, Long)].collect().toSet ===
      hinted.select("new_id", "corpus_id").as[(Long, Long)].collect().toSet)
    // gate 0 => the FORCED broadcast hint is gone from the logical plan
    // (a runtime AQE conversion on genuinely-small data remains legal —
    // the point is that an oversized batch is free to shuffle)
    def hint(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(hint(hinted).contains("broadcast"),
      "expected the under-gate path to carry the broadcast hint")
    assert(!hint(gated).contains("broadcast"),
      s"expected no forced broadcast hint above the gate:\n${hint(gated)}")
  }

  test("ngram df-cap drops long postings and reports them via the observed metric") {
    // 12 docs all sharing one stop-shingle ("the same boilerplate"),
    // plus a genuine near-dup pair sharing rare shingles
    val boiler = "the same boilerplate"
    val docs = ((1L to 12L).map(i => (i, s"$boiler unique$i tail$i end$i")) ++
      Seq((100L, "alpha beta gamma delta epsilon"),
          (101L, "alpha beta gamma delta zeta")))
      .toDF("doc_id", "text")
    var dropped: Option[(Long, Int)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("ngram_df_cap").foreach { row =>
          dropped = Some((row.getAs[Long]("dropped_postings"), row.getAs[Int]("max_df_seen")))
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.4, maxDf = 8)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      // the capped postings ("the same boilerplate" df=12 > 8) are gone:
      // boilerplate-only pairs cannot surface, the rare-shingle pair does
      assert(pairs === Set((100L, 101L)))
      val deadline = System.currentTimeMillis() + 5000
      while (dropped.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(dropped.exists(_._1 > 0), s"expected dropped_postings > 0, got $dropped")
      assert(dropped.exists(_._2 === 12), s"expected max_df_seen = 12, got $dropped")
    } finally spark.listenerManager.unregister(listener)
  }

  test("duplicate spans merge equal-length intervals and require cross-doc grams") {
    // 12 shared tokens "s1..s12" = 5 duplicated 8-grams at starts 1..5
    // (gaps of 1 -> one merged span of 12 tokens); doc 3 repeats its
    // own 8-gram twice but shares it with no other doc -> excluded.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val selfRep = (1 to 8).map(i => s"r$i").mkString(" ")
    val fixture = Seq(
      (1L, s"$shared alpha beta gamma delta epsilon zeta eta theta $shared"),
      (2L, s"prefix0 $shared"),
      (3L, s"$selfRep filler1 filler2 filler3 filler4 filler5 filler6 filler7 $selfRep"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(fixture, "doc_id", "text", k = 8)
      .select("doc_id", "n_spans", "dup_tokens", "n_dup_grams")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: two 12-token shared runs separated by 8 unique tokens ->
    // 2 merged segments, 24 covered tokens, 10 dup grams
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0) === ((1L, 2L, 24L, 10L)))
    // doc 2: one 12-token run -> 1 segment, 12 tokens, 5 grams
    assert(out(1) === ((2L, 1L, 12L, 5L)))
  }

  test("store vacuum removes retired signatures and equals a rebuild from survivors") {
    val store = tmpDir("graft_vacuum_store")
    val rebuilt = tmpDir("graft_vacuum_rebuild")
    val corpus = docs.filter(col("doc_id") =!= 4L) // 1, 2, 3
    val batch = docs.filter(col("doc_id") === 4L)  // exact dup of 1
    Dedup.signatureStoreWrite(corpus, "doc_id", "text", 3, 4, 4, store)
    // before vacuum: the batch matches doc 1
    val before = Dedup.minhashLshPairsAgainstStore(
      batch, store, "doc_id", "text", 3, 4, 4, 0.5)
      .select("corpus_id").as[Long].collect().toSet
    assert(before.contains(1L))
    Dedup.signatureStoreVacuum(spark, Seq(1L).toDF("doc_id"), "doc_id",
      3, 4, 4, store)
    // marker survives the swap; search drops doc 1's pairs
    assert(Dedup.signatureStoreComplete(store, 3, 4, 4))
    val after = Dedup.minhashLshPairsAgainstStore(
      batch, store, "doc_id", "text", 3, 4, 4, 0.5)
    Dedup.signatureStoreWrite(corpus.filter(col("doc_id") =!= 1L),
      "doc_id", "text", 3, 4, 4, rebuilt)
    val fromRebuild = Dedup.minhashLshPairsAgainstStore(
      batch, rebuilt, "doc_id", "text", 3, 4, 4, 0.5)
    // collect both sides: each search plan carries the lsh_band_cap
    // observe metric, and one combined plan would duplicate the name
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    assert(rows(after) === rows(fromRebuild))
    assert(!after.select("corpus_id").as[Long].collect().contains(1L))
    // refuse to vacuum a store whose marker is gone
    new java.io.File(s"$store/_GRAFT_STORE_COMPLETE").delete()
    intercept[IllegalArgumentException] {
      Dedup.signatureStoreVacuum(spark, Seq(2L).toDF("doc_id"), "doc_id",
        3, 4, 4, store)
    }
  }

  test("vacuum whose swap rename fails leaves the store incomplete (forced rebuild)") {
    // failrename:// = local FS whose rename REFUSES to move *_stage
    // dirs (registered below) — the exact failure mode of the swap on
    // a misbehaving filesystem. Parquet's own commit renames
    // (_temporary/... -> part files) are untouched, so the staging
    // writes inside vacuum still succeed; only the final swap fails.
    spark.sparkContext.hadoopConfiguration.set(
      "fs.failrename.impl", classOf[FailRenameFileSystem].getName)
    val store = "failrename://" + tmpDir("graft_vacuum_failswap")
    Dedup.signatureStoreWrite(docs, "doc_id", "text", 3, 4, 4, store)
    assert(Dedup.signatureStoreComplete(store, 3, 4, 4))
    val e = intercept[java.io.IOException] {
      Dedup.signatureStoreVacuum(spark, Seq(1L).toDF("doc_id"), "doc_id",
        3, 4, 4, store)
    }
    assert(e.getMessage.contains("rename"))
    // the marker was dropped before the swap and must NOT have been
    // republished over the failed rename: the store reads as
    // incomplete, and both append and vacuum refuse it — rebuild is
    // the only path forward, never a mixed-generation read.
    assert(!Dedup.signatureStoreComplete(store, 3, 4, 4))
    intercept[IllegalArgumentException] {
      Dedup.signatureStoreAppend(docs.limit(1), "doc_id", "text", 3, 4, 4, store)
    }
  }

  test("WAV encode/decode round-trips header fields and PCM samples exactly") {
    // direct byte-level check, no Spark: the header parse must read
    // back exactly what the encoder wrote
    val wav = Multimodal.encodeWav(7L)
    val (n, rate) = Multimodal.audioDims(7L)
    assert(new String(wav, 0, 4, "US-ASCII") === "RIFF")
    assert(wav.length === 44 + 2 * n)
    val ids = Seq(6L, 7L).toDF("doc_id")
    val frames = Multimodal.decodeWavFrames(Multimodal.syntheticWavs(ids))
      .collect().groupBy(_.doc_id)
    assert(frames(7L).head.sample_rate === rate && rate === 16000)
    assert(frames(6L).head.sample_rate === 8000)
    // hand-computed window 0 of doc 7: samples 0..127
    val s = (0 until 128).map(Multimodal.pcmSample(7L, _))
    val f0 = frames(7L).find(_.frame_idx === 0).get
    assert(f0.mean_square === s.map(v => v.toLong * v).sum / 128)
    assert(f0.peak === s.map(math.abs).max.toLong)
    assert(f0.zero_crossings ===
      (1 until 128).count(j => s(j - 1).toLong * s(j) < 0).toLong)
    // frame count: (n - 128) / 64 + 1
    assert(frames(7L).length === (n - 128) / 64 + 1)
  }

  test("shingles and fingerprint behave on edge cases") {
    val df = Seq((1L, "one two"), (2L, ""), (3L, "a b c d")).toDF("id", "t")
    val sh = df.select(T.shingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) === Seq.empty && sh(1) === Seq.empty)
    assert(sh(2) === Seq("a b c", "b c d"))
    val fp = df.select(T.contentFingerprint(col("t"))).as[String].collect()
    assert(fp.distinct.length === 3)
  }
}
