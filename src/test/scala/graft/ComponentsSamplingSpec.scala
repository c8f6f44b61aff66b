package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

class ComponentsSamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components label chains, triangles, and disjoint pairs by min id") {
    // components: {1,2,3} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components converge on a long chain (diameter > 2)") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(chain, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(cc === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("large-star/small-star equals plain propagation and union-find on random graphs") {
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val pairs = (1 to n).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(pairs)
      val df = pairs.toDF("id1", "id2")
      val simple = Dedup.connectedComponents(df, "id1", "id2")
        .as[(Long, Long)].collect().toMap
      val star = Dedup.connectedComponentsLargeStar(df, "id1", "id2")
        .as[(Long, Long)].collect().toMap
      assert(simple === expected, s"simple trial $trial")
      assert(star === expected, s"large-star trial $trial")
    }
  }

  test("large-star converges on a deep chain in O(log n) rounds, not O(diameter)") {
    // diameter-255 chain: min-label propagation would need ~255 rounds;
    // alternating large/small-star must finish in logarithmic rounds
    val chain = (1L until 256L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (labels, rounds) =
      Dedup.connectedComponentsLargeStarWithRounds(chain, "id1", "id2")
    val cc = labels.as[(Long, Long)].collect().toMap
    assert(cc === (1L to 256L).map(_ -> 1L).toMap)
    assert(rounds <= 12, s"expected O(log 256) ~ 8 rounds, got $rounds")
  }

  test("stratified sample is deterministic, per-stratum thresholded, and rate-accurate") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 0.75).select("doc_id")
      .as[Long].collect().toSet
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 0.75).select("doc_id")
      .as[Long].collect().toSet
    assert(s1 === s2) // byte-for-byte reproducible
    // per-stratum rates land near the targets (md5 buckets are uniform)
    val byLang = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 0.75)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enRate = byLang("en").toDouble / totals("en")
    assert(enRate > 0.1 && enRate < 0.4, s"en rate $enRate")
    val deRate = byLang("de").toDouble / totals("de")
    assert(deRate > 0.55 && deRate < 0.95, s"de rate $deRate")
    // sampling is a pure filter — no shuffle in the plan
    val plan = Sampling.uniformSample(docs, "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hash samples are nested: raising the rate only adds rows") {
    // the property that makes mixes stable across recipe iterations —
    // a 25% sample is a strict subset of the 50% sample of the same ids
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val s25 = Sampling.uniformSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val s50 = Sampling.uniformSample(docs, "doc_id", 0.50)
      .select("doc_id").as[Long].collect().toSet
    val s100 = Sampling.uniformSample(docs, "doc_id", 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(s25.subsetOf(s50) && s50.subsetOf(s100))
    assert(s100.size === docs.count())
    assert(s25.nonEmpty && s25.size < s50.size && s50.size < s100.size)
  }

  test("temperature mix upweights small domains and hits the target total") {
    // 1000-doc "web" domain vs 40-doc "books": sqrt weighting must give
    // books a (much) higher keep rate than web
    val docs = ((1L to 1000L).map(i => (i, "web")) ++
      (2001L to 2040L).map(i => (i, "books"))).toDF("doc_id", "src")
    val mix = Sampling.temperatureMix(docs, "doc_id", "src", targetTotal = 200L)
    val rates = mix.select("src", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("books") > rates("web"),
      s"small domain must be upweighted: $rates")
    // rate math replayed exactly: w = floor(sqrt(n)*1000), W = sum
    val wWeb = math.floor(math.sqrt(1000.0) * 1000).toLong
    val wBooks = math.floor(math.sqrt(40.0) * 1000).toLong
    val wSum = wWeb + wBooks
    assert(rates("web") === math.min(10000L, 200L * wWeb * 10000L / (wSum * 1000L)))
    assert(rates("books") === math.min(10000L, 200L * wBooks * 10000L / (wSum * 40L)))
    // deterministic across partition layouts
    val again = Sampling.temperatureMix(docs.repartition(7), "doc_id", "src", 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(again === mix.select("doc_id").as[Long].collect().toSet)
    // lands near the target (md5 buckets are uniform)
    val n = mix.count()
    assert(n > 140 && n < 260, s"expected ~200 rows, got $n")
    // pure filter on the doc side: the only exchange feeds the tiny
    // count aggregate, never the corpus rows
    val plan = mix.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("quota sample caps each stratum at K with deterministic picks") {
    val docs = (1L to 30L).map(i => (i, if (i <= 25) "big" else "small"))
      .toDF("doc_id", "src")
    val once = Sampling.quotaSample(docs, "doc_id", "src", quota = 5)
      .as[(Long, String, Long)].collect().toSet
    assert(once.count(_._2 == "big") === 5, "big stratum must be capped at 5")
    assert(once.count(_._2 == "small") === 5, "under-quota stratum keeps all rows")
    // deterministic: same picks on a different partition layout
    val again = Sampling.quotaSample(docs.repartition(7), "doc_id", "src", quota = 5)
      .as[(Long, String, Long)].collect().toSet
    assert(again === once)
    // picks are the 5 lowest hash buckets, not the 5 lowest ids
    val allBuckets = docs.filter(col("src") === "big")
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id")).as("b"))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1)).take(5).map(_._1).toSet
    assert(once.filter(_._2 == "big").map(_._1) === allBuckets)
  }

  test("decontamination flags only docs sharing an n-gram with the eval set") {
    import graft.operators.Decontamination
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),      // shares "alpha beta gamma" with eval
      (2L, "one two three four"),          // clean
      (3L, "tiny doc"))                    // < 3 words: zero hits by construction
      .toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma something else"))
      .toDF("doc_id", "text")
    val got = Decontamination.flagContaminated(corpus, eval, "doc_id", "text", n = 3)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1L, true)))  // shares exactly "alpha beta gamma"
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((0L, false)))
  }

  test("epoch shuffle: each epoch is a complete permutation, epochs differ, reruns agree") {
    val ids = (0L until 50L)
    val df = ids.toDF("doc_id")
    val m = Sampling.epochShuffle(df, "doc_id", epochs = 2, numPartitions = 4)
      .as[(Int, Long, Long)].collect()
    val byEpoch = m.groupBy(_._1)
    assert(byEpoch.keySet === Set(0, 1))
    for ((_, rows) <- byEpoch) {
      assert(rows.map(_._2).toSet === ids.toSet, "every id appears once")
      assert(rows.map(_._3).sorted.toSeq === ids.toSeq, "positions are 0..n-1")
    }
    def perm(e: Int) = byEpoch(e).sortBy(_._3).map(_._2).toSeq
    assert(perm(0) !== perm(1), "epochs are independent permutations")
    // reproducible under a different partitioning
    val again = Sampling.epochShuffle(df, "doc_id", epochs = 2, numPartitions = 7)
      .as[(Int, Long, Long)].collect()
    assert(again.toSet === m.toSet)
  }

  test("token-budget mix: budgets respected, prefixes maximal, partition-invariant") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 120L).map(i =>
      (i, s"s${i % 3}", 10L + i % 17)).toDF("doc_id", "src", "n_tok")
    val mix = Sampling.tokenBudgetMix(docs, "doc_id", "src",
      col("n_tok"), budgetPerSource = 300L).cache()
    // budget never exceeded
    val over = mix.groupBy(col("source")).agg(max(col("cum_source")).as("m"))
      .filter(col("m") > 300L).count()
    assert(over === 0L)
    // maximality: per source, the FIRST md5-ordered doc not kept
    // would have crossed the budget
    val keptTotals = mix.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("kept")).as[(String, Long)].collect().toMap
    val ordered = docs
      .withColumn("md5key", md5(col("doc_id").cast("string")))
      .orderBy(col("src"), col("md5key"), col("doc_id"))
      .as[(Long, String, Long, String)].collect()
    val keptIds = mix.select(col("id")).as[Long].collect().toSet
    ordered.groupBy(_._2).foreach { case (src, rows) =>
      val firstDropped = rows.find(r => !keptIds.contains(r._1))
      firstDropped.foreach { r =>
        assert(keptTotals.getOrElse(src, 0L) + r._3 > 300L,
          s"$src dropped doc ${r._1} though it still fit the budget")
      }
    }
    // same kept set under a different partition count
    val again = Sampling.tokenBudgetMix(docs, "doc_id", "src",
      col("n_tok"), budgetPerSource = 300L, numPartitions = 7)
      .select(col("id")).as[Long].collect().toSet
    assert(again === keptIds)
  }
}
