package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Retrieval, Scd}

class MiningOpsSpec extends SparkTestBase {
  import spark.implicits._

  // --- k-means ---

  private def vecs = Seq(
    // two well-separated blobs on the x axis
    (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.05f, 0.05f)),
    (3L, Array(10.0f, 0.1f)), (4L, Array(10.1f, 0.0f)), (5L, Array(10.05f, 0.05f)))
    .toDF("vec_id", "embedding")

  test("kmeans separates two obvious blobs and reduces WCSS vs the seed round") {
    // seed = first 2 vectors, BOTH in the left blob: round 0 assigns
    // the right blob to whichever seed is nearest, iterations must
    // pull one centroid over to the right blob.
    val a = Clustering.kmeansAssign(spark, vecs, "vec_id", "embedding", k = 2, iters = 3)
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(Set(a(0L), a(1L), a(2L)).size === 1, "left blob split across clusters")
    assert(Set(a(3L), a(4L), a(5L)).size === 1, "right blob split across clusters")
    assert(a(0L) !== a(3L), "blobs merged into one cluster")
  }

  test("kmeans WCSS is non-increasing over Lloyd iterations") {
    def wcss(iters: Int): Double =
      Clustering.kmeansAssign(spark, vecs, "vec_id", "embedding", k = 2, iters)
        .agg(sum("dist2")).as[Double].head()
    val w = (0 to 3).map(wcss)
    w.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-9, s"WCSS increased: $w")
    }
  }

  test("kmeans assignment covers every vector exactly once") {
    val a = Clustering.kmeansAssign(spark, vecs, "vec_id", "embedding", k = 2, iters = 2)
    assert(a.count() === 6)
    assert(a.select("id").distinct().count() === 6)
  }

  // --- BM25 ---

  private def docs = Seq(
    (1L, "spark spark spark"),           // high tf for 'spark'
    (2L, "spark engine"),                // one hit
    (3L, "engine only no hits here"),    // no query terms
    (4L, "rare rare spark"))             // contains rare term too
    .toDF("doc_id", "text")

  test("bm25 ranks higher-tf docs first and drops no-hit docs") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "rare"), k = 10)
      .select("doc_id", "rn").as[(Long, Int)].collect().toMap
    assert(!got.contains(3L), "doc without query terms was scored")
    // doc 4 matches 'rare' (idf of a 1-df term dominates) — must rank first
    assert(got(4L) === 1, s"expected doc 4 first, got $got")
    // tf saturation: doc 1 (tf=3) still beats doc 2 (tf=1) on 'spark'
    assert(got(1L) < got(2L))
  }

  test("bm25 respects k") {
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 2)
      .count() === 2)
  }

  // --- SCD2 ---

  private def changes = Seq(
    // key 1: A A B A  -> runs A(2 rows), B, A — 3 versions
    (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
    // key 2: single row -> one open interval
    (2L, 15L, "X"))
    .toDF("k", "ts", "attr")

  test("scd2 collapses consecutive duplicates and versions changes") {
    val h = Scd.scd2(changes, "k", "attr", "ts", "ts")
      .select("k", "version", "attr", "effective_from", "effective_to", "is_current", "n_rows")
      .as[(Long, Long, String, Long, Option[Long], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val k1 = h.filter(_._1 == 1L)
    assert(k1.map(_._3).toSeq === Seq("A", "B", "A"), "change-collapse wrong")
    assert(k1.map(_._7).toSeq === Seq(2L, 1L, 1L), "run row-counts wrong")
    // intervals tile the timeline: each effective_to = next effective_from
    k1.sliding(2).foreach { case Array(cur, nxt) =>
      assert(cur._5 === Some(nxt._4), "intervals not contiguous")
    }
    assert(k1.count(_._6) === 1 && k1.last._6, "exactly the last version is current")
    assert(h.filter(_._1 == 2L).toSeq.map(r => (r._5, r._6)) === Seq((None, true)))
  }
}
