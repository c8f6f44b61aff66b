package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuantization

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def mkCorpus(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  test("subspace explosion reconstructs the original vector") {
    val corpus = mkCorpus(Seq(
      (1L, (1 to 8).map(_.toFloat)), (2L, (9 to 16).map(_.toFloat))))
    val got = ProductQuantization.subspaces(corpus, "vec_id", "embedding", 4, 2)
      .groupBy(col("id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("sv")))),
        s => s("sv"))).as("back"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(got(1L) === (1 to 8).map(_.toFloat))
    assert(got(2L) === (9 to 16).map(_.toFloat))
  }

  test("codebook has m x k cells of subDim dims") {
    val corpus = mkCorpus((0L until 20L).map(i =>
      (i, (0 until 8).map(j => (i * 8 + j).toFloat))))
    val cb = ProductQuantization.trainCodebooks(
      spark, corpus, "vec_id", "embedding", m = 2, k = 4, subDim = 4, iters = 1)
    assert(cb.count() === 8)
    assert(cb.select(size(col("cv"))).as[Int].collect().forall(_ === 4))
  }

  test("with k = corpus size, ADC is exact: codebook collapses onto the vectors") {
    // seeds are ALL vectors -> zero-radius cells survive the Lloyd
    // round unchanged -> the distance table holds true distances
    val vecs = (0L until 8L).map(i =>
      (i, (0 until 8).map(j => ((i * 37 + j * 11) % 23).toFloat)))
    val corpus = mkCorpus(vecs)
    val got = ProductQuantization.adcTopK(spark, corpus, "vec_id", "embedding",
      m = 2, k = 8, subDim = 4, iters = 1, queryId = 0L, topK = 7)
      .as[(Long, Long)].collect()
    val q = vecs.head._2
    val exact = vecs.tail.map { case (id, v) =>
      val d = v.zip(q).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }
      // per-subspace round-6dp then micro-units, as the operator sums
      val du = Seq(d.take(4).sum, d.drop(4).sum)
        .map(x => math.round(BigDecimal(x).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6))
      (id, du.sum)
    }.sortBy(t => (t._2, t._1))
    assert(got.toSeq === exact)
  }

  test("two tight clusters: ADC ranks the query's cluster first") {
    val a = (0L until 10L).map(i =>
      (i, (0 until 8).map(j => (j + (i % 3) * 0.01f))))
    val b = (10L until 20L).map(i =>
      (i, (0 until 8).map(j => (100f + j + (i % 3) * 0.01f))))
    val corpus = mkCorpus(a ++ b)
    val top9 = ProductQuantization.adcTopK(spark, corpus, "vec_id", "embedding",
      m = 2, k = 4, subDim = 4, iters = 2, queryId = 0L, topK = 9)
      .as[(Long, Long)].collect()
    assert(top9.forall(_._1 < 10L),
      s"cross-cluster neighbor leaked into top-9: ${top9.mkString(",")}")
  }
}
