package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Clustering, Similarity}

/** Measurement probe behind the residual-PQ design decision (q243/
  * q244, PLANS.md): recall@5 of the IVFADC search vs brute-force
  * ground truth, across the 2x2 of coarse-centroid kind (first-8
  * corpus vectors vs Lloyd-trained k=8) x PQ coding (raw vectors vs
  * residuals), at the q235 operating points.
  *
  * Jégou et al. 2011 quantize residuals BECAUSE the coarse quantizer
  * is trained — displacements from real centroids are small and
  * shareable across clusters. With arbitrary seed "centroids" the
  * residual distribution is no tighter than the raw one, so the
  * published gain should evaporate (or invert). This probe measures
  * exactly that, on the fixture's data.
  *
  * Usage: runMain graft.tools.ResidualRecallProbe <sfDir>
  */
object ResidualRecallProbe {

  private val settings = Seq((1, 10), (2, 20), (4, 40), (8, 100))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 3)
    val truth = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nTruth = truth.count()

    val firstEight = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val trained = Clustering.kmeansCentroids(spark, emb,
      "vec_id", "embedding", k = 8, iters = 2)

    def recallRow(path: String, cents: DataFrame, residual: Boolean)
        : Seq[(Int, Int, Long)] = {
      if (!Similarity.ivfPqIndexComplete(spark, path, m = 4, kCodes = 16,
          subDim = 16, residual = residual))
        Similarity.ivfPqIndexWrite(emb, cents,
          "vec_id", "embedding", "centroid_id", "cv",
          m = 4, kCodes = 16, subDim = 16, iters = 1, path,
          targetRowsPerFile = 256L, residual = residual)
      settings.map { case (np, sl) =>
        val res = Similarity.ivfPqTopK(spark, path, queries,
            "vec_id", "embedding", k = 5, nprobe = np, shortlistN = sl,
            residual = residual)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(res, Seq("query_id", "neighbor_id"),
          "left_semi").count()
        (np, sl, hits * 10000L / nTruth)
      }
    }

    val sfx = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val cases = Seq(
      ("first8/raw", s"/tmp/graft_probe_f8_raw_$sfx",
        firstEight.select(col("centroid_id"),
          transform(col("cv"), x => x.cast("double")).as("cv")), false),
      ("first8/residual", s"/tmp/graft_probe_f8_res_$sfx",
        firstEight.select(col("centroid_id"),
          transform(col("cv"), x => x.cast("double")).as("cv")), true),
      ("trained/raw", s"/tmp/graft_probe_tr_raw_$sfx", trained, false),
      ("trained/residual", s"/tmp/graft_probe_tr_res_$sfx", trained, true))

    println(f"${"case"}%-18s ${"(np,sl)"}%-10s recall_bp")
    cases.foreach { case (label, path, cents, residual) =>
      recallRow(path, cents, residual).foreach { case (np, sl, bp) =>
        println(f"$label%-18s ($np%d,$sl%3d)    $bp%5d")
      }
    }
    spark.stop()
  }
}
