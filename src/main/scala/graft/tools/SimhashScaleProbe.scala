package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Empirical scaling probe for the two permissive-radius SimHash
  * plans (q23 pigeonhole vs q75 multi-index Hamming): replicates the
  * documents corpus m x (near-dup copies with distinct ids), then
  * measures each path's wall time at radius 12. The pigeonhole's
  * candidate join grows ~quadratically (32-value chunk keys); MIH
  * grows linearly (wide keys, bounded neighbor masks). Numbers go to
  * PLANS.md.
  *
  * Usage: sbt "runMain graft.tools.SimhashScaleProbe [sfDir] [mults]"
  */
object SimhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("1,2,4").split(",").map(_.toInt).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.range(1000).selectExpr("sum(id)").collect()
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (m <- mults) {
      val docs = (0 until m).map { i =>
        base.select((col("doc_id") * m + i).as("doc_id"),
          concat(col("text"), lit(s" v$i")).as("text"))
      }.reduce(_ union _).cache()
      val n = docs.count()
      def timed(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] m=$m n=$n $label%-10s ${sec}%7.2f s  pairs=$rows")
        spark.catalog.clearCache()
        docs.cache(); docs.count() // keep the input warm across paths
      }
      timed("pigeonhole") {
        Dedup.simhashBucketedPairs(docs, "doc_id", "text", 3, 12).count()
      }
      timed("mih") {
        Dedup.simhashMihPairs(docs, "doc_id", "text", 3, 12, chunks = 4).count()
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
