package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Empirical probe for the signature-store search's "zero corpus
  * shuffle" claim: a FIXED small batch (sf0.001's doc_id % 10 slice)
  * is searched against stores built from growing corpora (sf0.001 →
  * sf0.01 → sf0.1 = 10x per step), while a SparkListener sums the
  * search job's stage count and shuffle read/write bytes.
  *
  * If candidate generation really scans the stored bands without
  * shuffling them, shuffle bytes must track the BATCH (constant here)
  * plus, in the capped path, the hot-band count aggregate — whose
  * shuffled rows are (band_idx, band_key, partial count) at ~tens of
  * bytes per distinct key, not corpus text. The uncapped run
  * (maxBandDf = Int.MaxValue) isolates the pure search: its shuffle
  * bytes should be corpus-independent. Numbers go to PLANS.md.
  *
  * Usage: sbt "runMain graft.tools.SigStoreScaleProbe [sfDirs csv]"
  */
object SigStoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDirs = args.headOption
      .getOrElse("/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.range(1000).selectExpr("sum(id)").collect()

    val batch = Tables.documents(spark, sfDirs.head)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .cache()
    val batchRows = batch.count()

    val stages = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          stages.incrementAndGet()
          shufRead.addAndGet(m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }

    for (sfDir <- sfDirs) {
      val corpus = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 10 =!= 0)
      val corpusRows = corpus.count()
      val store = "/tmp/graft_sigstore_probe_" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      if (!Dedup.signatureStoreComplete(store, 3, 4, 4))
        Dedup.signatureStoreWrite(corpus, "doc_id", "text", 3, 4, 4, store)

      for ((label, maxDf) <- Seq("capped" -> 1000, "uncapped" -> Int.MaxValue)) {
        spark.catalog.clearCache()
        batch.cache(); batch.count()
        stages.set(0); shufRead.set(0L); shufWrite.set(0L)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val pairs = Dedup.minhashLshPairsAgainstStore(batch, store,
          "doc_id", "text", 3, 4, 4, 0.5, maxBandDf = maxDf).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // let the listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        println(f"[probe] corpus=$corpusRows%7d batch=$batchRows $label%-8s " +
          f"stages=${stages.get}%3d shuffle_read_KB=${shufRead.get / 1024}%8d " +
          f"shuffle_write_KB=${shufWrite.get / 1024}%8d pairs=$pairs time=${sec}%6.2f s")
      }
    }
    spark.stop()
  }
}
