package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.VersionedTable

/** Round-18 verdict #6: measure control-plane cost at 10k retained
  * manifests (a never-vacuumed streaming sink's shape) BEFORE writing
  * any code. Probed surfaces:
  *
  *  - `latestVersion` — one directory listing (every read starts here);
  *  - `versionAtTime` — listing + one manifest header read per
  *    retained version (timestamp time travel);
  *  - an idempotent append (`txnId`) — the txn guard scans retained
  *    manifests for the id on a MISS (every streaming micro-batch
  *    commit pays this);
  *  - `readLatest` count — one manifest read + the data scan.
  *
  * The 10k manifests are synthesized by replicating a real commit's
  * manifest bytes under successive version names (hand-written
  * manifests are outside the data contract, but the control-plane
  * costs probed here only parse names and headers).
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("manifest-scale-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val dir = "/tmp/graft-manifest-probe"
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), dir)
    val src = new org.apache.hadoop.fs.Path(dir, "_v2.manifest")
    val bytes = {
      val in = f.open(src)
      try { val b = new Array[Byte](f.getFileStatus(src).getLen.toInt)
        in.readFully(b); b }
      finally in.close()
    }
    (3 to 10000).foreach { v =>
      val out = f.create(new org.apache.hadoop.fs.Path(dir, s"_v$v.manifest"), false)
      try out.write(bytes) finally out.close()
    }
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      r
    }
    // warm the dentry cache once so the numbers compare steady states
    VersionedTable.latestVersion(dir)
    (1 to 3).foreach { i =>
      time(s"latestVersion#$i") { VersionedTable.latestVersion(dir) }
      time(s"versionAtTime#$i") {
        VersionedTable.versionAtTime(dir, System.currentTimeMillis() * 1000L) }
      time(s"readLatest.count#$i") { VersionedTable.readLatest(spark, dir).count() }
      time(s"txnMiss.append#$i") {
        VersionedTable.append(Seq((100L + i, "x")).toDF("k", "v"), dir,
          txnId = Some(s"probe-miss-$i")) }
      time(s"txnHit.append#$i") {
        VersionedTable.append(Seq((100L + i, "x")).toDF("k", "v"), dir,
          txnId = Some(s"probe-miss-$i")) }
    }
    spark.stop()
  }
}
