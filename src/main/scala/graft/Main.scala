package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** CLI dispatcher — the operational entry points a user of the
  * reference drives today (ingest Lambda, backfill CLI, weekly
  * reconciliation, zip export), as one spark-submit-able main.
  *
  *   graft.Main ingest    --root R --tables T [--bucket B] [--strict] [--streaming --checkpoint C]
  *   graft.Main reconcile --root R --tables T [--window-days N] [--now EPOCH]
  *   graft.Main zip       --root R --glob G --out F.zip
  */
object Main {

  private def parseFlags(args: Seq[String]): (Map[String, String], Set[String]) = {
    val kv = scala.collection.mutable.Map[String, String]()
    val flags = scala.collection.mutable.Set[String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected argument: $a")
      val key = a.drop(2)
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        kv(key) = args(i + 1); i += 2
      } else { flags += key; i += 1 }
    }
    (kv.toMap, flags.toSet)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <ingest|reconcile|zip> [--opts]")
    val cmd = args.head
    val (kv, flags) = parseFlags(args.toSeq.drop(1))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try cmd match {
      case "ingest" =>
        val root = kv("root"); val tables = kv("tables")
        val bucket = kv.getOrElse("bucket", "local")
        val strict = flags.contains("strict")
        if (flags.contains("streaming")) {
          IngestJob.runStreaming(spark, root, tables,
            kv.getOrElse("checkpoint", s"$tables/_checkpoint"), bucket)
          println("streaming ingest drained (AvailableNow)")
        } else {
          val c = IngestJob.processBatch(spark, tables,
            IngestJob.readRunJsons(spark, root, bucket),
            IngestJob.readExperimentJsons(spark, root, bucket),
            fixedNow = None, strictTimestamps = strict)
          println(s"ingested runs=${c.runs} experiments=${c.experiments} " +
            s"files=${c.files} quarantined=${c.quarantined}")
        }
      case "reconcile" =>
        val root = kv("root"); val tables = kv("tables")
        val listing = spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true").load(root)
          .select(
            IngestJob.keyFromUri(col("path"), root).as("key"),
            col("length").as("size"),
            (col("modificationTime").cast("long")).as("last_modified_epoch"))
        val now = kv.get("now").map(_.toLong)
          .getOrElse(System.currentTimeMillis() / 1000)
        val rep = ReconcileJob.run(spark, listing, tables, now,
          kv.getOrElse("window-days", "8").toInt)
        println(rep.report)
      case "zip" =>
        val root = kv("root")
        val files = spark.read.format("binaryFile")
          .option("pathGlobFilter", kv.getOrElse("glob", "*"))
          .option("recursiveFileLookup", "true").load(root)
          .select(col("path").as("key"), col("length").as("size"), col("content"))
        val v = ZipPlanner.validate(files)
        require(v.ok, s"zip validation failed: ${v.reason.get}")
        val entries = ZipPlanner.entryNames(files)
          .select(col("entry_name"), col("content").as("payload"))
        val n = ZipPlanner.buildZip(entries, kv("out"))
        println(s"wrote $n entries (${v.totalBytes} bytes) to ${kv("out")}")
      case other => sys.error(s"unknown command: $other")
    } finally spark.stop()
  }
}
