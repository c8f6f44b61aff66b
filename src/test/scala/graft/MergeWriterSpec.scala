package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.MergeWriter

/** Partition-scoped mergeFileInventory: a batch touching one
  * instrument must rewrite only that instrument's partition —
  * untouched partition files stay byte-identical on disk.
  */
class MergeWriterSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = Seq("experiment_id", "file_path")

  private def rows(t: (String, String, String, Long, String)*): DataFrame =
    t.toSeq.toDF("experiment_id", "file_path", "s3_key", "uploaded_at", "instrument_id")

  private def empty: DataFrame = rows().filter(lit(false))

  private def partitionFiles(dir: String): Map[String, String] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Map.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
        .map(p => d.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString)
        .toMap
    }
  }

  test("merge rewrites only touched partitions; untouched files byte-identical") {
    val dir = tmpDir("inv") + "/file_inventory"
    // seed both instruments
    MergeWriter.mergeFileInventory(spark, dir,
      rows(("e1", "a.csv", "k1", 10L, "instrA"), ("e2", "b.csv", "k2", 10L, "instrB")),
      empty, keys, Seq("instrument_id"))
    val bBefore = partitionFiles(s"$dir/instrument_id=instrB")
    val aBefore = partitionFiles(s"$dir/instrument_id=instrA")
    assert(bBefore.nonEmpty && aBefore.nonEmpty)

    // second batch touches instrA only: J4 overwrite of (e1, a.csv)
    val n = MergeWriter.mergeFileInventory(spark, dir,
      rows(("e1", "a.csv", "k1-v2", 20L, "instrA")), empty, keys, Seq("instrument_id"))
    assert(n === 1) // scoped merge counts the touched-partition rows

    assert(partitionFiles(s"$dir/instrument_id=instrB") === bBefore,
      "untouched partition was rewritten")
    assert(partitionFiles(s"$dir/instrument_id=instrA") !== aBefore)

    val inv = spark.read.parquet(dir)
    assert(inv.count() === 2)
    assert(inv.filter(col("experiment_id") === "e1").head().getAs[String]("s3_key") === "k1-v2")
    assert(inv.filter(col("experiment_id") === "e2").head().getAs[String]("s3_key") === "k2")
  }

  test("scoped merge keeps J3 fill-if-absent semantics within the touched partition") {
    val dir = tmpDir("inv2") + "/file_inventory"
    MergeWriter.mergeFileInventory(spark, dir,
      rows(("e1", "a.csv", "run-key", 10L, "instrA")), empty, keys, Seq("instrument_id"))
    // experiment row for the same key must NOT overwrite (prio 3 > 2)
    MergeWriter.mergeFileInventory(spark, dir, empty,
      rows(("e1", "a.csv", "exp-key", 99L, "instrA")), keys, Seq("instrument_id"))
    val inv = spark.read.parquet(dir)
    assert(inv.count() === 1)
    assert(inv.head().getAs[String]("s3_key") === "run-key")
  }
}
