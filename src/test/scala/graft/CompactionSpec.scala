package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.Compaction

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def dataFiles(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(_.getFileName.toString)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .toSeq
  }

  test("compaction shrinks file count and preserves content exactly") {
    val dir = tmpDir("compact") + "/t"
    val src = (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "v")
    src.repartition(32).write.parquet(dir)
    assert(dataFiles(dir).size === 32)

    val stats = Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore === 32 && stats.filesAfter === 1)
    assert(stats.rows === 1000)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(back === (1L to 1000L).map(i => (i, s"row$i")).toSet)
  }

  test("partitioned compaction honors targetBytes inside a partition") {
    val dir = tmpDir("compactb") + "/t"
    // one hot partition (~all the bytes) + one small one
    val hot = (1L to 20000L).map(i => (i, "hot", s"row-$i-" + ("x" * 64)))
    val cold = (1L to 50L).map(i => (i + 100000L, "cold", s"c$i"))
    (hot ++ cold).toDF("id", "part", "v")
      .repartition(8).write.partitionBy("part").parquet(dir)

    val hotBytes = {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(s"$dir/part=hot")).iterator().asScala
        .filter(Files.isRegularFile(_)).map(Files.size(_)).sum
    }
    // target ~ a quarter of the hot partition -> expect ~4+ buckets
    val stats = Compaction.compact(spark, dir, targetBytes = hotBytes / 4, Seq("part"))
    assert(stats.rows === 20050)
    def filesIn(p: String) = dataFiles(s"$dir/part=$p").size
    assert(filesIn("hot") > 1, "hot partition must split into multiple files")
    assert(filesIn("hot") <= 8, "bucket count should track ceil(bytes/targetBytes)")
    assert(filesIn("cold") === 1, "small partition stays one file")
    val back = spark.read.parquet(dir)
    assert(back.count() === 20050)
    assert(back.filter(col("part") === "hot").agg(sum("id")).head().getLong(0)
      === (1L to 20000L).sum)
  }

  test("partitioned compaction keeps the Hive layout, one file per partition") {
    val dir = tmpDir("compactp") + "/t"
    val src = (1L to 300L).map(i => (i, s"p${i % 3}", s"row$i")).toDF("id", "part", "v")
    src.repartition(8).write.partitionBy("part").parquet(dir)
    assert(dataFiles(dir).size > 3)

    Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024, Seq("part"))
    assert(dataFiles(dir).size === 3) // one file per partition dir
    for (p <- Seq("p0", "p1", "p2"))
      assert(Files.exists(Paths.get(s"$dir/part=$p")), s"lost partition $p")
    val back = spark.read.parquet(dir)
    assert(back.count() === 300)
    assert(back.select(countDistinct(col("part"))).head().getLong(0) === 3)
  }
}
