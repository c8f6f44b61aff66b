package graft

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams

/** Stateful streaming results must be state-store-provider-independent:
  * the same dedup and sessionization outputs under the default
  * HDFS-backed provider and under RocksDB (the bounded-heap provider a
  * cluster deployment uses — see GraftSession.withRocksDbStateStore).
  */
class RocksDbStateStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Run the streaming-dedup scenario and return (ids, sawRocksDbMetrics). */
  private def runDedup(): (Seq[Long], Boolean) = {
    val root = tmpDir("rocksdb_dedup")
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    Seq((10L, t(1000), "a"), (11L, t(1010), "b"))
      .toDF("event_id", "ts", "payload").coalesce(1)
      .write.parquet(s"$root/b1")
    Seq((10L, t(1005), "a-dup"), (12L, t(1020), "c"))
      .toDF("event_id", "ts", "payload").coalesce(1)
      .write.parquet(s"$root/b2")
    val schema = spark.read.parquet(s"$root/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(root)
    val deduped = EventStreams.dedupStreaming(stream, Seq("event_id"), "ts", "10 minutes")
    val name = s"rdb_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rocks = q.recentProgress.flatMap(_.stateOperators)
      .exists(_.customMetrics.keySet.stream.anyMatch(_.toLowerCase.contains("rocksdb")))
    (spark.table(name).select("event_id").as[Long].collect().sorted.toSeq, rocks)
  }

  test("streaming dedup is identical under HDFS-backed and RocksDB state stores") {
    val previous = spark.conf.getOption(ProviderKey)
    val (defaultIds, defaultRocks) = runDedup()
    assert(defaultIds === Seq(10L, 11L, 12L))
    assert(!defaultRocks, "default provider unexpectedly reported RocksDB metrics")
    try {
      spark.conf.set(ProviderKey, GraftSession.RocksDbProvider)
      val (rocksIds, sawRocks) = runDedup()
      assert(rocksIds === defaultIds)
      assert(sawRocks, "RocksDB provider configured but no rocksdb state metrics seen")
    } finally previous match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("transformWithState profile accumulates across forced micro-batch splits") {
    val root = tmpDir("tws_profile")
    // two files, maxFilesPerTrigger=1 -> the same user spans batches,
    // so state must survive and the monotone-max contract must hold
    Seq((1L, "click", 100L), (1L, "view", 50L), (2L, "click", 10L))
      .toDF("user_id", "event_type", "value_c").coalesce(1)
      .write.parquet(s"$root/b1")
    Seq((1L, "click", 25L), (2L, "purchase", 300L))
      .toDF("user_id", "event_type", "value_c").coalesce(1)
      .write.parquet(s"$root/b2")
    val previous = spark.conf.getOption(ProviderKey)
    try {
      spark.conf.set(ProviderKey, GraftSession.RocksDbProvider)
      val schema = spark.read.parquet(s"$root/b1").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(root)
        .as[(Long, String, Long)]
      val out = stream.groupByKey(_._1)
        .transformWithState(new EventStreams.UserProfileProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
      val name = s"tws_${System.nanoTime()}"
      val q = out.toDF().writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(q.recentProgress.length >= 2, "expected forced multi-batch run")
      val finalState = spark.table(name)
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max($"n_events").as("n"),
          org.apache.spark.sql.functions.max($"sum_value_c").as("s"),
          org.apache.spark.sql.functions.max($"n_types").as("t"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (u, n, s, t) => u -> ((n, s, t)) }.toMap
      assert(finalState === Map(
        1L -> ((3L, 175L, 2L)),
        2L -> ((2L, 310L, 2L))))
    } finally previous match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
