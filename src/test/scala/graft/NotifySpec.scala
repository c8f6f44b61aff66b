package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Notify, ZipPlanner}

class NotifySpec extends SparkTestBase {
  import spark.implicits._

  private class Mem(val name: String, fail: Boolean) extends Notify.Channel {
    val sent = scala.collection.mutable.ListBuffer[(String, String)]()
    def send(s: String, b: String): Unit =
      if (fail) throw new RuntimeException(s"$name down") else sent += ((s, b))
  }

  test("fallback chain: first failing channel falls through, subject truncated") {
    val sns = new Mem("sns", fail = true)
    val ses = new Mem("ses", fail = false)
    val subject = "x" * 150
    val r = Notify.sendWithFallback(Seq(sns, ses), subject, "body")
    assert(r === Right(Notify.Delivery("ses", "x" * 100)))
    assert(ses.sent.head._1.length === 100)
  }

  test("all channels failing returns every failure") {
    val r = Notify.sendWithFallback(
      Seq(new Mem("a", true), new Mem("b", true)), "s", "b")
    assert(r.isLeft)
    assert(r.left.toOption.get.map(_._1) === List("a", "b"))
  }

  test("observed metrics publish without an extra job") {
    var seen: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
        qe.observedMetrics.get("ingest").foreach { row =>
          seen = Some((row.getAs[Long]("n_rows"), row.getAs[Long]("n_quarantined")))
        }
      }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq(("a", null: String), ("b", "invalid_checksum"))
        .toDF("k", "quarantine_reason")
      Notify.withIngestMetrics(df, "ingest").collect()
      // QueryExecutionListener fires async; poll briefly
      val deadline = System.currentTimeMillis() + 5000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(seen === Some((2L, 1L)))
    } finally spark.listenerManager.unregister(listener)
  }

  test("zip build round-trips entries") {
    val entries = Seq(("a.txt", "hello".getBytes), ("b/c.txt", "world!".getBytes))
      .toDF("entry_name", "payload")
    val out = tmpDir("zip") + "/out.zip"
    assert(ZipPlanner.buildZip(entries.orderBy("entry_name"), out) === 2)
    val zf = new java.util.zip.ZipFile(out)
    try {
      val names = zf.entries().asIterator()
      val got = scala.collection.mutable.Map[String, String]()
      zf.entries().asScala.foreach { e =>
        got(e.getName) = new String(zf.getInputStream(e).readAllBytes())
      }
      assert(got === Map("a.txt" -> "hello", "b/c.txt" -> "world!"))
    } finally zf.close()
  }

  private implicit class EnumOps[A](e: java.util.Enumeration[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = e.hasMoreElements
      def next(): A = e.nextElement()
    }
  }
}
