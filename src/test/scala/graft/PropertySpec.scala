package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}
import graft.functions.ColumnOps

/** Property-based checks (SURVEY §5.2) driven by scalacheck
  * generators, evaluated in bulk through one Spark job per property.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val hexChar = Gen.oneOf(("0123456789abcdefABCDEF").toSeq)
  private val hex64 = Gen.listOfN(64, hexChar).map(_.mkString)

  test("checksum normalization is idempotent and always lowercase hex64") {
    val inputs = samples(for {
      h <- hex64
      pre <- Gen.oneOf("", "sha256:")
    } yield pre + h, 300)
    val df = inputs.toDF("c")
      .withColumn("n1", ColumnOps.normalizedChecksum(col("c")))
      .withColumn("n2", ColumnOps.normalizedChecksum(col("n1")))
      .withColumn("ok", ColumnOps.isValidChecksum(col("c")))
    assert(df.filter(col("n1") =!= col("n2")).count() === 0)
    assert(df.filter(!col("ok")).count() === 0)
    assert(df.filter(!col("n1").rlike("^[0-9a-f]{64}$")).count() === 0)
  }

  private val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("valid-contract keys always validate; parse round-trips the parts") {
    val keys = samples(for {
      instr <- seg; run <- seg
      y <- Gen.chooseNum(1990, 2030); m <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
    } yield (instr, run, f"raw/$instr/$y%04d/$m%02d/$d%02d/$run/run.json"), 300)
    val df = keys.toDF("instr", "run", "key")
    assert(df.filter(!ColumnOps.isValidS3Path(col("key"))).count() === 0)
    assert(df.filter(ColumnOps.instrumentId(col("key")) =!= col("instr")).count() === 0)
    assert(df.filter(ColumnOps.runId(col("key")) =!= col("run")).count() === 0)
    assert(df.filter(!ColumnOps.fileDateString(col("key")).rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")).count() === 0)
  }

  test("lenient epoch never nulls, regardless of input") {
    val junk = samples(Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), hex64,
      Gen.const("2026-13-45T99:99:99Z"),
      Gen.const("2026-01-15T04:22:31Z")), 300)
    val df = junk.toDF("c").select(ColumnOps.lenientEpoch(col("c")).as("e"))
    assert(df.filter(col("e").isNull).count() === 0)
  }

  test("scalacheck engine-level prop: subject truncation cap") {
    val prop = Prop.forAll(Gen.asciiPrintableStr) { s =>
      s.take(graft.pipeline.Notify.MaxSubjectLen).length <= 100
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("diff digest never aliases distinct payload tuples (random adversarial strings)") {
    import graft.operators.Diff
    // strings drawn from an alphabet INCLUDING the historical marker
    // and separator characters — the shapes that broke the old
    // separator-joined encoding
    val advChar = Gen.oneOf(('a' to 'e') ++ Seq('v', ':', '\u0001', '-'))
    val advStr = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, advChar).map(_.mkString))
    val tuples = samples(Gen.zip(advStr, advStr), 400).distinct
    // same key for every row in `old`, a shifted payload in `new`:
    // every non-identical payload pair must classify as changed
    val oldDf = tuples.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("k", "c1", "c2")
    val newDf = tuples.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, b, a) }.toDF("k", "c1", "c2")
    val changed = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
      .filter(col("change") === "changed").count()
    val expectChanged = tuples.count { case (a, b) => a != b }
    assert(changed === expectChanged)
  }
}
