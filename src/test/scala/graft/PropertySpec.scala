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

  test("winnowing guarantee: a shared (window+n-1)-word run always yields a shared fingerprint") {
    import graft.operators.Dedup
    // random word soups with a common 6-word run planted at random
    // offsets (window=4, n=3: any shared 6-word run spans a full
    // window on both sides, so its minimum must be selected in both)
    val word = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    val run = samples(word, 6)
    val docs = samples(
      for {
        nPre <- Gen.chooseNum(0, 10)
        nPost <- Gen.chooseNum(0, 10)
        pre <- Gen.listOfN(nPre, word)
        post <- Gen.listOfN(nPost, word)
      } yield (pre ++ run ++ post).mkString(" "), 40)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val fps = Dedup.winnowedFingerprints(docs.toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // every pair shares the planted run -> every pair shares >= 1 fp
    for (i <- docs.indices; j <- (i + 1) until docs.size)
      assert((fps(i.toLong) intersect fps(j.toLong)).nonEmpty,
        s"docs $i and $j share a 6-word run but no fingerprint")
  }

  test("temperature mix: rate monotone in inverse domain size, total near target") {
    import graft.operators.Sampling
    val sizes = Seq("a" -> 2000, "b" -> 500, "c" -> 120, "d" -> 30)
    val docs = sizes.zipWithIndex.flatMap { case ((src, n), k) =>
      (1 to n).map(i => ((k * 100000 + i).toLong, src))
    }.toDF("doc_id", "src")
    val mix = Sampling.temperatureMix(docs, "doc_id", "src", targetTotal = 400L)
    val rates = mix.select("src", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    // sqrt damping: smaller domains keep strictly higher rates
    assert(rates("a") < rates("b") && rates("b") < rates("c") && rates("c") < rates("d"),
      rates.toString)
    val n = mix.count()
    assert(n > 300 && n < 500, s"expected ~400, got $n")
  }
}
