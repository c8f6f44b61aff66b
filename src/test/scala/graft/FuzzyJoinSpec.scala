package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("finds substitution, insertion, deletion, and compound pairs at dist <= 2") {
    val names = Seq("blue bolt", "blue belt", "blue boltt", "lue bol",
      "red widget", "red midget", "green gear")
      .toDF("name")
    val got = FuzzyJoin.fuzzyPairs(names, "name", maxDist = 2)
      .as[(String, String, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("blue belt", "blue bolt")) === 1) // substitution
    assert(got(("blue bolt", "blue boltt")) === 1) // insertion
    assert(got(("blue bolt", "lue bol")) === 2) // two deletions
    assert(got(("blue belt", "blue boltt")) === 2) // sub + insert
    assert(got(("red midget", "red widget")) === 1)
    assert(!got.keys.exists(p => p._1 == "green gear" || p._2 == "green gear"),
      "green gear matches nothing")
  }

  test("blocked pairs equal the exhaustive cross-compare on the real names") {
    val parts = Tables.part(spark, "/root/testdata/sf0.001")
    val blocked = FuzzyJoin.fuzzyPairs(parts, "p_name", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    val names = parts.select(col("p_name")).distinct().as[String].collect()
    val naive = (for {
      a <- names; b <- names if a < b
      d = levenshteinDist(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(blocked === naive)
    assert(blocked.nonEmpty, "expected some fuzzy pairs in the part names")
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
