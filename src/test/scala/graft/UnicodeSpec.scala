package graft

import org.apache.spark.sql.functions._
import graft.expressions.{NfcNormalize, UnicodeFunctions => U}
import graft.operators.Triangles

class UnicodeSpec extends SparkTestBase {
  import spark.implicits._

  test("NFC composes decomposed sequences and is idempotent") {
    val decomposed = "e\u0301a\u0308" // e + U+0301, a + U+0308
    val composed = "\u00e9\u00e4"     // precomposed U+00E9, U+00E4
    val df = Seq(decomposed, composed, "plain ascii", "").toDF("s")
    val got = df.select(U.nfcNormalize(col("s")).as("n")).as[String].collect()
    assert(got(0) === composed)
    assert(got(1) === composed) // already-NFC input is returned unchanged
    assert(got(2) === "plain ascii")
    assert(got(3) === "")
  }

  test("null in, null out; non-string input is rejected at analysis") {
    val got = Seq(Some("å"), None).toDF("s")
      .select(U.nfcNormalize(col("s")).as("n")).collect()
    assert(got(0).getString(0) === "å")
    assert(got(1).isNullAt(0))
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(U.nfcNormalize(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("normalized keys merge groups that raw keys split") {
    val df = Seq("e\u0301", "\u00e9", "e\u0301").toDF("s")
    assert(df.groupBy(col("s")).count().count() === 2)
    assert(df.groupBy(U.nfcNormalize(col("s"))).count().count() === 1)
  }

  test("SQL-registered functions match their Scala-API twins") {
    import graft.expressions.{HashFunctions, HilbertFunctions}
    val df = spark.range(0, 256)
      .select((col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"),
        concat(lit("w"), col("id")).as("s"))
    df.createOrReplaceTempView("u_sql_v")
    val viaSql = spark.sql(
      "SELECT hilbert_2d(x, y, 4) AS h, graft_nfc(s) AS n, " +
        "md5_int_array(array(s), 32) AS a FROM u_sql_v ORDER BY h")
    val viaApi = df.select(
      HilbertFunctions.hilbert2d(col("x"), col("y"), 4).as("h"),
      U.nfcNormalize(col("s")).as("n"),
      HashFunctions.md5_int_array32(array(col("s"))).as("a")).orderBy(col("h"))
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
  }

  test("SQL registration rejects a non-literal bits argument") {
    spark.range(1).createOrReplaceTempView("u_sql_one")
    val err = intercept[Exception] {
      spark.sql("SELECT hilbert_2d(id, id, cast(id as int)) FROM u_sql_one").collect()
    }
    assert(err.getMessage.contains("literal int"))
  }

  test("triangle counts: 4-clique minus an edge has two triangles sharing an edge") {
    // K4 on {1,2,3,4} without edge {1,4}: triangles {1,2,3} and {2,3,4}
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 4L)) // includes a duplicate direction and a self-loop
      .toDF("src", "dst")
    val got = Triangles.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle counts: hub star has no triangles, closing one edge makes one") {
    val star = (2L to 20L).map(i => (1L, i)).toDF("src", "dst")
    assert(Triangles.triangleCounts(star, "src", "dst").count() === 0)
    val closed = star.union(Seq((7L, 8L)).toDF("src", "dst"))
    val got = Triangles.triangleCounts(closed, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  test("clustering coefficients: triangle-with-tail separates closed from open neighborhoods") {
    // triangle {1,2,3} plus pendant 4 attached to 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Triangles.clusteringCoefficients(edges, "src", "dst")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 10000L)), "deg-2 node in a triangle is fully clustered")
    assert(got(2L) === ((2L, 1L, 10000L)))
    // node 3: degree 3, one closed pair of three -> 2*1*10000 div 6 = 3333
    assert(got(3L) === ((3L, 1L, 3333L)))
    assert(got(4L) === ((1L, 0L, 0L)), "degree-1 node reports 0, not a division error")
  }
}
