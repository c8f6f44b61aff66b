package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.functions.{VectorFunctions => V}

/** The native DotProduct expression must be bit-identical to the
  * higher-order builtin formulation (same widen + fold order), in
  * both interpreted and codegen paths, and usable from SQL.
  */
class VectorExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot equals builtin dot bit-for-bit on float arrays") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.5f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.4f, 0.5f, 0.6f)),
      (Seq.empty[Float], Seq.empty[Float]))
      .toDF("a", "b")
    val got = df.select(V.dot(col("a"), col("b")).as("n"),
      V.dotBuiltin(col("a"), col("b")).as("r")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native dot equals builtin on the real embeddings table") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = emb.limit(100).select(
      V.dot(col("embedding"), col("embedding")).as("n"),
      V.dotBuiltin(col("embedding"), col("embedding")).as("r"))
      .filter(col("n") =!= col("r"))
    assert(d.count() === 0)
  }

  test("vec_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
    assert(r === 11.0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]])).toDF("a", "b")
    assert(df.select(V.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null elements poison the product like the builtin formulation") {
    val df = Seq((Seq(Some(1.0f), None, Some(2.0f)), Seq(Some(1.0f), Some(1.0f), Some(1.0f))))
      .toDF("a", "b")
    val r = df.select(V.dot(col("a"), col("b")).as("n"),
      V.dotBuiltin(col("a"), col("b")).as("r")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native md5 int arrays equal the builtin conv/substr formulation") {
    import graft.expressions.HashFunctions
    import graft.functions.{TextFunctions => T}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(T.shingles(col("text"), 3).as("sh"))
    val d32 = docs.select(
      HashFunctions.md5_int_array32(col("sh")).as("n"),
      transform(col("sh"), T.md5Int32 _).as("r"))
      .filter(col("n") =!= col("r"))
    assert(d32.count() === 0)
    val d60 = docs.select(
      HashFunctions.md5_int_array60(col("sh")).as("n"),
      transform(col("sh"), T.md5Int60 _).as("r"))
      .filter(col("n") =!= col("r"))
    assert(d60.count() === 0)
  }
}
