package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{QualityFunctions => Q}

/** Johnson–Lindenstrauss random projection — dimensionality reduction
  * for embedding pipelines (cheaper downstream ANN / clustering at a
  * bounded distance distortion).
  *
  * The projection matrix is a fixed Achlioptas ±1 sign matrix derived
  * from md5 of the (out-dim, in-dim) index pair, so it is reproducible
  * across engines and runs without shipping state: the Scala plan and
  * the SQL oracle regenerate the identical literals. Per-row work is
  * outDims dot products over a literal matrix — narrow, codegen'd,
  * shuffle-free; at 100 TB this is a pure map stage.
  */
object Projection {

  /** Deterministic ±1.0 sign for projection cell (j, i). */
  def sign(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if ((d(0) & 1) == 0) 1.0 else -1.0
  }

  /** The outDims x inDims sign matrix as plain literals (also used to
    * print the oracle SQL).
    */
  def signMatrix(outDims: Int, inDims: Int): Seq[Seq[Double]] =
    (0 until outDims).map(j => (0 until inDims).map(i => sign(j, i)))

  /** Project `vecCol` (array<float>, inDims wide) to outDims rows
    * (id, dim, value): value_j = floor4(sum_i vec[i] * sign(j,i) /
    * sqrt(outDims)). Exploded long-form output keeps the comparison
    * float-exact per cell and feeds group-wise consumers directly.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, inDims: Int): DataFrame = {
    val mat = typedLit(signMatrix(outDims, inDims))
    val scale = math.sqrt(outDims.toDouble)
    df.select(col(idCol).as("id"),
        posexplode(transform(mat, row =>
          aggregate(
            zip_with(col(vecCol).cast("array<double>"), row, (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) / scale)))
      .select(col("id"), col("pos").cast("long").as("dim"),
        Q.floor4(col("col")).as("value"))
  }
}
