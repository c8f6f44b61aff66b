package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.{TextFunctions => T}

/** Categorical feature encoding for training-data pipelines: the two
  * standard regimes, each with the other as its escape hatch.
  *
  *  - [[dictionary]] / [[encode]]: frequency-ranked dense integer
  *    codes for BOUNDED-cardinality columns (language, source,
  *    market segment). The vocab is collected through a guarded
  *    TakeOrdered — callers state the cardinality contract via
  *    `maxVocab` and get an exception, not a driver OOM, when a
  *    column breaks it.
  *  - [[featureHash]]: the hashing trick (Weinberger et al., ICML
  *    2009) for UNBOUNDED vocabularies — tokens map to a fixed
  *    `dim`-bucket index via the repo's md5Int32, so the feature
  *    space never grows, nothing is collected, and the whole path is
  *    per-row codegen + one hash aggregate. Collisions are the
  *    documented tradeoff, bounded by dim.
  */
object Encoding {

  /** Frequency-ranked vocabulary of one categorical column:
    * (value, code, n_rows) with code 0 for the most frequent value,
    * ties broken by value ascending — deterministic across engines,
    * runs, and layouts. The plan is one hash aggregate + TakeOrdered
    * (no global sort); the collect is the vocab itself, which the
    * `maxVocab` contract bounds.
    */
  def dictionary(df: DataFrame, column: String, maxVocab: Int): DataFrame = {
    val spark = df.sparkSession
    val counts = df.groupBy(col(column).as("value"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col("value").asc)
      .limit(maxVocab + 1)
      .collect()
    require(counts.length <= maxVocab,
      s"$column exceeds the maxVocab=$maxVocab contract — " +
        "use featureHash for unbounded vocabularies")
    val rows = counts.zipWithIndex.map { case (r, i) =>
      Row(r.get(0), i.toLong, r.getLong(1))
    }
    val schema = StructType(Seq(
      StructField("value", df.schema(column).dataType),
      StructField("code", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }

  /** Replace `column` with its dictionary code as `outName` — a
    * broadcast equi-join against the vocab (inner: encoding with a
    * stale dictionary should drop-and-count, not invent codes;
    * callers wanting an explicit unknown code union a sentinel row
    * into the dictionary).
    */
  def encode(df: DataFrame, dict: DataFrame, column: String,
      outName: String): DataFrame =
    df.join(broadcast(dict.select(col("value").as(column),
        col("code").as(outName))), column)
      .drop(column)

  /** Hashing-trick sparse features: one (id, feature_idx, n) row per
    * document and occupied bucket, feature_idx = md5Int32(token) mod
    * dim. No vocabulary, no driver state, no shuffle before the
    * final (id, bucket) hash aggregate.
    */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    docs.select(col(idCol).as("id"), explode(T.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("id"), pmod(T.md5Int32(col("tok")), lit(dim.toLong)).as("feature_idx"))
      .groupBy(col("id"), col("feature_idx"))
      .agg(count(lit(1)).as("n"))
  }
}
