package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the table-to-table change feed (added / removed /
  * changed rows between two versions of a keyed dataset) that backs
  * incremental publishing and audit reports.
  *
  * Scale shape: one full-outer sort-merge join on the key columns —
  * the minimum possible work for an unordered diff — with change
  * classification as a codegen'd projection over the join output.
  * Comparison is over an md5 of the concatenated non-key columns, so
  * wide rows shuffle their digest, not their payload, to the compare.
  */
object Diff {

  /** Rows of `newDf` minus `oldDf` classified per key: 'added'
    * (key only in new), 'removed' (key only in old), 'changed' (key
    * in both, payload digest differs). Unchanged rows are omitted.
    *
    * Injectivity: each payload column contributes a fixed-width
    * 32-char block — md5 of its string form, or a non-hex sentinel
    * for NULL (md5 output is hex, so the sentinel collides with no
    * value digest). Fixed-width blocks mean no value can bleed into
    * its neighbor's encoding, so distinct payload tuples digest
    * distinctly (modulo md5 collisions).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keyCols.contains).sorted
    val nullBlock = "-" * 32
    def digest(df: DataFrame) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("",
          payload.map(c => coalesce(md5(col(c).cast("string")),
            lit(nullBlock))): _*)).as("payload_md5"): _*)
    val o = digest(oldDf).withColumnRenamed("payload_md5", "old_md5")
    val n = digest(newDf).withColumnRenamed("payload_md5", "new_md5")
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
