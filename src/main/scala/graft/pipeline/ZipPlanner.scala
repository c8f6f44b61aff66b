package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zip-export planning (SURVEY §2.8 K6; reference:
  * lambda/agf_zip_generator_lambda.py). The relational part — size
  * validation (V6) and duplicate-basename disambiguation (W1) — is
  * DataFrame logic; the byte-streaming itself is a file-service
  * utility, deliberately out of the query engine.
  */
object ZipPlanner {

  val MaxFileBytes: Long = 1L * 1024 * 1024 * 1024   // 1 GB per file  (ref :27)
  val MaxTotalBytes: Long = 5L * 1024 * 1024 * 1024  // 5 GB per zip   (ref :28)

  final case class ZipValidation(ok: Boolean, totalBytes: Long,
      maxFileBytes: Long, reason: Option[String])

  /** V6: pre-validate (sum, max) against the hard caps — one tiny
    * aggregate, no collect of the listing.
    */
  def validate(files: DataFrame): ZipValidation = {
    val row = files.agg(
      coalesce(sum(col("size")), lit(0L)).as("total"),
      coalesce(max(col("size")), lit(0L)).as("mx")).head()
    val (total, mx) = (row.getLong(0), row.getLong(1))
    if (mx > MaxFileBytes)
      ZipValidation(ok = false, total, mx, Some(s"single file exceeds $MaxFileBytes bytes"))
    else if (total > MaxTotalBytes)
      ZipValidation(ok = false, total, mx, Some(s"total exceeds $MaxTotalBytes bytes"))
    else ZipValidation(ok = true, total, mx, None)
  }

  /** W1: zip entry names — basename, with _1/_2/... inserted before
    * the extension on collisions, in key order (ref :104-114).
    * Suffixed names can themselves collide with a pre-existing
    * literal name (report.txt -> report_1.txt vs an actual
    * report_1.txt); re-rank until unique (bounded — each pass
    * strictly shrinks collision groups).
    */
  def entryNames(files: DataFrame): DataFrame = {
    def suffixPass(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("entry_name")).orderBy(col("key"))
      val stem = when(col("entry_name").contains("."),
        expr("substring(entry_name, 1, length(entry_name) - length(substring_index(entry_name, '.', -1)) - 1)"))
        .otherwise(col("entry_name"))
      val ext = when(col("entry_name").contains("."),
        concat(lit("."), substring_index(col("entry_name"), ".", -1)))
        .otherwise(lit(""))
      df.withColumn("rn", row_number().over(w))
        .withColumn("entry_name",
          when(col("rn") === 1, col("entry_name"))
            .otherwise(concat(stem, lit("_"), col("rn") - 1, ext)))
        .drop("rn")
    }
    var out = files.withColumn("entry_name", substring_index(col("key"), "/", -1))
    var prev: DataFrame = null
    var attempts = 0
    var done = false
    while (!done && attempts < 16) {
      val next = suffixPass(out).cache()
      val dups = next.groupBy("entry_name").count().filter(col("count") > 1).count()
      if (prev != null) prev.unpersist()
      prev = next
      out = next
      done = dups == 0
      attempts += 1
    }
    require(done, "entry name disambiguation did not converge")
    out.withColumn("basename", substring_index(col("key"), "/", -1))
  }

  /** K6: stream (entry_name, payload) rows into a deflate zip at
    * outPath — all-or-nothing (any missing payload aborts before
    * bytes are written), like the reference (ref :119-126). Driver
    * side by design: the reference caps zips at 5 GB, well under
    * driver memory; entries stream one at a time.
    */
  def buildZip(entries: DataFrame, outPath: String): Long = {
    val rows = entries.select(col("entry_name"), col("payload"))
      .collect()
    require(rows.forall(!_.isNullAt(1)), "missing payload — aborting zip")
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(outPath)))
    try {
      rows.foreach { r =>
        out.putNextEntry(new java.util.zip.ZipEntry(r.getString(0)))
        out.write(r.getAs[Array[Byte]](1))
        out.closeEntry()
      }
    } finally out.close()
    rows.length.toLong
  }
}
