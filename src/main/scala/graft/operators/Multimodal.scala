package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image / audio / video payloads are
  * opaque BinaryType columns with typed metadata alongside. The
  * Spark-side plumbing (schemas, batch shapes, partitioning) is real;
  * the actual media decode is STUBBED with a deterministic fake —
  * decode libraries are not available in this environment. Swap
  * `StubDecoder.decode` for a real codec binding in production.
  *
  * At 100 TB: payloads ride in parquet binary columns (or are
  * re-fetched by path via the binaryFile source); decode runs
  * per-partition so codec state is reused across rows; metadata-only
  * queries never touch payload bytes thanks to parquet column
  * pruning.
  */
object Multimodal {

  /** Typed decode output: a fake "image" with dimensions and a
    * per-frame sample digest.
    */
  final case class DecodedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_digests: Seq[Long])

  /** Deterministic stand-in for an image/audio decoder: derives fake
    * dimensions and frame digests purely from payload bytes, so tests
    * are reproducible. A real implementation would call the codec
    * here — per partition, not per row.
    */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte]): DecodedMedia = {
      val n = payload.length
      val width = 16 + (if (n == 0) 0 else (payload(0) & 0x7f))
      val height = 16 + (if (n < 2) 0 else (payload(1) & 0x7f))
      val frames = math.max(1, n / 64)
      val digests = (0 until math.min(frames, 8)).map { f =>
        payload.slice(f * 64, math.min(n, f * 64 + 64))
          .foldLeft(1125899906842597L)((h, b) => h * 31 + (b & 0xff))
      }
      DecodedMedia(docId, width, height, frames, digests)
    }
  }

  /** Decode a (doc_id, payload) DataFrame into typed media rows.
    * mapPartitions so a real codec would amortize init per partition;
    * the input is pre-projected to the two needed columns so the scan
    * prunes everything else.
    */
  def decodeAll(df: DataFrame): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would happen here, once per partition
        it.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
      }
  }

  /** Pure-SQL binary profiling of a payload column: sizes, header
    * bytes, strided frame samples, content digest. Everything stays
    * in whole-stage codegen — this is the metadata path that must
    * not deserialize media at scale.
    */
  def binaryProfile(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
      lower(hex(substring(col("payload"), 25, 4))).as("frame_1"),
      lower(hex(substring(col("payload"), 49, 4))).as("frame_2"),
      lower(hex(substring(col("payload"), 73, 4))).as("frame_3"),
      md5(col("payload")).as("content_md5"))

  /** One resized, sampled frame. scale_*_bp are basis-point scale
    * factors target/source; resized_digest is the STUB resample —
    * the source digest mixed with the target dims by the same
    * 31-multiplier fold step the decoder uses (a real resampler
    * would recompute from pixels; the Spark-side shape — typed rows,
    * per-frame grain, JVM compute — is what this exercises).
    */
  case class ResizedFrame(
      doc_id: Long,
      frame_idx: Int,
      out_w: Int,
      out_h: Int,
      scale_x_bp: Long,
      scale_y_bp: Long,
      resized_digest: Long)

  /** Keep every `stride`-th frame of the decoded media (frame_idx
    * 0, stride, 2*stride, ...): the sampling step between decode and
    * feature extraction. Pure Column ops — no re-decode.
    */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("doc_id"), col("width"), col("height"),
        posexplode(col("frame_digests")).as(Seq("frame_idx", "digest")))
      .filter(col("frame_idx") % stride === 0)

  /** Stub resize of sampled frames to (targetW, targetH). Typed map
    * (JVM arithmetic wraps like the decoder's fold; ANSI Column math
    * would throw on the deliberate overflow).
    */
  def resizeStub(sampled: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedFrame] = {
    val spark = sampled.sparkSession
    import spark.implicits._
    sampled.select(col("doc_id").cast("long"), col("frame_idx").cast("int"),
        col("width").cast("int"), col("height").cast("int"),
        col("digest").cast("long"))
      .as[(Long, Int, Int, Int, Long)]
      .map { case (id, idx, w, h, digest) =>
        ResizedFrame(id, idx, targetW, targetH,
          math.floor(targetW * 10000.0 / w).toLong,
          math.floor(targetH * 10000.0 / h).toLong,
          digest * 31L + (targetW * 31L + targetH))
      }
  }
}
