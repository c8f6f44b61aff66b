package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image / audio / video payloads are
  * opaque BinaryType columns (or arrays of them, one per frame) with
  * typed metadata alongside. The decode path is REAL: frames are
  * genuine PNG byte streams decoded with `javax.imageio` (JDK-public,
  * zero external deps), and the resize operates on the actual decoded
  * raster. Test fixtures synthesize deterministic grayscale test
  * patterns so an external engine (the DuckDB oracle) can predict the
  * decoded pixels arithmetically — any break in the encode → decode →
  * resize chain changes the pixel digests and fails the comparison.
  *
  * At 100 TB: payloads ride in parquet binary columns (or are
  * re-fetched by path via the binaryFile source); decode runs
  * per-partition so codec state is reused across rows; metadata-only
  * queries never touch payload bytes thanks to parquet column
  * pruning. Per-frame grain (one row per decoded frame) keeps memory
  * bounded by frame size, not clip size.
  */
object Multimodal {

  /** A media clip: one encoded PNG byte stream per frame. Container
    * demux (mp4/webm → frame streams) is out of scope; the per-frame
    * codec decode is the real computation.
    */
  final case class MediaClip(doc_id: Long, frames: Seq[Array[Byte]])

  /** One decoded frame: real dimensions from the codec, the raw
    * grayscale raster (row-major, one byte per pixel), and a sampled
    * pixel digest (64-step diagonal walk) for cheap content identity.
    */
  final case class DecodedFrame(
      doc_id: Long,
      frame_idx: Int,
      n_frames: Int,
      width: Int,
      height: Int,
      pixels: Array[Byte],
      digest: Long)

  /** One nearest-neighbor-resized frame. scale_*_bp are basis-point
    * scale factors target/source; resized_digest is a 64-step
    * permuted-walk fold over the resized raster (ox = i, oy = i*37
    * mod outH — gcd(37, 64) = 1 so the walk hits 64 distinct rows
    * AND columns, catching transposed or mis-strided resize bugs a
    * plain diagonal would miss).
    */
  final case class ResizedFrame(
      doc_id: Long,
      frame_idx: Int,
      out_w: Int,
      out_h: Int,
      scale_x_bp: Long,
      scale_y_bp: Long,
      resized_digest: Long)

  /** Deterministic grayscale test pattern, the fixture contract shared
    * with the DuckDB oracle: pixel (x, y) of frame f in clip docId is
    * (7x + 13y + 31·docId + 101·f) mod 256.
    */
  def patternPixel(docId: Long, frame: Int, x: Int, y: Int): Int =
    ((x * 7L + y * 13L + docId * 31L + frame * 101L) % 256L).toInt

  /** Fixture clip geometry: width 16..32, height 16..28, 1..3 frames,
    * all derived from doc_id so the oracle can replay them.
    */
  def clipDims(docId: Long): (Int, Int, Int) =
    ((16 + (docId % 17)).toInt, (16 + (docId % 13)).toInt, (1 + (docId % 3)).toInt)

  /** Encode one test-pattern frame to real PNG bytes via javax.imageio. */
  def encodePng(docId: Long, frame: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, patternPixel(docId, frame, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic PNG clip per doc_id. mapPartitions so
    * encoder state (and the ImageIO disk-cache opt-out) is set up once
    * per partition, not per row.
    */
  def syntheticClips(ids: DataFrame): Dataset[MediaClip] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false) // in-memory streams; no temp-file churn
      it.map { id =>
        val (w, h, nf) = clipDims(id)
        MediaClip(id, (0 until nf).map(f => encodePng(id, f, w, h)))
      }
    }
  }

  /** 64-step diagonal-walk digest over a raster: sample i maps to
    * (i·w/64, i·h/64) — resolution-independent, covers both axes.
    */
  def diagDigest(px: Array[Byte], w: Int, h: Int): Long = {
    var acc = 1125899906842597L
    var i = 0
    while (i < 64) {
      val sx = i * w / 64
      val sy = i * h / 64
      acc = acc * 31L + (px(sy * w + sx) & 0xff)
      i += 1
    }
    acc
  }

  /** REAL decode: each frame's PNG bytes through `ImageIO.read`, one
    * output row per frame with codec-reported dimensions, the gray
    * raster, and the diagonal pixel digest. mapPartitions so a
    * stateful codec would amortize init per partition.
    */
  def decodeFrames(clips: Dataset[MediaClip]): Dataset[DecodedFrame] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { clip =>
        val nf = clip.frames.length
        clip.frames.iterator.zipWithIndex.map { case (bytes, f) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) = raster.getSample(x, y, 0).toByte
              x += 1
            }
            y += 1
          }
          DecodedFrame(clip.doc_id, f, nf, w, h, px, diagDigest(px, w, h))
        }
      }
    }
  }

  /** Keep every `stride`-th frame (frame_idx 0, stride, 2·stride, …):
    * the sampling step between decode and feature extraction. Column
    * filter, so it stays a typed Dataset and pushes through codegen.
    */
  def frameSample(decoded: Dataset[DecodedFrame], stride: Int): Dataset[DecodedFrame] =
    decoded.filter(col("frame_idx") % stride === 0)

  /** REAL nearest-neighbor resize over the decoded raster: output
    * pixel (ox, oy) samples source (ox·w/outW, oy·h/outH). Digest is
    * the permuted 64-step walk over the resized raster (see
    * [[ResizedFrame]]).
    */
  def resizeNearest(decoded: Dataset[DecodedFrame], outW: Int, outH: Int): Dataset[ResizedFrame] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val out = new Array[Byte](outW * outH)
      var oy = 0
      while (oy < outH) {
        val sy = oy * d.height / outH
        var ox = 0
        while (ox < outW) {
          val sx = ox * d.width / outW
          out(oy * outW + ox) = d.pixels(sy * d.width + sx)
          ox += 1
        }
        oy += 1
      }
      var acc = 1125899906842597L
      var i = 0
      while (i < 64) {
        val ox = i % outW
        val py = (i * 37) % outH
        acc = acc * 31L + (out(py * outW + ox) & 0xff)
        i += 1
      }
      ResizedFrame(d.doc_id, d.frame_idx, outW, outH,
        outW * 10000L / d.width, outH * 10000L / d.height, acc)
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
}
