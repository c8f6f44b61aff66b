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
    // spread (r19, Par scaladoc): the PNG encode (and every decode
    // downstream of it) must not run on a single-split scan
    Par.spread(ids.select(col("doc_id").cast("long").as("doc_id")),
        col("doc_id")).as[Long].mapPartitions { it =>
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

  // ---------------------------------------------------------------
  // Audio: WAV container encode → REAL header + PCM16 decode →
  // windowed integer features. Same fixture philosophy as the PNG
  // path: the synthesized samples are pure integer arithmetic from
  // doc_id, so the oracle predicts every feature without ever
  // parsing a WAV — while the engine's chain really does build and
  // parse RIFF headers and little-endian PCM16 payloads.
  // ---------------------------------------------------------------

  /** One audio clip: a complete, real WAV byte stream (44-byte RIFF
    * PCM header + little-endian int16 mono samples).
    */
  final case class AudioClip(doc_id: Long, wav: Array[Byte])

  /** Windowed features over decoded PCM: all integer-exact (mean
    * square instead of RMS — no sqrt, no doubles), so any engine
    * replays them bit-for-bit.
    */
  final case class AudioFrame(
      doc_id: Long,
      frame_idx: Int,
      n_samples: Int,
      sample_rate: Int,
      mean_square: Long,
      zero_crossings: Long,
      peak: Long)

  /** Fixture contract shared with the oracle: sample i of clip docId
    * is ((31·docId + 7i) mod 2003) − 1001 — a full-swing integer
    * sawtooth, no trig/IEEE anywhere.
    */
  def pcmSample(docId: Long, i: Int): Int =
    (((docId * 31L + i * 7L) % 2003L) - 1001L).toInt

  /** Fixture geometry: 256..511 samples; rate 8 kHz for even ids,
    * 16 kHz for odd (the parsed rate proves the header round-trip).
    */
  def audioDims(docId: Long): (Int, Int) =
    ((256 + (docId % 256)).toInt, if (docId % 2 == 0) 8000 else 16000)

  /** Encode a REAL mono PCM16 WAV: canonical 44-byte RIFF header,
    * then little-endian samples.
    */
  def encodeWav(docId: Long): Array[Byte] = {
    val (n, rate) = audioDims(docId)
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2)      // block align
      .putShort(16)     // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { bb.putShort(pcmSample(docId, i).toShort); i += 1 }
    bb.array()
  }

  /** Synthesize one WAV clip per doc_id. */
  def syntheticWavs(ids: DataFrame): Dataset[AudioClip] = {
    val spark = ids.sparkSession
    import spark.implicits._
    // spread (r19): see syntheticClips
    Par.spread(ids.select(col("doc_id").cast("long").as("doc_id")),
        col("doc_id")).as[Long]
      .map(id => AudioClip(id, encodeWav(id)))
  }

  /** REAL decode + feature extraction: validates the RIFF magic,
    * reads rate/bits/channels/data-size out of the header bytes,
    * decodes the little-endian PCM16 payload, then emits one row per
    * `window`-sample frame every `stride` samples with integer mean
    * square, strict-sign zero crossings, and peak |amplitude|. A
    * broken encoder, a mis-stated header, or an endianness slip
    * fails loudly here (magic/format checks) or flips the feature
    * values (and the driver hash) downstream.
    */
  def decodeWavFrames(clips: Dataset[AudioClip], window: Int = 128,
      stride: Int = 64): Dataset[AudioFrame] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions { it =>
      it.flatMap { clip =>
        val bb = java.nio.ByteBuffer.wrap(clip.wav)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def ascii(off: Int, n: Int) = new String(clip.wav, off, n, "US-ASCII")
        require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE" &&
          ascii(12, 4) == "fmt " && ascii(36, 4) == "data",
          s"not a canonical PCM WAV (doc ${clip.doc_id})")
        require(bb.getShort(20) == 1 && bb.getShort(22) == 1 &&
          bb.getShort(34) == 16,
          s"expected mono PCM16 (doc ${clip.doc_id})")
        val rate = bb.getInt(24)
        val n = bb.getInt(40) / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) { samples(i) = bb.getShort(44 + 2 * i).toInt; i += 1 }
        val nFrames = if (n < window) 0 else (n - window) / stride + 1
        (0 until nFrames).iterator.map { f =>
          val start = f * stride
          var sumSq = 0L
          var zc = 0L
          var peak = 0L
          var j = start
          while (j < start + window) {
            val v = samples(j).toLong
            sumSq += v * v
            if (v.abs > peak) peak = v.abs
            if (j > start && samples(j - 1).toLong * v < 0) zc += 1
            j += 1
          }
          AudioFrame(clip.doc_id, f, n, rate, sumSq / window, zc, peak)
        }
      }
    }
  }

  /** One frame's 64-bit perceptual average-hash, as four 16-bit chunk
    * values (chunk c = bits [16c, 16c+16) — chunked for pigeonhole
    * bucketing AND to keep every engine's arithmetic in safe positive
    * integers; bit 63 of a packed BIGINT would be the sign bit).
    */
  final case class FrameHash(
      doc_id: Long, frame_idx: Int, c0: Long, c1: Long, c2: Long, c3: Long)

  /** aHash over a decoded raster: nearest-neighbor-sample an 8x8
    * grid (sample k at (((k%8)*w)/8, ((k/8)*h)/8) — the resizeNearest
    * mapping), threshold each sample against the grid mean, pack the
    * 64 bits into four 16-bit chunks. The mean test is exact integer
    * cross-multiplication (s*64 >= sum), never a divided average —
    * bit-for-bit replayable from the fixture's pixel formula.
    */
  def aHashChunks(px: Array[Byte], w: Int, h: Int): Array[Long] = {
    val s = new Array[Int](64)
    var tot = 0
    var k = 0
    while (k < 64) {
      val sx = (k % 8) * w / 8
      val sy = (k / 8) * h / 8
      val v = px(sy * w + sx) & 0xff
      s(k) = v
      tot += v
      k += 1
    }
    val out = new Array[Long](4)
    k = 0
    while (k < 64) {
      if (s(k) * 64 >= tot) out(k / 16) |= 1L << (k % 16)
      k += 1
    }
    out
  }

  /** Perceptual hash per REAL decoded frame — the content-identity
    * signal that survives re-encoding and resizing (the 8x8 grid is
    * resolution-independent), which byte-level md5 (binaryProfile)
    * does not.
    */
  def perceptualHashes(decoded: Dataset[DecodedFrame]): Dataset[FrameHash] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { f =>
      val c = aHashChunks(f.pixels, f.width, f.height)
      FrameHash(f.doc_id, f.frame_idx, c(0), c(1), c(2), c(3))
    }
  }

  /** Near-duplicate image pairs by perceptual-hash hamming distance —
    * multimodal dedup, the reason training pipelines compute pHashes
    * at all. Pigeonhole bucketing (the simhashBucketedPairs
    * discipline): a pair within hamming<=3 agrees on at least one of
    * the four 16-bit chunks, so candidates come from an equi-join on
    * (chunk_idx, chunk_val) — never a cross join; the hamming filter
    * runs BEFORE distinct so the dedup shuffle carries near-pairs
    * only. One pre-partitioned cached chunk table feeds both join
    * sides (one shuffle). maxHamming must stay <= 3 for 4 chunks.
    */
  def perceptualNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit pigeonhole covers hamming<=3; got $maxHamming")
    val chunkCols = Seq("c0", "c1", "c2", "c3")
    val chunked = hashes.select(col("doc_id"), col("frame_idx"),
        col("c0"), col("c1"), col("c2"), col("c3"),
        posexplode(array(chunkCols.map(col): _*))
          .as(Seq("chunk_idx", "chunk_val")))
      .repartition(col("chunk_idx"), col("chunk_val"))
      .cache()
    Par.materialize(chunked)
    val hamming = chunkCols.map(c =>
      bit_count(col(s"a.$c").bitwiseXOR(col(s"b.$c"))))
      .reduce(_ + _)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          (col("a.doc_id") < col("b.doc_id") ||
            (col("a.doc_id") === col("b.doc_id") &&
              col("a.frame_idx") < col("b.frame_idx"))))
      .select(col("a.doc_id").as("id1"), col("a.frame_idx").as("frame1"),
        col("b.doc_id").as("id2"), col("b.frame_idx").as("frame2"),
        hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** CLIP-level near-duplicate pairs by frame-hash containment: two
    * clips are near-dups when at least `minSharedBp`/10000 of the
    * smaller clip's DISTINCT frame hashes appear in the other — the
    * video-dedup grain above q246's frame grain (a clip re-cut from
    * another shares most frames; frame-level pairs alone don't say
    * which CLIPS to drop). Distinct-per-clip first, so repeated
    * frames inside one clip never inflate the overlap; candidates
    * come from an exact equi-join on the full 64-bit hash (all four
    * chunks) — no cross join; output is intersection-bounded.
    */
  def clipNearDupPairs(hashes: DataFrame, minSharedBp: Long): DataFrame = {
    val h = Par.materialize(
      hashes.select(col("doc_id"), col("c0"), col("c1"), col("c2"),
        col("c3")).distinct().cache())
    val sizes = h.groupBy(col("doc_id")).agg(count(lit(1)).as("n_hashes"))
    val shared = h.as("a")
      .join(h.as("b"),
        col("a.c0") === col("b.c0") && col("a.c1") === col("b.c1") &&
          col("a.c2") === col("b.c2") && col("a.c3") === col("b.c3") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("n_hashes", "n1"), Seq("id1"))
      .join(sizes.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("n_hashes", "n2"), Seq("id2"))
      .withColumn("containment_bp",
        expr("n_shared * 10000L div least(n1, n2)"))
      .filter(col("containment_bp") >= minSharedBp)
      .select(col("id1"), col("id2"), col("n_shared"), col("n1"),
        col("n2"), col("containment_bp"))
  }

  /** Acoustic fingerprint per clip: the sign bits of consecutive
    * window-energy deltas (the Haitsma-Kalker 2002 shape, energy-band
    * simplification) over the REAL decoded PCM — bit i is set when
    * window i+1 carries more energy than window i. Robust to gain
    * changes (a constant volume scale preserves every comparison) —
    * which byte-level md5 is not. `bits` deltas from the first
    * bits+1 windows; clips with fewer windows are dropped. Per-clip
    * work is a bounded collect_list fold (bits+1 rows), map-side
    * combined.
    */
  def audioFingerprints(frames: Dataset[AudioFrame], bits: Int): DataFrame =
    frames.toDF()
      .filter(col("frame_idx") <= bits)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("mean_square"))))
        .as("ms"), count(lit(1)).as("n_win"))
      .filter(col("n_win") === bits + 1)
      .select(col("doc_id"),
        expr(s"aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) -> " +
          "acc + IF(ms[i+1].mean_square > ms[i].mean_square, " +
          "shiftleft(1L, CAST(i AS INT)), 0L))").as("fp"))

  /** Exact-fingerprint audio dedup groups: clips sharing an acoustic
    * fingerprint collapse to one canonical (min-id) representative —
    * the q20 exact-dedup shape applied to the audio modality. One
    * fingerprint aggregate + one group aggregate; nothing ever
    * compares clip pairs.
    */
  def audioDedupGroups(frames: Dataset[AudioFrame], bits: Int): DataFrame =
    audioFingerprints(frames, bits)
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_clips"), min(col("doc_id")).as("canonical_id"))

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
