package graft.functions

import graft.core.TokenGen
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (build brief): media payloads are opaque
  * BINARY columns with typed metadata; decode / frame-sample /
  * feature-extract run as per-partition batch kernels over the bytes.
  *
  * TWO codecs sit behind one [[decode]] dispatch (by magic bytes):
  *
  *  - the GRFT FAKE — a clearly-marked deterministic stand-in (16-byte
  *    header: magic, width, height, n_frames; then w·h bytes per
  *    frame, all splitmix64-generated). It exists because the fake is
  *    bit-replayable in the DuckDB oracle (q_media_*), which a real
  *    codec's output cannot be; and
  *  - a REAL image decode via JDK `javax.imageio` (PNG/BMP/GIF — no
  *    external dependency): one frame of integer luma pixels
  *    (ITU-R BT.601 integer weights, exact arithmetic), exercised by
  *    MultimodalSpec on a PNG built and decoded in-process.
  *
  * Everything downstream of [[decode]] — frame sampling, features,
  * 2×2 resize, the mapPartitions batch shape — is shared by both, so
  * the plumbing the oracles verify is the plumbing real images run
  * through. At cluster scale this is the mapInPandas / mapPartitions
  * pattern: one kernel invocation per batch of rows, no per-row
  * interpreter crossings, payload never leaves the executor.
  */
object Multimodal {

  final case class MediaDoc(doc_id: String, media: Array[Byte],
                            media_type: String, n_bytes: Int)

  final case class FrameFeature(doc_id: String, frame: Int,
                                width: Int, height: Int,
                                mean_px: Double, max_px: Int,
                                frame_hash: Long)

  private def u8(b: Byte): Int = b & 0xff

  /** Deterministic fake media blob for docIndex i: header + frames. */
  def makeBlob(i: Long): MediaDoc = {
    val w = 8 + ((TokenGen.hash2(5L, i) >>> 33) % 25).toInt
    val h = 8 + ((TokenGen.hash2(6L, i) >>> 33) % 25).toInt
    val frames = 1 + ((TokenGen.hash2(7L, i) >>> 33) % 6).toInt
    val body = new Array[Byte](16 + w * h * frames)
    body(0) = 'G'; body(1) = 'R'; body(2) = 'F'; body(3) = 'T'
    body(4) = (w & 0xff).toByte
    body(8) = (h & 0xff).toByte
    body(12) = (frames & 0xff).toByte
    var p = 16
    var f = 0
    while (f < frames) {
      var px = 0
      while (px < w * h) {
        body(p) = (TokenGen.hash3(11L, i, f.toLong * 100000 + px) >>> 56)
          .toByte
        p += 1; px += 1
      }
      f += 1
    }
    val mt = if (i % 3 == 0) "image" else if (i % 3 == 1) "video"
      else "audio"
    MediaDoc(TokenGen.docId(i), body, mt, body.length)
  }

  /** Distributed media table (binary column + typed metadata). */
  def mediaTable(spark: SparkSession, nDocs: Long): Dataset[MediaDoc] = {
    import spark.implicits._
    spark.range(nDocs).map(makeBlob(_))
  }

  /** Decoded media: one integer pixel plane (row-major, 0–255) per
    * frame — the shared contract between the codecs and the feature /
    * resize kernels. */
  final case class DecodedMedia(w: Int, h: Int, frames: Array[Array[Int]])

  /** Codec dispatch by container magic: the GRFT deterministic fake
    * (oracle-replayable) or a real `javax.imageio` decode (PNG/BMP/
    * GIF). Runs inside the partition kernels — per-batch, executor-
    * local, payload never serialized back out. */
  def decode(d: MediaDoc): DecodedMedia = {
    val b = d.media
    if (b.length >= 16 && b(0) == 'G' && b(1) == 'R' && b(2) == 'F' &&
      b(3) == 'T') decodeFake(b)
    else if (isImage(b)) decodeImage(b, d.doc_id)
    else throw new IllegalArgumentException(
      s"unknown media container in ${d.doc_id}")
  }

  private def decodeFake(b: Array[Byte]): DecodedMedia = {
    val w = u8(b(4))
    val h = u8(b(8))
    val n = u8(b(12))
    DecodedMedia(w, h, Array.tabulate(n)(f =>
      Array.tabulate(w * h)(i => u8(b(16 + f * w * h + i)))))
  }

  private def isImage(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((u8(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))

  /** Real single-frame image decode (JDK ImageIO — no external deps):
    * pixels become integer luma via the ITU-R BT.601 weights in exact
    * integer arithmetic, (299·R + 587·G + 114·B) / 1000. */
  def decodeImage(b: Array[Byte], id: String): DecodedMedia = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, s"imageio could not decode $id")
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val bl = rgb & 0xff
        px(y * w + x) = (299 * r + 587 * g + 114 * bl) / 1000
        x += 1
      }
      y += 1
    }
    DecodedMedia(w, h, Array(px))
  }

  /** Decode + frame-sample + per-frame features, as a partition-batch
    * kernel (the mapInPandas shape). `frameStride` samples every k-th
    * frame. */
  def frameFeatures(docs: Dataset[MediaDoc], frameStride: Int = 1)
                   (implicit spark: SparkSession): Dataset[FrameFeature] = {
    import spark.implicits._
    docs.mapPartitions(_.flatMap(frameFeaturesOf(_, frameStride)))
  }

  final case class ResizedFrame(doc_id: String, frame: Int,
                                w2: Int, h2: Int,
                                mean_pooled: Double, max_pooled: Double,
                                pool_checksum: Long)

  /** RESIZE step of the media pipeline (the brief's decode →
    * frame-sample → resize → feature-extract chain): 2×2 mean pooling
    * per sampled frame — the deterministic stand-in for a real
    * interpolating resampler, with the same plumbing shape (per-frame
    * kernel over the decoded pixel buffer; odd edge rows/cols dropped,
    * floor dims). Every output is exact arithmetic: pooled values are
    * integer sums / 4 (binary-exact), their mean divides an exact
    * quarter-integer sum, and the checksum is the integer pixel sum of
    * the pooled region — so the DuckDB replay compares bit-for-bit. */
  def resizedFeatures(docs: Dataset[MediaDoc], frameStride: Int = 1)
                     (implicit spark: SparkSession): Dataset[ResizedFrame] = {
    import spark.implicits._
    docs.mapPartitions(_.flatMap(resizedFeaturesOf(_, frameStride)))
  }

  def resizedFeaturesOf(d: MediaDoc, frameStride: Int)
  : Iterator[ResizedFrame] = {
    val m = decode(d)
    val w = m.w
    val w2 = m.w / 2
    val h2 = m.h / 2
    (0 until m.frames.length by frameStride).iterator.map { f =>
      val px = m.frames(f)
      var sum4 = 0L // Σ of the 4-px cell sums = integer checksum
      var mx = 0.0
      var s = 0.0
      var cy = 0
      while (cy < h2) {
        var cx = 0
        while (cx < w2) {
          val p = (2 * cy) * w + 2 * cx
          val cell = px(p) + px(p + 1) + px(p + w) + px(p + w + 1)
          val pooled = cell / 4.0
          sum4 += cell
          s += pooled
          if (pooled > mx) mx = pooled
          cx += 1
        }
        cy += 1
      }
      ResizedFrame(d.doc_id, f, w2, h2,
        if (w2 * h2 > 0) s / (w2 * h2) else 0.0, mx, sum4)
    }
  }

  /** The pure per-doc frame kernel (shared by the Spark path and the
    * oracle truth dump). */
  def frameFeaturesOf(d: MediaDoc, frameStride: Int)
  : Iterator[FrameFeature] = {
    val m = decode(d)
    val n = m.w * m.h
    (0 until m.frames.length by frameStride).iterator.map { f =>
      val px = m.frames(f)
      var s = 0L
      var mx = 0
      var hsh = 1469598103934665603L // FNV-1a
      var i = 0
      while (i < n) {
        val v = px(i)
        s += v
        if (v > mx) mx = v
        hsh = (hsh ^ v) * 1099511628211L
        i += 1
      }
      FrameFeature(d.doc_id, f, m.w, m.h, s.toDouble / n, mx, hsh)
    }
  }
}
