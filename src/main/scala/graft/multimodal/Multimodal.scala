package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The pattern for image/audio/video at scale: keep the raw bytes in a
  * binary column, run decode/feature-extraction per partition in batches,
  * and land a typed metadata struct next to the payload. The Spark-side
  * plumbing — schema, `Dataset` encoders, `mapPartitions` batch shape,
  * partition sizing — is real and tested, and IMAGE decode is real too:
  * pure-JRE `javax.imageio` ([[decodeImage]] — PNG/JPEG/BMP/GIF) feeds true
  * pixels to metadata, resize, and pHash. Payloads no JRE codec accepts
  * (text stand-ins, audio/video containers) take a clearly-marked
  * deterministic fallback (`decodeStub`); a production build adds JNI /
  * native codecs for those behind the same signature.
  *
  * `mapPartitions` (not a per-row UDF) so a real decoder can amortize model/
  * codec init once per partition — the standard batch-inference shape.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      payload_sha: String,
      width: Int,
      height: Int)

  /** Stand-in media payloads: the document text's UTF-8 bytes. In a real
    * pipeline this column arrives as image/audio bytes from the source. */
  def asBinaryPayloads(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** REAL image decode — pure-JRE `javax.imageio` (PNG/JPEG/BMP/GIF, no
    * native codecs needed): returns the true geometry plus 8-bit luma
    * pixels (BT.601 integer weights — deterministic), or None when the
    * payload isn't a decodable image, in which case callers fall back to
    * the deterministic non-image stub so non-media payloads still flow. */
  /** Magic-byte sniff (PNG/JPEG/GIF/BMP) so non-image payloads skip the
    * ImageIO reader machinery entirely — the common case in a mixed corpus
    * is "not an image", and that answer must cost a few byte compares, not
    * a codec-registry scan per row. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 14 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      // BMP's 2-byte magic is plain ASCII ("BM…" text would pass); also
      // require the 4 reserved header bytes at offsets 6-9 to be zero —
      // impossible in UTF-8 text, mandatory in a real BMP
      (p(0) == 'B' && p(1) == 'M' &&
        p(6) == 0 && p(7) == 0 && p(8) == 0 && p(9) == 0))

  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (!looksLikeImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            px(y * w + x) = lum.toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, px))
      }
    } catch { case _: Exception => None }

  /** Deterministic synthetic PNG — REAL codec bytes (the JRE's PNG writer)
    * over a seed-keyed dense-spectrum pattern, so the decode path runs on
    * true compressed images at the verify SF without media fixtures in the
    * repo. */
  def syntheticPng(seed: Long, w: Int, h: Int, perturb: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val s = seed * graft.functions.PortableHash.A
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y * 13 + (s >>> ((x + y) % 24)).toInt) & 0xFF
        val g = (x * 31 + y * 3 + (s >>> ((x * 2 + y) % 16)).toInt) & 0xFF
        val b = (x * 17 + y * 29 + s.toInt) & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    if (perturb) {
      // nudge a short pixel run — a small REAL image edit (PNG is
      // lossless, so it survives the codec round-trip) for near-dup tests
      val py = math.min(5, h - 1)
      var x = 4
      while (x < math.min(w, 12)) {
        val rgb = img.getRGB(x, py)
        val r2 = math.min(255, ((rgb >> 16) & 0xFF) + 24)
        img.setRGB(x, py, (r2 << 16) | (rgb & 0xFFFF))
        x += 1
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic non-image fallback (a fake header parse) for payloads
    * no JRE codec accepts — text stand-ins, unsupported containers. */
  private def decodeStub(r: MediaRecord): MediaMeta = {
    val md = MessageDigest.getInstance("SHA-256")
    val sha = md.digest(r.payload).map("%02x".format(_)).mkString
    val n = r.payload.length
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = n,
      payload_sha = sha,
      width = 64 + n % 512,
      height = 64 + (n / 7) % 512)
  }

  /** Decode/feature-extract pass: binary payloads → typed metadata, executed
    * per partition so decoder setup cost is paid once per task, not per row.
    * Decodable images report their REAL geometry ([[decodeImage]]); other
    * payloads take the deterministic fallback. */
  def extractMetadata(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.as[MediaRecord].mapPartitions { it =>
      // per-partition init goes here (codec handles, model weights, …)
      val md = MessageDigest.getInstance("SHA-256")
      it.map { r =>
        decodeImage(r.payload) match {
          case Some((w, h, _)) =>
            MediaMeta(r.doc_id, r.payload.length,
              md.digest(r.payload).map("%02x".format(_)).mkString, w, h)
          case None => decodeStub(r)
        }
      }
    }
  }

  final case class FrameRecord(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame-sampling window in bytes — stands in for a codec's GOP/frame
    * stride. */
  val FrameStride = 256
  val MaxFrames = 8

  /** STUB frame-sample: treat the payload as `FrameStride`-byte frames and
    * emit up to `MaxFrames` of them (a real implementation seeks keyframes
    * with a codec). The 1→N fan-out is the operative plumbing: a lazy
    * iterator flatMap inside `mapPartitions`, so memory is bounded by one
    * frame — never the whole exploded partition — regardless of payload
    * size. */
  def sampleFrames(spark: SparkSession, payloads: DataFrame): Dataset[FrameRecord] = {
    import spark.implicits._
    payloads.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        val frames = math.min(MaxFrames, (n + FrameStride - 1) / FrameStride)
        Iterator.tabulate(frames) { i =>
          FrameRecord(r.doc_id, i,
            java.util.Arrays.copyOfRange(r.payload, i * FrameStride, math.min(n, (i + 1) * FrameStride)))
        }
      }
    }
  }

  final case class PatchRecord(
      doc_id: Long, px: Int, py: Int, x0: Int, y0: Int, pw: Int, ph: Int)

  /** ViT-style patch grid over decoded image geometry: patches of
    * `patch`×`patch` pixels anchored every `stride` pixels, edge patches
    * clipped to the image (partial patches kept — the padding-vs-drop
    * choice belongs to the model's preprocessor, and clipping keeps the
    * grid's coverage exact). Geometry-only here (the decoder is the
    * honest stub): the real kernel crops payload bytes per patch, and
    * this 2-D fan-out — a lazy iterator inside `mapPartitions`, memory
    * bounded by one patch row regardless of image size — is the
    * production plumbing a vision-pretraining pipeline needs. */
  def patchGrid(
      spark: SparkSession,
      meta: Dataset[MediaMeta],
      patch: Int = 224,
      stride: Int = 160): Dataset[PatchRecord] = {
    import spark.implicits._
    meta.mapPartitions { it =>
      it.flatMap { m =>
        val nx = (m.width + stride - 1) / stride
        val ny = (m.height + stride - 1) / stride
        Iterator.tabulate(ny * nx) { i =>
          val py = i / nx
          val px = i % nx
          val x0 = px * stride
          val y0 = py * stride
          PatchRecord(m.doc_id, px, py, x0, y0,
            math.min(patch, m.width - x0), math.min(patch, m.height - y0))
        }
      }
    }
  }

  /** Non-image resize fallback: clamp/pad the payload to exactly `w*h`
    * bytes. Shape contract of a resize kernel: fixed-size output per row,
    * independent of input size. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, w * h)

  /** Area-mean resample of an 8-bit luma grid to `dw`×`dh` — the real
    * pixel path of [[resizeAll]]/[[perceptualHash]] (box filter:
    * deterministic integer-bounded cells, the standard pre-DCT downscale). */
  def areaMean(sw: Int, sh: Int, px: Array[Byte], dw: Int, dh: Int): Array[Byte] = {
    val out = new Array[Byte](dw * dh)
    var gy = 0
    while (gy < dh) {
      val y0 = math.min(sh - 1, gy * sh / dh)
      val y1 = math.max(y0 + 1, (gy + 1) * sh / dh)
      var gx = 0
      while (gx < dw) {
        val x0 = math.min(sw - 1, gx * sw / dw)
        val x1 = math.max(x0 + 1, (gx + 1) * sw / dw)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += (px(y * sw + x) & 0xFF); x += 1 }
          y += 1
        }
        out(gy * dw + gx) = (s / ((y1 - y0).toLong * (x1 - x0))).toByte
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Resize pass over a payload column — same per-partition batch shape as
    * [[extractMetadata]]. Decodable images get a REAL area-mean luma
    * resample; other payloads the byte-clamp fallback. */
  def resizeAll(spark: SparkSession, payloads: DataFrame, w: Int, h: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    payloads.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val out = decodeImage(r.payload) match {
          case Some((sw, sh, gray)) => areaMean(sw, sh, gray, w, h)
          case None => resizeStub(r.payload, w, h)
        }
        MediaRecord(r.doc_id, out)
      }
    }
  }

  final case class PHashRecord(doc_id: Long, phash: Long)

  /** Perceptual hash (the classic DCT pHash): block-mean the "pixels" down
    * to a 32×32 grid, 2-D DCT-II, keep the top-left 8×8 low-frequency
    * block, threshold each coefficient against the median (DC excluded) →
    * 64-bit fingerprint. Everything from pixels onward is the REAL
    * published algorithm — deterministic integer/double math — and for
    * decodable images the pixels are REAL too (javax.imageio luma,
    * area-meaned onto the grid); non-image payloads fall back to raw
    * bytes so the text stand-ins still hash. Key property (what near-dup
    * needs): identical payloads hash identically, and small pixel
    * perturbations flip few low-frequency bits.
    *
    * Cost shape: one `mapPartitions` pass, fixed 32×32 grid per row
    * (constant work regardless of media size after the resize step). */
  def perceptualHash(spark: SparkSession, payloads: DataFrame): Dataset[PHashRecord] = {
    import spark.implicits._
    val n = 32
    // DCT-II basis: cos(π/N·(x+½)·u), precomputed once per partition
    payloads.as[MediaRecord].mapPartitions { it =>
      val basis = Array.tabulate(n, n)((u, x) =>
        math.cos(math.Pi / n * (x + 0.5) * u))
      it.map { r =>
        // real decode when the payload is an image; raw bytes otherwise
        val px = decodeImage(r.payload) match {
          case Some((sw, sh, gray)) => areaMean(sw, sh, gray, n, n)
          case None => resizeStub(r.payload, n, n)
        }
        val grid = Array.tabulate(n, n)((y, x) => (px(y * n + x) & 0xFF).toDouble)
        // separable 2-D DCT-II: rows then columns, only the 8×8 block needed
        val rows = Array.tabulate(n, 8) { (y, u) =>
          var s = 0.0
          var x = 0
          while (x < n) { s += grid(y)(x) * basis(u)(x); x += 1 }
          s
        }
        val coef = Array.tabulate(8, 8) { (v, u) =>
          var s = 0.0
          var y = 0
          while (y < n) { s += rows(y)(u) * basis(v)(y); y += 1 }
          s
        }
        // threshold = midpoint of the two central coefficients, DC term
        // excluded (standard pHash drops DC — it carries overall
        // brightness, not structure; any fixed split convention works,
        // this one is pinned by the planted-payload contract values)
        val flat = (0 until 64).map(i => coef(i / 8)(i % 8)).toArray
        val sorted = flat.drop(1).sorted
        val median = (sorted(30) + sorted(31)) / 2.0
        var h = 0L
        var i = 0
        while (i < 64) {
          if (flat(i) > median) h |= (1L << i)
          i += 1
        }
        PHashRecord(r.doc_id, h)
      }
    }
  }

  // ------------------------------------------------------------- audio ----

  /** Samples per analysis frame (stands in for a codec's hop size). */
  val AudioFrame = 256

  /** Deterministic 16-bit PCM synthesis, CLOSED-FORM per sample index so a
    * SQL oracle can replay it exactly (no RNG, no floating trig — integer
    * triangle wave): sample(i) = amp(i) · (|((i mod 2P) − P)|·2 − P) with
    * period parameter P = 64 + doc_id % 64, amplitude a = 2 + doc_id % 8,
    * and every fifth frame muted (amp 0) so silence detection has real
    * work. |sample| ≤ 9·127 < 2¹⁵. Clip length = AudioFrame ·
    * (4 + doc_id % 5) samples — whole frames. */
  def pcmSample(docId: Long, i: Int): Int = {
    val p = (64 + docId % 64).toInt
    val amp = if ((i / AudioFrame) % 5 == 4) 0 else (2 + docId % 8).toInt
    amp * (math.abs((i % (2 * p)) - p) * 2 - p)
  }

  /** Synthesize each document's audio clip as REAL 16-bit little-endian
    * PCM bytes — in a production pipeline this column arrives as decoded
    * audio from the source; here the synthetic samples make the byte-level
    * plumbing (encode, shuffle, decode) fully testable. */
  def asPcmClips(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val n = AudioFrame * (4 + docId % 5).toInt
        val bytes = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = pcmSample(docId, i)
          bytes(2 * i) = (s & 0xFF).toByte
          bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        MediaRecord(docId, bytes)
      }
    }
  }

  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, n_frames: Long, n_silent_frames: Long,
      energy: Long, zero_crossings: Long)

  /** Windowed audio feature extraction from the PCM BYTES (real 16-bit LE
    * decode per sample, framing, per-frame silence + cross-frame-free
    * zero-crossing counts) — the speech-pipeline preprocessing pass
    * (silence trimming / quality gating) run per partition. Every output
    * is an exact integer (energy = Σ s², zero crossings = sign flips of
    * adjacent samples WITHIN a frame, silent = all-zero frame), so the
    * whole feature table hash-matches a closed-form SQL replay — no
    * tolerance, no parity booleans. */
  def audioFeatures(spark: SparkSession, clips: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    clips.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length / 2
        var energy = 0L
        var zc = 0L
        var silent = 0L
        var f = 0
        while (f * AudioFrame < n) {
          var allZero = true
          var prev = 0
          var j = 0
          while (j < AudioFrame && f * AudioFrame + j < n) {
            val i = f * AudioFrame + j
            val lo = r.payload(2 * i) & 0xFF
            val hi = r.payload(2 * i + 1).toInt // sign-extends the high byte
            val s = (hi << 8) | lo
            energy += s.toLong * s
            if (s != 0) allZero = false
            if (j > 0 && prev * s < 0) zc += 1
            prev = s
            j += 1
          }
          if (allZero) silent += 1
          f += 1
        }
        AudioFeatures(r.doc_id, n.toLong, ((n + AudioFrame - 1) / AudioFrame).toLong,
          silent, energy, zc)
      }
    }
  }
}
