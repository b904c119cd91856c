package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (beyond-reference roadmap, SURVEY §7.5):
  * image/video payloads are opaque `binary` columns with typed metadata;
  * decode / resize / frame-sample / feature-extraction run as narrow
  * per-partition kernels over the bytes, and payloads NEVER shuffle —
  * every wide exchange downstream moves fixed-width metadata (dims,
  * checksums), the only topology that survives 100 TB of media.
  *
  * The codecs are REAL: payloads are valid PNG images encoded and decoded
  * with the JDK's `javax.imageio` (offline-safe, no external codec
  * libraries), "video" payloads are a length-prefixed PNG frame sequence
  * parsed and per-frame decoded. What keeps the rows ORACLE-CHECKABLE is
  * the fixture construction: the corpus has no image files, so each
  * document deterministically GENERATES its image — dimensions and pixels
  * are pure integer functions of the document text's rolling byte hash —
  * and PNG is lossless, so the decoded raster must reproduce the
  * generative formula bit-for-bit. The DuckDB oracle replays the formula
  * (never touching PNG), which makes the hash compare an end-to-end test
  * of the ENCODE → DECODE round trip: a channel swap, row-order bug,
  * stride error or lossy step anywhere in the codec path breaks the row.
  *
  * The checksum/byte folds are ASCII-equal to the oracle's char-level
  * fold over `text` (the corpus is pure ASCII — documented precondition,
  * same as the text rows).
  *
  * Python-ecosystem codecs (PIL/ffmpeg/torchaudio) would use the SAME
  * topology through `mapInPandas` — per-partition batches of binary
  * payloads in, fixed-width typed metadata out; the JDK codecs here are
  * JVM-native, so no Python worker boundary (or its serialization tax)
  * is needed, but nothing in the row contracts assumes it.
  */
object MediaOps {

  final case class Media(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, width: Int, height: Int, channels: Int,
      n_pixels: Long, checksum: Long)
  final case class MediaFrame(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, checksum: Long)
  final case class MediaResized(
      doc_id: Long, width: Int, height: Int, checksum: Long)
  final case class MediaFeature(doc_id: Long, feature: Array[Float])
  final case class MediaHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)
  final case class FrameHash(
      doc_id: Long, frame_idx: Int, b0: Int, b1: Int, b2: Int, b3: Int)

  val P = 1000000007L

  /** Generative image model — the deterministic fixture both engines can
    * compute. From the text hash `th`:
    *   width  = 16 + th % 17          ∈ [16, 32]
    *   height = 12 + (th / 17) % 13   ∈ [12, 24]
    *   pixel channel value at linear index i (row-major, RGB interleaved,
    *   i = (y·width + x)·3 + c) of frame f:
    *     v = kmvMix((th + 7919·f + i) mod P) mod 256
    *   frames = 1 + th % MaxFrames    ∈ [1, MaxFrames]
    * The kmvMix whitening (the dual-rendered multiply-xor-shift hash
    * every sketch row shares, [[graft.text.TextOps.kmvMix]]) makes the
    * pixel stream NONLINEAR in both th and i. Earlier forms failed in
    * instructive ways: `(s0 + c·i) mod 256` only sees s0 mod 256 and is
    * geometry-blind (5 spurious image collisions against the text-side
    * dedup in 500 docs), and `(th·(i+1) mod P) mod 256` — full-range for
    * the checksum — still made two documents' rasters DIFFER by a linear
    * progression mod 256, which correlates thresholded aHash bits enough
    * to fake near-duplicates at Hamming 3-8. With the mix, the minimum
    * distinct-text aHash distance measures 16 at both verify scales.
    */
  val MaxFrames = 4

  /** Keep-every-N frame stride for [[frameSample]]. */
  val FrameEvery = 2

  /** Nearest-neighbor resize target for [[resize]]. */
  val ResizeW = 8
  val ResizeH = 8

  /** Rolling byte hash mod [[P]] over the UTF-8 text bytes — the content
    * key every generative parameter derives from (duplicate documents →
    * identical images, which is what makes `m_media_dedup` meaningful).
    */
  def byteHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % P
      i += 1
    }
    h
  }

  def widthOf(th: Long): Int = 16 + (th % 17).toInt
  def heightOf(th: Long): Int = 12 + ((th / 17) % 13).toInt
  def framesOf(th: Long): Int = 1 + (th % MaxFrames).toInt

  def pixelValue(th: Long, frame: Int, i: Long): Int =
    (graft.text.TextOps.kmvMix((th + 7919L * frame + i) % P) % 256).toInt

  /** Render frame `f` of the generative model and ENCODE it as real PNG
    * bytes via `javax.imageio` (deterministic within a JRE; downstream
    * rows never key on the encoded bytes, only on decoded pixels).
    */
  def encodePng(th: Long, frame: Int): Array[Byte] = {
    val (w, h) = (widthOf(th), heightOf(th))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y.toLong * w + x) * 3
        val r = pixelValue(th, frame, i)
        val g = pixelValue(th, frame, i + 1)
        val b = pixelValue(th, frame, i + 2)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    ImageIO.setUseCache(false) // in-memory streams; no temp-file cache
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "no PNG encoder in this JRE")
    bos.toByteArray
  }

  /** Decode PNG bytes back to a raster (real `javax.imageio` parse). */
  def decodePng(bytes: Array[Byte]): BufferedImage = {
    ImageIO.setUseCache(false)
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    img
  }

  /** Rolling checksum over the DECODED raster: R, G, B per pixel in
    * row-major order, folded as (acc·31 + v) mod [[P]] — the quantity the
    * oracle recomputes from the generative formula.
    */
  def pixelChecksum(img: BufferedImage): Long = {
    var acc = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        acc = (acc * 31 + ((rgb >> 16) & 0xff)) % P
        acc = (acc * 31 + ((rgb >> 8) & 0xff)) % P
        acc = (acc * 31 + (rgb & 0xff)) % P
        x += 1
      }
      y += 1
    }
    acc
  }

  /** Image table over any `(doc_id, text)` frame: one real PNG payload
    * per row (frame 0 of the generative model). Narrow per-partition
    * kernel; the payload column is `binary` and never shuffles
    * downstream.
    */
  def imagesFrom(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val th = byteHash(text.getBytes("UTF-8"))
        Media(id, "image/png", encodePng(th, 0))
      })
  }

  def imagesFromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] =
    imagesFrom(graft.Tables(spark, sfDir, "documents"))

  /** Video table over any `(doc_id, text)` frame: a length-prefixed PNG
    * frame sequence per row — `frames` copies of [4-byte big-endian
    * length][PNG bytes]. A trivial but REAL container format:
    * [[frameSample]] / [[frameHashes]] must parse it and decode each
    * frame.
    */
  def videosFrom(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val th = byteHash(text.getBytes("UTF-8"))
        val bos = new ByteArrayOutputStream()
        var f = 0
        val n = framesOf(th)
        while (f < n) {
          val png = encodePng(th, f)
          bos.write(ByteBuffer.allocate(4).putInt(png.length).array())
          bos.write(png)
          f += 1
        }
        Media(id, "video/png-seq", bos.toByteArray)
      })
  }

  def videosFromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] =
    videosFrom(graft.Tables(spark, sfDir, "documents"))

  /** Decode metadata per partition: REAL PNG parse → width / height /
    * channel count straight from the decoded image, plus the raster
    * checksum. Narrow map over the binary column.
    */
  def decodeMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodePng(m.payload)
      MediaMeta(m.doc_id, img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents,
        img.getWidth.toLong * img.getHeight, pixelChecksum(img))
    })
  }

  /** Deterministic nearest-neighbor resize of the DECODED raster to
    * [[ResizeW]]×[[ResizeH]]: source pixel (tx·w/W, ty·h/H) by integer
    * division — bit-reproducible (no area averaging, no float math), so
    * the oracle can replay the source-index arithmetic exactly.
    */
  def resize(media: Dataset[Media]): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodePng(m.payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new BufferedImage(ResizeW, ResizeH, BufferedImage.TYPE_INT_RGB)
      var ty = 0
      while (ty < ResizeH) {
        var tx = 0
        while (tx < ResizeW) {
          out.setRGB(tx, ty, img.getRGB(tx * w / ResizeW, ty * h / ResizeH))
          tx += 1
        }
        ty += 1
      }
      MediaResized(m.doc_id, ResizeW, ResizeH, pixelChecksum(out))
    })
  }

  /** Frame sampling over the video container: parse the length-prefixed
    * sequence, DECODE every [[FrameEvery]]-th frame with the real codec,
    * emit one metadata row per kept frame — the flatMap (explode) shape
    * real keyframe extraction uses; payload bytes never leave the task.
    */
  /** Parse the length-prefixed PNG sequence into its frame byte blocks. */
  def parseFrames(payload: Array[Byte]): Array[Array[Byte]] = {
    val bb = ByteBuffer.wrap(payload)
    Iterator.continually {
      if (bb.remaining() < 4) None
      else {
        val len = bb.getInt()
        val png = new Array[Byte](len)
        bb.get(png)
        Some(png)
      }
    }.takeWhile(_.isDefined).map(_.get).toArray
  }

  def frameSample(media: Dataset[Media],
      every: Int = FrameEvery): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      parseFrames(m.payload).iterator.zipWithIndex
        .filter { case (_, f) => f % every == 0 }
        .map { case (png, f) =>
          val img = decodePng(png)
          MediaFrame(m.doc_id, f, img.getWidth, img.getHeight,
            pixelChecksum(img))
        }
    }
  }

  /** Per-frame perceptual hash over EVERY frame of the container — the
    * signature table video near-dup buckets on (one fixed-width row per
    * frame, payloads never leave the task).
    */
  def frameHashes(media: Dataset[Media]): Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      parseFrames(m.payload).iterator.zipWithIndex.map { case (png, f) =>
        val b = aHashBands(decodePng(png))
        FrameHash(m.doc_id, f, b(0), b(1), b(2), b(3))
      }
    }
  }

  /** Perceptual average-hash (aHash) over the REAL decoded raster — the
    * standard near-duplicate signature for images: nearest-neighbor
    * resize to 8×8 (the same integer source-index arithmetic as
    * [[resize]]), integer grayscale (r+g+b)/3 per target pixel, threshold
    * at the integer mean (Σ/64), bit k (row-major target index) set iff
    * gray(k) > mean. The 64 bits are returned as FOUR 16-bit band values
    * — the LSH banding the near-dup join buckets on — assembled
    * non-negative by construction, so neither engine ever shifts a signed
    * 64-bit value (arithmetic-shift sign semantics cannot diverge).
    * All-integer end to end; the DuckDB oracle replays it from the
    * generative pixel model.
    */
  def aHashBands(img: BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new Array[Int](64)
    var sum = 0
    var k = 0
    while (k < 64) {
      val rgb = img.getRGB((k % 8) * w / 8, (k / 8) * h / 8)
      gray(k) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      sum += gray(k)
      k += 1
    }
    val mean = sum / 64
    val bands = new Array[Int](4)
    k = 0
    while (k < 64) {
      if (gray(k) > mean) bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    bands
  }

  /** Per-document perceptual hash rows (narrow decode + aHash kernel). */
  def perceptualHash(media: Dataset[Media]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val b = aHashBands(decodePng(m.payload))
      MediaHash(m.doc_id, b(0), b(1), b(2), b(3))
    })
  }

  /** Feature extraction over REAL decoded pixels: 8 floats per image —
    * per-channel means (3), overall luminance mean (1), and the four
    * quadrant luminance means — the fixed-width per-partition batch shape
    * an embedding model would use. Pixel sums are integers; only the
    * final divisions are float, so the vector is deterministic.
    */
  def features(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodePng(m.payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val chan = new Array[Long](3)
      val quad = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          chan(0) += r; chan(1) += g; chan(2) += b
          quad((if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)) +=
            (r + g + b)
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val f = new Array[Float](8)
      f(0) = chan(0).toFloat / n; f(1) = chan(1).toFloat / n
      f(2) = chan(2).toFloat / n
      f(3) = (chan(0) + chan(1) + chan(2)).toFloat / (3 * n)
      // quadrant sizes: ceil/floor split along each axis
      val (hw0, hh0) = ((w + 1) / 2, (h + 1) / 2)
      val sizes = Array(hw0.toLong * hh0, (w - hw0).toLong * hh0,
        hw0.toLong * (h - hh0), (w - hw0).toLong * (h - hh0))
      var q = 0
      while (q < 4) {
        f(4 + q) = if (sizes(q) == 0) 0f else quad(q).toFloat / (3 * sizes(q))
        q += 1
      }
      MediaFeature(m.doc_id, f)
    })
  }

  // ----------------------------------------------------------------- audio

  final case class AudioMeta(
      doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long, zero_crossings: Long, energy: Long, checksum: Long)
  final case class AudioResampled(doc_id: Long, n_out: Long, checksum: Long)

  /** Generative audio model: 16-bit mono PCM at 8 kHz,
    *   n = 400 + th % 800 samples,
    *   unsigned sample u(i) = kmvMix((th + 524287 + i) mod P) mod 65536
    *   (signed value s = u − 32768),
    * encoded as a REAL RIFF/WAV file via `javax.sound.sampled` and parsed
    * back with the real decoder — the audio sibling of the PNG model,
    * same whitening argument, same lossless-round-trip oracle story.
    */
  def audioSamplesOf(th: Long): Int = 400 + (th % 800).toInt

  /** Unsigned 16-bit sample u(i) ∈ [0, 65535]. */
  def audioSample(th: Long, i: Long): Int =
    (graft.text.TextOps.kmvMix((th + 524287L + i) % P) % 65536L).toInt

  /** Encode the generative PCM as real WAV bytes. */
  def encodeWav(th: Long): Array[Byte] = {
    val n = audioSamplesOf(th)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = audioSample(th, i) - 32768
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio table over any `(doc_id, text)` frame: real WAV payloads. */
  def audiosFrom(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        Media(id, "audio/wav", encodeWav(byteHash(text.getBytes("UTF-8"))))
      })
  }

  /** REAL WAV parse → decoded signed PCM samples. */
  def decodeWav(payload: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && !f.isBigEndian &&
      f.getChannels == 1, s"unsupported WAV layout: $f")
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    (f, out)
  }

  /** Decode + per-clip signal stats (all integer: zero-crossing count,
    * Σ s² energy, rolling checksum over the unsigned samples) — the
    * audio decode/feature kernel, narrow like its image siblings.
    */
  def decodeAudioMeta(media: Dataset[Media]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (f, s) = decodeWav(m.payload)
      var (zc, energy, acc) = (0L, 0L, 0L)
      var i = 0
      while (i < s.length) {
        if (i > 0 && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
        energy += s(i).toLong * s(i)
        acc = (acc * 31 + (s(i) + 32768)) % P
        i += 1
      }
      AudioMeta(m.doc_id, f.getSampleRate.toInt, f.getChannels,
        f.getSampleSizeInBits, s.length.toLong, zc, energy, acc)
    })
  }

  final case class AudioGate(
      doc_id: Long, n_samples: Long, peak: Long, n_clipped: Long,
      energy: Long, rms: Double)

  /** Decode + loudness-gate features — the silence/clipping filter an
    * audio ingest runs before training: peak |s|, full-scale clipped
    * sample count (s = ±32768-scale rails), Σ s² energy, and
    * RMS = sqrt(energy/n). Every moment is an exact integer off the
    * decoded PCM; RMS is the ONE float step — a division then a sqrt,
    * BOTH IEEE-correctly-rounded (unlike log/exp, sqrt is exactly
    * rounded by JVM Math.sqrt and DuckDB alike; energy ≤ n·2³⁰ sits far
    * inside double's 2⁵³ integer range), so the row hash-compares with
    * no float dispensation.
    */
  def decodeAudioGate(media: Dataset[Media]): Dataset[AudioGate] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (_, s) = decodeWav(m.payload)
      var (peak, clipped, energy) = (0L, 0L, 0L)
      var i = 0
      while (i < s.length) {
        val a = math.abs(s(i).toLong)
        if (a > peak) peak = a
        if (s(i) == 32767 || s(i) == -32768) clipped += 1
        energy += s(i).toLong * s(i)
        i += 1
      }
      // n = 0 guard: a zero-sample WAV would make 0/0 an engine-
      // dependent NaN-vs-NULL hash hazard — define silence as rms 0.
      AudioGate(m.doc_id, s.length.toLong, peak, clipped, energy,
        if (s.length == 0) 0.0 else math.sqrt(energy.toDouble / s.length))
    })
  }

  final case class AudioVad(doc_id: Long, n_samples: Long, n_active: Long,
      n_segments: Long, active_ratio: Double)

  /** `m_media_audio_vad` activity threshold: a sample is "active" when
    * |s| ≥ this (quarter full-scale).
    */
  val VadThreshold = 8192

  /** Decode + energy-threshold voice-activity segmentation — the
    * silence-trimming pass an audio ingest runs to split clips into
    * speech-like segments: a sample is active when |s| ≥
    * [[VadThreshold]], a segment is a maximal run of active samples
    * (counted at its first sample), and the ratio is the single display
    * division. All counters are exact integers off the decoded PCM;
    * payloads never shuffle — one narrow row per clip leaves the task.
    */
  def decodeAudioVad(media: Dataset[Media]): Dataset[AudioVad] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (_, s) = decodeWav(m.payload)
      var (active, segs) = (0L, 0L)
      var prev = false
      var i = 0
      while (i < s.length) {
        val a = math.abs(s(i)) >= VadThreshold
        if (a) {
          active += 1
          if (!prev) segs += 1
        }
        prev = a
        i += 1
      }
      AudioVad(m.doc_id, s.length.toLong, active, segs,
        if (s.length == 0) 0.0
        else graft.text.TextOps.round6(active.toDouble / s.length))
    })
  }

  /** `m_media_audio_neardup` fingerprint geometry: the clip is cut into
    * ([[FpWindows]]+1) windows × [[FpBands]] sub-band slices (flat slice
    * s ∈ [0, ([[FpWindows]]+1)·[[FpBands]]) covers samples
    * [s·n/S, (s+1)·n/S)) — one extra leading window so every emitted bit
    * has a predecessor window, and [[FpBands]] = 5 sub-bands yield 4
    * band-DELTAS per window. n ≥ 400 generative samples keeps every
    * slice non-empty (≥ 4 samples).
    */
  val FpWindows = 16
  val FpBands = 5

  /** Haitsma–Kalker-style audio fingerprint over the DECODED PCM (A
    * Highly Robust Audio Fingerprinting System, ISMIR'02 — the scheme
    * chromaprint descends from): per (window w, band b) the exact
    * integer energy E = Σ s² over the slice, and bit (w, b) = 1 iff the
    * band-delta's window-delta is positive,
    *
    *   (E(w,b) − E(w,b+1)) − (E(w−1,b) − E(w−1,b+1)) > 0
    *
    * — the published sub-fingerprint rule with time-domain sub-band
    * energies standing in for the filter-bank outputs (no FFT: the
    * container has no codec libraries, and the whitened generative PCM
    * makes time slices exactly as discriminative — distinct clips
    * measure near-32/64 Hamming, spec-pinned). 16 windows × 4 band
    * deltas (5 sub-bands each) = 64 bits, assembled non-negative into
    * FOUR 16-bit LSH bands `(b0..b3)` — the SAME banded signature shape
    * as the image aHash, so the near-dup join reuses the whole
    * candidate/verify machinery. Every energy is an exact BIGINT
    * (|s| ≤ 32768 → s² ≤ 2³⁰, slices ≤ 75 samples at the generative
    * sizes), so the bits — and hence the row — hash-compare against the
    * oracle's generative replay with no float anywhere.
    */
  def audioFingerprint(media: Dataset[Media]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (_, s) = decodeWav(m.payload)
      val n = s.length
      val S = (FpWindows + 1) * FpBands
      val e = new Array[Long](S)
      var k = 0
      while (k < S) {
        var i = k.toLong * n / S
        val end = (k + 1).toLong * n / S
        var acc = 0L
        while (i < end) {
          acc += s(i.toInt).toLong * s(i.toInt)
          i += 1
        }
        e(k) = acc
        k += 1
      }
      val bands = new Array[Int](4)
      var w = 1
      while (w <= FpWindows) {
        var b = 0
        while (b < FpBands - 1) {
          val d = (e(w * FpBands + b) - e(w * FpBands + b + 1)) -
            (e((w - 1) * FpBands + b) - e((w - 1) * FpBands + b + 1))
          if (d > 0) {
            val bit = (w - 1) * (FpBands - 1) + b
            bands(bit / 16) |= 1 << (bit % 16)
          }
          b += 1
        }
        w += 1
      }
      MediaHash(m.doc_id, bands(0), bands(1), bands(2), bands(3))
    })
  }

  /** Decimating downsample (keep every `factor`-th decoded sample) — the
    * audio sibling of the image nearest-neighbor resize: integer index
    * arithmetic only, oracle-replayable.
    */
  def downsampleAudio(media: Dataset[Media],
      factor: Int = 2): Dataset[AudioResampled] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (_, s) = decodeWav(m.payload)
      var (acc, k) = (0L, 0L)
      var i = 0
      while (i < s.length) {
        acc = (acc * 31 + (s(i) + 32768)) % P
        k += 1
        i += factor
      }
      AudioResampled(m.doc_id, k, acc)
    })
  }

  /** Metadata DataFrame for the query surface. */
  case class MediaEntropy(
      doc_id: Long, n_vals: Long, n_distinct: Long, entropy_bits: Double)

  /** Channel-value Shannon entropy over the DECODED raster — the
    * flat/synthetic-image quality gate (a solid-color or low-palette
    * image scores near 0 bits; the whitened generative rasters measure
    * near 8). R, G, B per pixel feed a 256-bin histogram; the float fold
    * runs in ascending bin order, so the Spark side has ONE
    * deterministic sum order and the round-6 pin absorbs DuckDB's
    * different group order (≤ 256 terms). Narrow per-partition kernel —
    * payload bytes never leave the task; the oracle replays the
    * generative pixel model, never the PNG.
    */
  def pixelEntropy(media: Dataset[Media]): Dataset[MediaEntropy] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodePng(m.payload)
      val hist = new Array[Long](256)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          hist((rgb >> 16) & 0xff) += 1
          hist((rgb >> 8) & 0xff) += 1
          hist(rgb & 0xff) += 1
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight * 3
      var s = 0.0
      var v = 0L
      var b = 0
      while (b < 256) {
        val c = hist(b)
        if (c > 0) { s += c * math.log(c.toDouble); v += 1 }
        b += 1
      }
      val bits = graft.text.TextOps.round6(
        (math.log(n.toDouble) - s / n) / math.log(2.0))
      MediaEntropy(m.doc_id, n, v, bits)
    })
  }

  /** Pixel-entropy DataFrame for the query surface. */
  def entropyDf(spark: SparkSession, sfDir: String): DataFrame =
    pixelEntropy(imagesFromDocuments(spark, sfDir)).toDF()

  final case class ImgSobel(doc_id: Long, w: Int, ih: Int,
      n_interior: Long, edge_energy: Long, mean_grad: Double)

  /** Integer Sobel gradient energy over the REAL-decoded grayscale — the
    * sharpness/edge-density feature an image-quality gate reads (a
    * near-zero energy is a flat/solid frame; extreme energy is noise).
    * Grayscale is the aHash convention ((r+g+b)/3, integer floor
    * division — the `graySql` spelling the oracle replays), the 3×3
    * Sobel pair runs at every interior pixel, and energy = Σ |gx|+|gy|
    * is an exact BIGINT — payload bytes never shuffle, one small row
    * per image leaves the kernel.
    */
  def sobelEnergy(media: Dataset[Media]): Dataset[ImgSobel] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodePng(m.payload)
      val w = img.getWidth
      val h = img.getHeight
      val g = Array.ofDim[Int](h, w)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          g(y)(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
            (rgb & 0xff)) / 3
          x += 1
        }
        y += 1
      }
      var energy = 0L
      var n = 0L
      y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          val gx = g(y - 1)(x + 1) + 2 * g(y)(x + 1) + g(y + 1)(x + 1) -
            g(y - 1)(x - 1) - 2 * g(y)(x - 1) - g(y + 1)(x - 1)
          val gy = g(y + 1)(x - 1) + 2 * g(y + 1)(x) + g(y + 1)(x + 1) -
            g(y - 1)(x - 1) - 2 * g(y - 1)(x) - g(y - 1)(x + 1)
          energy += math.abs(gx) + math.abs(gy)
          n += 1
          x += 1
        }
        y += 1
      }
      // degenerate rasters (w < 3 or h < 3) have NO interior pixel:
      // n = 0, and round6(energy / 0) would throw (BigDecimal(NaN)) —
      // the silence convention of decodeAudioGate/decodeAudioVad
      // applies: an edge-free frame reads mean_grad 0.0.
      ImgSobel(m.doc_id, w, h, n, energy,
        if (n == 0) 0.0
        else graft.text.TextOps.round6(energy.toDouble / n))
    })
  }

  def sobelDf(spark: SparkSession, sfDir: String): DataFrame =
    sobelEnergy(imagesFromDocuments(spark, sfDir)).toDF()

  final case class ImgHist(doc_id: Long, channel: Int, bin: Int, c: Long)

  /** Per-channel 16-bucket histogram over the REAL-decoded raster — the
    * color-distribution feature an image-quality gate reads (a spike in
    * one bucket is a solid/clipped frame; a flat histogram is noise).
    * Emits the FULL 3×16 grid per image, zero buckets included, so the
    * row set is a pure function of the image count. Channel order
    * follows the raster layout (0 = R, 1 = G, 2 = B — flat index mod 3
    * in the generative model the oracle replays); all counts are exact
    * BIGINTs off the decoded pixels.
    */
  def channelHist(media: Dataset[Media]): Dataset[ImgHist] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val img = decodePng(m.payload)
      val hist = Array.ofDim[Long](3, 16)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          hist(0)(((rgb >> 16) & 0xff) >> 4) += 1
          hist(1)(((rgb >> 8) & 0xff) >> 4) += 1
          hist(2)((rgb & 0xff) >> 4) += 1
          x += 1
        }
        y += 1
      }
      for (ch <- 0 until 3; b <- 0 until 16)
        yield ImgHist(m.doc_id, ch, b, hist(ch)(b))
    })
  }

  /** Channel-histogram DataFrame for the query surface. */
  def histDf(spark: SparkSession, sfDir: String): DataFrame =
    channelHist(imagesFromDocuments(spark, sfDir)).toDF()

  def metaDf(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(imagesFromDocuments(spark, sfDir)).toDF()

  /** Perceptual-hash DataFrame for the query surface. */
  def hashDf(spark: SparkSession, sfDir: String): DataFrame =
    perceptualHash(imagesFromDocuments(spark, sfDir)).toDF()

  /** Frame-sample DataFrame for the query surface. */
  def framesDf(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(videosFromDocuments(spark, sfDir)).toDF()

  /** Resize DataFrame for the query surface. */
  def resizedDf(spark: SparkSession, sfDir: String): DataFrame =
    resize(imagesFromDocuments(spark, sfDir)).toDF()
}
