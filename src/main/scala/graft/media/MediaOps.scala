package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (beyond-reference roadmap, SURVEY §7.5):
  * image/audio/video payloads are opaque `binary` columns with typed
  * metadata; decode / feature-extraction run as per-partition batch
  * kernels over the bytes.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked DETERMINISTIC FAKE (a rolling byte hash standing in for
  * a real decoder); everything around it — the binary schema, the
  * partition-parallel batch shape, the typed output schema — is the real
  * production plumbing and is tested. Swap `fakeDecode` for a codec call
  * (e.g. JNI image decode) without touching the Spark topology.
  *
  * Scale shape: payloads never visit the driver; decode is a narrow
  * per-partition map (no shuffle); metadata columns are pruned
  * independently of payload bytes by Parquet column pruning.
  */
object MediaOps {

  final case class Media(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, checksum: Long, width: Int, height: Int)
  final case class MediaFeature(doc_id: Long, feature: Array[Float])
  final case class MediaFrame(
      doc_id: Long, frame_idx: Int, n_bytes: Long, checksum: Long)
  final case class MediaResized(doc_id: Long, n_bytes: Long, checksum: Long)

  val P = 1000000007L

  /** Frame size (bytes) and keep-every-N stride for [[frameSample]]. */
  val FrameBytes = 256
  val FrameEvery = 2

  /** Target payload size for [[resizeStub]]. */
  val ResizeTarget = 1024

  /** Build a binary media table from the documents table (the corpus's
    * stand-in payload: UTF-8 bytes of the text).
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), lit("text/plain").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** Rolling byte hash mod [[P]] — the deterministic checksum used in
    * place of a real decoder's output.
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

  /** ----- STUBBED DECODE -----
    * A real implementation would parse the container format and return
    * true (width, height). No codec ships in this environment, so the
    * dimensions are a deterministic function of the bytes. The Spark
    * plumbing (binary in, typed struct out, per-partition batching) is
    * the production shape.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int) = {
    val h = byteHash(payload)
    ((h % 640).toInt, ((h / 640) % 480).toInt)
  }

  /** Decode metadata per partition (narrow map over the binary column). */
  def decodeStub(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h) = fakeDecode(m.payload)
        MediaMeta(m.doc_id, m.payload.length.toLong, byteHash(m.payload), w, h)
      }
    }
  }

  /** Feature extraction stub: 8 deterministic floats per payload (the
    * batch shape a real embedding model would use — batched per
    * partition, fixed-width output).
    */
  def featureStub(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = new Array[Float](8)
        var h = byteHash(m.payload)
        var i = 0
        while (i < 8) {
          h = (h * 31 + i + 1) % P
          f(i) = (h % 1000).toFloat / 1000f
          i += 1
        }
        MediaFeature(m.doc_id, f)
      }
    }
  }

  /** ----- FRAME SAMPLING -----
    * Video-style frame sampling over the opaque payload: the byte stream
    * is cut into [[FrameBytes]]-sized frames and every [[FrameEvery]]-th
    * frame is emitted as its own row — the flatMap (explode) shape real
    * frame extraction uses, one row per kept frame, payload never on the
    * driver. A real implementation would seek keyframes in the container;
    * the fixed-stride cut is the deterministic stand-in.
    */
  def frameSample(media: Dataset[Media],
      frameBytes: Int = FrameBytes, every: Int = FrameEvery): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      val frames = (n + frameBytes - 1) / frameBytes
      (0 until frames).iterator
        .filter(_ % every == 0)
        .map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, n)
          val frame = java.util.Arrays.copyOfRange(m.payload, from, until)
          MediaFrame(m.doc_id, i, frame.length.toLong, byteHash(frame))
        }
    }
  }

  /** ----- STUBBED RESIZE -----
    * Downsample the payload to at most [[ResizeTarget]] bytes by keeping
    * every stride-th byte (stride = ceil(n/target)) — a pixel-decimation
    * stand-in with the production topology: binary in, binary-derived
    * metadata out, narrow per-partition map, no shuffle.
    */
  def resizeStub(media: Dataset[Media], target: Int = ResizeTarget): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val n = m.payload.length
      val stride = math.max(1, (n + target - 1) / target)
      val kept = new Array[Byte]((n + stride - 1) / stride)
      var i = 0
      while (i < kept.length) { kept(i) = m.payload(i * stride); i += 1 }
      MediaResized(m.doc_id, kept.length.toLong, byteHash(kept))
    })
  }

  /** Metadata DataFrame for the query surface (checksum/byte-count are
    * ASCII-equal to a char-level fold, which is what the DuckDB oracle
    * replays — the corpus is pure ASCII).
    */
  def metaDf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeStub(fromDocuments(spark, sfDir)).toDF()
  }

  /** Frame-sample DataFrame for the query surface. */
  def framesDf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    frameSample(fromDocuments(spark, sfDir)).toDF()
  }

  /** Resize DataFrame for the query surface. */
  def resizedDf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    resizeStub(fromDocuments(spark, sfDir)).toDF()
  }
}
