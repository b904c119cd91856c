package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.media.MediaOps

/** Streaming twins for the multimodal pipeline — the binary-payload
  * siblings of [[EventStreams]]' text/event twins.
  */
object MediaStreams {

  /** Streaming exact media dedup: keep the FIRST arrival per decoded
    * image inside the watermark horizon — the multimodal twin of
    * [[EventStreams.dedupByContent]]. The REAL decode runs as the same
    * narrow per-partition kernel the batch rows use, inside the
    * micro-batch; the dedup key is the 16-byte decoded-content key
    * (raster checksum, pixel count), so PAYLOAD BYTES NEVER ENTER THE
    * STATE STORE — state holds one fixed-width key per distinct image
    * within the horizon and `dropDuplicatesWithinWatermark` evicts older
    * keys, the same (arrival rate × horizon) bound that makes streaming
    * dedup viable at 100 TB/day of media.
    *
    * Input columns: `doc_id LONG`, `ts TIMESTAMP`, `payload BINARY`.
    * Output: the surviving rows' (doc_id, ts, checksum, n_pixels) —
    * metadata only, the payload is dropped before the stateful step.
    */
  def dedupByPixels(media: DataFrame, horizon: String): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("ts"), col("payload"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions(_.map { case (id, ts, payload) =>
        val img = MediaOps.decodePng(payload)
        (id, ts, MediaOps.pixelChecksum(img),
          img.getWidth.toLong * img.getHeight)
      })
      .toDF("doc_id", "ts", "checksum", "n_pixels")
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("checksum", "n_pixels")
  }
}
