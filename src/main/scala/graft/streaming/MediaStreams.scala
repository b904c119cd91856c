package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  final case class MDedupSt(keep_id: Long, n_copies: Long)
  final case class MDedupOut(checksum: Long, n_pixels: Long,
      keep_id: Long, n_copies: Long)

  /** Streaming signature-keyed dedup LEDGER — the stateful twin of the
    * batch `m_media_dedup` groupBy (keep the smallest doc_id per decoded
    * 16-byte content key, count the copies), under the [[EventStreams]]
    * churnState contract: per content key the state is the running
    * (min keep_id, copy count) — 32 bytes, payload bytes never enter the
    * state store (the decode runs as the batch rows' narrow
    * per-partition kernel inside the micro-batch) — and every
    * micro-batch that touches a key emits ONE updated ledger row
    * (Append-mode changelog). keep_id is monotone non-increasing and
    * n_copies strictly increasing per key, so the key's final state is
    * the row with the maximal n_copies regardless of sink ordering, and
    * a replica re-ingest (the same image re-crawled under a new id)
    * only bumps the count — MediaStreamsSpec reconciles the folded
    * ledger against the batch groupBy across micro-batch splits.
    * Unlike [[dedupByPixels]] (first-arrival suppression within a
    * watermark horizon), the ledger is the exact batch semantics: no
    * horizon, state = one fixed-width row per DISTINCT image — the
    * dedup-index shape, bounded by distinct content, not arrivals.
    */
  def dedupState(media: DataFrame): Dataset[MDedupOut] = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = MediaOps.decodePng(payload)
        (MediaOps.pixelChecksum(img),
          img.getWidth.toLong * img.getHeight, id)
      })
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[MDedupSt, MDedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((ck, np), it, state: GroupState[MDedupSt]) =>
          val ids = it.map(_._3).toSeq
          if (ids.isEmpty) Iterator.empty
          else {
            val st0 = state.getOption
              .getOrElse(MDedupSt(Long.MaxValue, 0L))
            val st = MDedupSt(math.min(st0.keep_id, ids.min),
              st0.n_copies + ids.size)
            state.update(st)
            Iterator.single(MDedupOut(ck, np, st.keep_id, st.n_copies))
          }
      }
  }
}
