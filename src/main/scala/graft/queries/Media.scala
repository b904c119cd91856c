package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.media.MediaOps

/** Multimodal pipeline query surface. The Spark side computes over REAL
  * binary payloads (per-partition typed kernel); the DuckDB oracle replays
  * the same arithmetic at char level, which is byte-identical because the
  * corpus is pure ASCII.
  */
object Media {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_meta" -> ((s, dir) => MediaOps.metaDf(s, dir)),
    "m_media_frames" -> ((s, dir) => MediaOps.framesDf(s, dir)),
    "m_media_resize" -> ((s, dir) => MediaOps.resizedDf(s, dir)),

    // Binary-payload exact dedup — the multimodal twin of
    // `d_dedup_exact`: group on the 8-byte (checksum, n_bytes) content
    // key (payload bytes never shuffle), keep the smallest doc_id. At
    // 100 TB of media this is THE dedup shape: the only wide exchange
    // moves fixed-width hashes, and collision verification (byte compare
    // within colliding groups) would bolt on exactly as the text side's
    // fingerprint-group verify does.
    "m_media_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.metaDf(s, dir)
        .groupBy(col("checksum"), col("n_bytes"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_bytes"), col("n_copies"))
    })
  )

  /** Rolling byte-hash fold over a char-code list expression. */
  private def fold(codes: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $codes), " +
      s"(a, c) -> (a * 31 + c) % ${MediaOps.P})"

  private def codesOf(strExpr: String): String =
    s"list_transform(string_split($strExpr, ''), ch -> CAST(ord(ch) AS BIGINT))"

  def oracleSql: Map[String, String] = Map(
    "m_media_meta" ->
      s"""WITH h AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  ${fold(codesOf("text"))} AS checksum
         |  FROM documents)
         |SELECT doc_id, n_bytes, checksum,
         | CAST(checksum % 640 AS INT) AS width,
         | CAST((checksum // 640) % 480 AS INT) AS height
         |FROM h""".stripMargin,
    "m_media_dedup" ->
      s"""WITH h AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  ${fold(codesOf("text"))} AS checksum
         |  FROM documents)
         |SELECT min(doc_id) AS keep_id, n_bytes, count(*) AS n_copies
         |FROM h GROUP BY checksum, n_bytes""".stripMargin,
    "m_media_frames" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    unnest(range(0, (length(text) + ${MediaOps.FrameBytes - 1}) // ${MediaOps.FrameBytes})) AS fi
         |  FROM documents),
         |sel AS (SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         |    substr(text, CAST(fi * ${MediaOps.FrameBytes} + 1 AS INT), ${MediaOps.FrameBytes}) AS frame
         |  FROM f WHERE fi % ${MediaOps.FrameEvery} = 0)
         |SELECT doc_id, frame_idx,
         |  CAST(length(frame) AS BIGINT) AS n_bytes,
         |  ${fold(codesOf("frame"))} AS checksum
         |FROM sel""".stripMargin,
    "m_media_resize" ->
      s"""WITH c AS (SELECT doc_id, length(text) AS n, text FROM documents),
         |s AS (SELECT doc_id, n, text,
         |    greatest(1, (n + ${MediaOps.ResizeTarget - 1}) // ${MediaOps.ResizeTarget}) AS stride
         |  FROM c),
         |k AS (SELECT doc_id,
         |    list_transform(range(0, (n + stride - 1) // stride),
         |      i -> CAST(ord(substr(text, CAST(i * stride + 1 AS INT), 1)) AS BIGINT)) AS codes
         |  FROM s)
         |SELECT doc_id, CAST(len(codes) AS BIGINT) AS n_bytes,
         |  ${fold("codes")} AS checksum
         |FROM k""".stripMargin
  )
}
