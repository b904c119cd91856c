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
    "m_media_meta" -> ((s, dir) => MediaOps.metaDf(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "m_media_meta" ->
      s"""WITH h AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT))),
         |    (a, c) -> (a * 31 + c) % ${MediaOps.P}) AS checksum
         |  FROM documents)
         |SELECT doc_id, n_bytes, checksum,
         | CAST(checksum % 640 AS INT) AS width,
         | CAST((checksum // 640) % 480 AS INT) AS height
         |FROM h""".stripMargin
  )
}
