package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.media.MediaOps

/** Multimodal pipeline query surface. The Spark side computes over REAL
  * PNG payloads — `javax.imageio` encode at fixture-build time, decode /
  * nearest-neighbor resize / container-parse + per-frame decode in the
  * query kernels. The DuckDB oracle NEVER touches PNG: it replays the
  * deterministic generative pixel model (dims, seed and every channel
  * value are integer functions of the document text's rolling byte hash —
  * see [[MediaOps]]), and PNG is lossless, so a hash match is an
  * end-to-end proof that encode → decode reproduced the generated raster
  * exactly. The text-hash fold is ASCII-equal to the oracle's char-level
  * fold (pure-ASCII corpus precondition, as with the text rows).
  */
object Media {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_meta" -> ((s, dir) => MediaOps.metaDf(s, dir)),
    "m_media_frames" -> ((s, dir) => MediaOps.framesDf(s, dir)),
    "m_media_resize" -> ((s, dir) => MediaOps.resizedDf(s, dir)),

    // Binary-payload exact dedup — the multimodal twin of
    // `d_dedup_exact`: group on the fixed-width (checksum, n_pixels)
    // CONTENT key computed from the decoded raster (payload bytes never
    // shuffle), keep the smallest doc_id. At 100 TB of media this is THE
    // dedup shape: the only wide exchange moves 16-byte keys, and
    // collision verification (byte compare within colliding groups)
    // would bolt on exactly as the text side's fingerprint-group verify
    // does. Duplicate documents generate identical images, so the groups
    // coincide with the text-side exact dedup (spec-pinned).
    "m_media_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.metaDf(s, dir)
        .groupBy(col("checksum"), col("n_pixels"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_pixels"), col("n_copies"))
    })
  )

  /** Rolling fold (acc·31 + v) mod P over a BIGINT-list expression. */
  private def fold(values: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $values), " +
      s"(a, v) -> (a * 31 + v) % ${MediaOps.P})"

  private def codesOf(strExpr: String): String =
    s"list_transform(string_split($strExpr, ''), ch -> CAST(ord(ch) AS BIGINT))"

  /** Raster checksum of frame `f` under the generative model: fold over
    * the w·ih·3 channel values v(i) = ((th·(i+1) + 7919·f) mod P) mod 256
    * — the full-range pixel function of [[MediaOps.pixelValue]]. Expects
    * columns `w`, `ih`, `th` in scope.
    */
  private def rasterChecksum(f: String): String =
    fold(s"list_transform(range(0, w * ih * 3), " +
      s"i -> ((th * (i + 1) + 7919 * ($f)) % ${MediaOps.P}) % 256)")

  /** The generative-parameter CTE chain shared by all four oracles:
    * th (text hash) → w, ih — the mirror of [[MediaOps.widthOf]] /
    * heightOf.
    */
  private def paramsCte: String =
    s"""WITH th_t AS (SELECT doc_id, ${fold(codesOf("text"))} AS th
       |  FROM documents),
       |p AS (SELECT doc_id, th, 16 + th % 17 AS w,
       |  12 + (th // 17) % 13 AS ih FROM th_t)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "m_media_meta" ->
      s"""$paramsCte
         |SELECT doc_id, CAST(w AS INT) AS width, CAST(ih AS INT) AS height,
         |  3 AS channels, CAST(w * ih AS BIGINT) AS n_pixels,
         |  ${rasterChecksum("0")} AS checksum
         |FROM p""".stripMargin,
    "m_media_dedup" ->
      s"""$paramsCte,
         |meta AS (SELECT doc_id, CAST(w * ih AS BIGINT) AS n_pixels,
         |  ${rasterChecksum("0")} AS checksum FROM p)
         |SELECT min(doc_id) AS keep_id, n_pixels, count(*) AS n_copies
         |FROM meta GROUP BY checksum, n_pixels""".stripMargin,
    "m_media_frames" ->
      s"""$paramsCte,
         |fr AS (SELECT doc_id, w, ih, th,
         |  unnest(range(0, 1 + th % ${MediaOps.MaxFrames})) AS f FROM p)
         |SELECT doc_id, CAST(f AS INT) AS frame_idx,
         |  CAST(w AS INT) AS width, CAST(ih AS INT) AS height,
         |  ${rasterChecksum("f")} AS checksum
         |FROM fr WHERE f % ${MediaOps.FrameEvery} = 0""".stripMargin,
    // nearest-neighbor replay: target (tx, ty, c) ← source linear index
    // ((ty·ih//H)·w + (tx·w//W))·3 + c, exactly MediaOps.resize's
    // integer arithmetic.
    "m_media_resize" -> {
      val (tw, thh) = (MediaOps.ResizeW, MediaOps.ResizeH)
      val n = tw * thh * 3
      val sy = s"(((j // ${tw * 3}) * ih) // $thh)"
      val sx = s"((((j % ${tw * 3}) // 3) * w) // $tw)"
      s"""$paramsCte
         |SELECT doc_id, $tw AS width, $thh AS height,
         |  ${fold(s"list_transform(range(0, $n), j -> " +
              s"((th * (($sy * w + $sx) * 3 + j % 3 + 1)) % ${MediaOps.P})" +
              s" % 256)")} AS checksum
         |FROM p""".stripMargin
    }
  )
}
