package graft.queries

import org.apache.spark.sql.functions._

/** r20 skew/volume disclosure probe (guide §2.5; r19 verdict #7): the
  * two banded near-dup joins the verdict flagged — `d_winnow_pairs` and
  * `m_media_video_neardup` — print their band-key histograms (max vs
  * median key population decides whether salting is warranted) and
  * their candidate/final pair volumes. A measurement main, not a query
  * path.
  *
  * Usage: `./run.sh graft.queries.SkewProbe [sfDir]`
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.LocalSession.create()
    import s.implicits._

    // ---- d_winnow_pairs: fingerprint document-frequency histogram ----
    val docs = graft.Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val fps = docs.as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.text.TextOps.winnow(t).map { case (_, f) => (id, f) }
      }.toDF("doc_id", "fp").distinct().localCheckpoint(true)
    val dfc = fps.groupBy("fp").agg(count(lit(1)).as("dfc"))
      .localCheckpoint(true)
    println(s"[skew] winnow distinct (doc, fp) rows = ${fps.count()}")
    val st = dfc.agg(max("dfc"), expr("percentile_approx(dfc, 0.5)"),
      count(lit(1))).collect()(0)
    println(s"[skew] winnow fp keys = ${st.getLong(2)}, max df = " +
      s"${st.getLong(0)}, median df = ${st.get(1)}, join cap = " +
      s"[2, ${graft.text.TextOps.WinnowMaxDf}]")
    val rareKeys = dfc
      .where(col("dfc").between(2, graft.text.TextOps.WinnowMaxDf))
    println(s"[skew] winnow keys inside the cap = ${rareKeys.count()}")
    val rare = fps.join(rareKeys.select("fp"), Seq("fp"), "left_semi")
    val cand = rare.as("x").join(rare.as("y"),
      col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
    println(s"[skew] winnow candidate rows = ${cand.count()}")
    println("[skew] winnow final pairs = " +
      Text.queries("d_winnow_pairs")(s, dir).count())

    // ---- m_media_video_neardup: banded frame-hash key histogram ----
    val fh = graft.media.MediaOps.frameHashes(
        graft.media.MediaOps.videosFrom(Media.withReplicas(s, dir)))
      .toDF().localCheckpoint(true)
    println(s"[skew] video frame-hash rows = ${fh.count()}")
    val lng = Media.BandPairs.zipWithIndex.map { case ((i, j), pi) =>
      fh.select(col("doc_id"), col("frame_idx"), lit(pi).as("pi"),
        col(s"b$i").as("bu"), col(s"b$j").as("bv"))
    }.reduce(_.unionAll(_))
    val keyHist = lng.groupBy("frame_idx", "pi", "bu", "bv")
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val vs = keyHist.agg(max("c"), expr("percentile_approx(c, 0.5)"),
      count(lit(1)), sum(col("c") * (col("c") - 1) / 2)).collect()(0)
    println(s"[skew] video band keys = ${vs.getLong(2)}, max key pop = " +
      s"${vs.getLong(0)}, median = ${vs.get(1)}, candidate pairs = " +
      s"${vs.get(3)}")
    println("[skew] video verified pairs = " +
      Media.queries("m_media_video_neardup")(s, dir).count())
    s.stop()
  }
}
