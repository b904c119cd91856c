package graft.streaming

import graft.SparkSpec
import graft.media.MediaOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class MediaStreamsSpec extends SparkSpec {

  test("streaming media dedup keeps the first arrival per decoded image; " +
      "payloads never reach the state store") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    // three distinct generated images A/B/C (REAL PNG bytes), arriving as
    // A, B, A, C, B, A — survivors must be the first arrival of each
    def png(seed: Long) = MediaOps.encodePng(seed, 0)
    val (a, b, c) = (png(11L), png(22L), png(33L))
    val t0 = java.sql.Timestamp.valueOf("2024-03-05 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val rows = Seq(
      (1L, ts(0), a), (2L, ts(1), b), (3L, ts(2), a),
      (4L, ts(3), c), (5L, ts(4), b), (6L, ts(5), a))

    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Byte])]
    val df = input.toDF().toDF("doc_id", "ts", "payload")
    val q = MediaStreams.dedupByPixels(df, "1 hour").writeStream
      .format("memory").queryName("mdd").outputMode("append").start()
    val got = try {
      // two micro-batches: the key state must carry across
      val (first, second) = rows.splitAt(3)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
      spark.table("mdd").collect().map(_.getLong(0)).toSet
    } finally q.stop()
    assert(got == Set(1L, 2L, 4L))

    // the stateful key is the decoded-content key, byte-identical to the
    // batch m_media_dedup grouping key for the same payloads
    val aMeta = MediaOps.decodeMeta(
      Seq(MediaOps.Media(1L, "image/png", a)).toDS()).collect()(0)
    assert(aMeta.checksum == MediaOps.pixelChecksum(MediaOps.decodePng(a)))
  }

  test("dedupState ledger ≡ the batch m_media_dedup groupBy over the " +
      "same corpus, across micro-batch splits with a replica re-ingest") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    // the REAL corpus (the batch row's imagesFromDocuments source) plus
    // a replica re-ingest: every 7th image re-crawled under a new id —
    // the keeper must stay the ORIGINAL (smaller) id and only the copy
    // count moves
    val corpus = MediaOps.imagesFromDocuments(spark, sfDir)
      .collect().map(m => (m.doc_id, m.payload)).sortBy(_._1).toSeq
    assert(corpus.size >= 20, "fixture corpus too small to split")
    val replicas = corpus.filter(_._1 % 7 == 3)
      .map { case (id, p) => (id + 5000000L, p) }
    assert(replicas.nonEmpty)

    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaStreams.dedupState(input.toDF()
        .toDF("doc_id", "payload")).writeStream
      .format("memory").queryName("mds").outputMode("append").start()
    val got = try {
      // three corpus micro-batches, then the replicas re-ingest as a
      // LATE fourth batch (state must carry across all splits)
      corpus.grouped(math.max(1, corpus.length / 3 + 1))
        .foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(replicas); q.processAllAvailable()
      // fold the Append-mode changelog to each key's final state:
      // n_copies is strictly increasing per key, so max picks it
      spark.table("mds").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(t => (t._1, t._2)).view
        .mapValues(_.maxBy(_._4)).values.toSet
    } finally q.stop()

    // the batch operator's exact body over the same fed union
    val want = (corpus ++ replicas).toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val img = MediaOps.decodePng(p)
        (MediaOps.pixelChecksum(img),
          img.getWidth.toLong * img.getHeight, id)
      })
      .toDF("checksum", "n_pixels", "doc_id")
      .groupBy("checksum", "n_pixels")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("keep_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_copies"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // every replica landed on its original keeper: no replica id keeps
    got.foreach { case (_, _, keep, _) => assert(keep < 5000000L) }
    // and the re-ingest is visible: every replica's key counts ≥ 2
    val repKeys = replicas.map { case (_, p) =>
      val img = MediaOps.decodePng(p)
      (MediaOps.pixelChecksum(img), img.getWidth.toLong * img.getHeight)
    }.toSet
    repKeys.foreach { k =>
      val row = got.find(t => (t._1, t._2) == k)
      assert(row.exists(_._4 >= 2), s"replica key $k must count >= 2")
    }
  }
}
