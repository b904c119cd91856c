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
}
