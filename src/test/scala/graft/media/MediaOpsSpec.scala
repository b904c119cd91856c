package graft.media

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpec {

  test("binary payload round-trips the document bytes") {
    val media = MediaOps.fromDocuments(spark, sfDir).collect()
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(media.length == texts.size)
    media.take(20).foreach { m =>
      assert(new String(m.payload, "UTF-8") == texts(m.doc_id))
    }
  }

  test("decode stub emits deterministic typed metadata") {
    val meta = MediaOps.decodeStub(MediaOps.fromDocuments(spark, sfDir))
      .collect().map(m => m.doc_id -> m).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.take(20).foreach { case (id, t) =>
      val m = meta(id)
      assert(m.n_bytes == t.getBytes("UTF-8").length)
      assert(m.checksum == MediaOps.byteHash(t.getBytes("UTF-8")))
      assert(m.width == (m.checksum % 640).toInt)
      assert(m.height == ((m.checksum / 640) % 480).toInt)
    }
  }

  test("feature stub is fixed-width and deterministic") {
    val a = MediaOps.featureStub(MediaOps.fromDocuments(spark, sfDir))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val b = MediaOps.featureStub(MediaOps.fromDocuments(spark, sfDir))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
  }
}
