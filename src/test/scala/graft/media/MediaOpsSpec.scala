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

  test("frame sampling: kept frames cover every-Nth stride, checksums match bytes") {
    val media = MediaOps.fromDocuments(spark, sfDir)
    val frames = MediaOps.frameSample(media).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    val payloads = media.collect().map(m => m.doc_id -> m.payload).toMap
    payloads.take(20).foreach { case (id, bytes) =>
      val total = (bytes.length + MediaOps.FrameBytes - 1) / MediaOps.FrameBytes
      val kept = (0 until total).filter(_ % MediaOps.FrameEvery == 0)
      val got = frames.getOrElse(id, Array.empty[MediaOps.MediaFrame])
      assert(got.map(_.frame_idx).toSeq == kept)
      got.foreach { fr =>
        val from = fr.frame_idx * MediaOps.FrameBytes
        val until = math.min(from + MediaOps.FrameBytes, bytes.length)
        val expect = java.util.Arrays.copyOfRange(bytes, from, until)
        assert(fr.n_bytes == expect.length.toLong)
        assert(fr.checksum == MediaOps.byteHash(expect))
      }
    }
  }

  test("resize stub bounds output size and is stride-exact") {
    val media = MediaOps.fromDocuments(spark, sfDir)
    val resized = MediaOps.resizeStub(media).collect().map(r => r.doc_id -> r).toMap
    val payloads = media.collect().map(m => m.doc_id -> m.payload).toMap
    payloads.take(20).foreach { case (id, bytes) =>
      val r = resized(id)
      assert(r.n_bytes <= MediaOps.ResizeTarget)
      val stride = math.max(1, (bytes.length + MediaOps.ResizeTarget - 1) / MediaOps.ResizeTarget)
      val kept = (0 until (bytes.length + stride - 1) / stride)
        .map(i => bytes(i * stride)).toArray
      assert(r.n_bytes == kept.length.toLong)
      assert(r.checksum == MediaOps.byteHash(kept))
    }
  }

  test("payload dedup groups agree with the text-side exact dedup") {
    // both key on document CONTENT (rolling byte checksum here, xxhash64
    // of the text there) — keeper sets and copy counts must coincide
    val media = graft.queries.Media.queries("m_media_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val text = graft.queries.Text.queries("d_dedup_exact")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(media == text)
  }
}
