package graft.media

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import javax.imageio.ImageIO

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpec {

  /** Formula-side checksum: what the DuckDB oracle computes — folds the
    * GENERATIVE channel values, never touching PNG.
    */
  private def formulaChecksum(th: Long, frame: Int): Long = {
    val n = MediaOps.widthOf(th).toLong * MediaOps.heightOf(th) * 3
    var (acc, i) = (0L, 0L)
    while (i < n) {
      acc = (acc * 31 + MediaOps.pixelValue(th, frame, i)) % MediaOps.P
      i += 1
    }
    acc
  }

  test("payloads are REAL PNGs: magic bytes, decodable, dims from the " +
      "generative model") {
    val media = MediaOps.imagesFromDocuments(spark, sfDir).collect()
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(media.length == texts.size)
    media.take(20).foreach { m =>
      val sig = m.payload.take(8).map(_ & 0xff)
      assert(sig.sameElements(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
        0x1a, 0x0a)), "not a PNG signature")
      val th = MediaOps.byteHash(texts(m.doc_id).getBytes("UTF-8"))
      val img = MediaOps.decodePng(m.payload)
      assert(img.getWidth == MediaOps.widthOf(th))
      assert(img.getHeight == MediaOps.heightOf(th))
    }
  }

  test("encode → decode round-trips the generated raster exactly: decoded " +
      "checksum equals the formula fold the oracle replays") {
    val meta = graft.queries.Media.queries("m_media_meta")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.take(20).foreach { case (id, t) =>
      val th = MediaOps.byteHash(t.getBytes("UTF-8"))
      val row = meta(id)
      assert(row.getInt(1) == MediaOps.widthOf(th))
      assert(row.getInt(2) == MediaOps.heightOf(th))
      assert(row.getInt(3) == 3) // decoded PNG RGB channel count
      assert(row.getLong(4) ==
        MediaOps.widthOf(th).toLong * MediaOps.heightOf(th))
      assert(row.getLong(5) == formulaChecksum(th, 0))
    }
  }

  /** A REAL image fixture built with plain ImageIO in the test — NOT via
    * MediaOps.encodePng — so the decode kernel is exercised on bytes it
    * did not produce.
    */
  private def handPng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  test("decodeMeta on a hand-built real PNG: exact dims, channels and " +
      "pixel checksum") {
    val s = spark
    import s.implicits._
    // 2×2: red, green / blue, white
    val png = handPng(2, 2, {
      case (0, 0) => 0xff0000; case (1, 0) => 0x00ff00
      case (0, 1) => 0x0000ff; case _ => 0xffffff
    })
    val got = MediaOps.decodeMeta(
      Seq(MediaOps.Media(7L, "image/png", png)).toDS()).collect()(0)
    val expect = Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .foldLeft(0L)((a, v) => (a * 31 + v) % MediaOps.P)
    assert(got == MediaOps.MediaMeta(7L, 2, 2, 3, 4L, expect))
  }

  test("pixelEntropy: solid image scores 0 bits; a hand-built 2-value " +
      "raster scores exactly 1; kernel agrees with a formula replay") {
    val s = spark
    import s.implicits._
    // solid red 2×2: channels {255:4, 0:8} → H = 12·? no — per-channel
    // histogram is {255→4, 0→8}: H = log2(12) − (4·ln4 + 8·ln8)/12/ln2
    val solid = handPng(2, 2, (_, _) => 0xff0000)
    // black/white checkerboard 2×2: {0→6, 255→6} → H = 1 bit exactly
    val checker = handPng(2, 2, { case (x, y) =>
      if ((x + y) % 2 == 0) 0x000000 else 0xffffff })
    val got = MediaOps.pixelEntropy(Seq(
      MediaOps.Media(1L, "image/png", solid),
      MediaOps.Media(2L, "image/png", checker)).toDS()).collect()
      .map(e => e.doc_id -> e).toMap
    val hSolid = graft.text.TextOps.round6(
      (math.log(12.0) - (4 * math.log(4.0) + 8 * math.log(8.0)) / 12.0)
        / math.log(2.0))
    assert(got(1L) == MediaOps.MediaEntropy(1L, 12L, 2L, hSolid))
    assert(got(2L) == MediaOps.MediaEntropy(2L, 12L, 2L, 1.0))
    // whitened generative rasters on the bench corpus sit near 8 bits —
    // far above any flat-image score — and n_distinct ≤ 256
    val bench = MediaOps.entropyDf(spark, sfDir).collect()
    assert(bench.nonEmpty)
    bench.foreach { r =>
      assert(r.getLong(2) <= 256L &&
        r.getDouble(3) > 6.0 && r.getDouble(3) <= 8.0)
    }
  }

  test("sobelEnergy: a solid image scores zero; a vertical step edge " +
      "matches the analytic convolution; bench rows are self-consistent") {
    val s = spark
    import s.implicits._
    val solid = handPng(6, 6, (_, _) => 0x808080)
    // step at x = 2|3: gray 0 left, 255 right → gx = 4·255 at x ∈ {2,3},
    // gy = 0 everywhere → energy = 4 rows × 2 cols × 1020 = 8160
    val step = handPng(6, 6, { case (x, _) =>
      if (x < 3) 0x000000 else 0xffffff })
    val got = MediaOps.sobelEnergy(Seq(
      MediaOps.Media(1L, "image/png", solid),
      MediaOps.Media(2L, "image/png", step)).toDS()).collect()
      .map(e => e.doc_id -> e).toMap
    assert(got(1L) == MediaOps.ImgSobel(1L, 6, 6, 16L, 0L, 0.0))
    assert(got(2L).edge_energy == 8160L && got(2L).n_interior == 16L)
    assert(got(2L).mean_grad == 510.0)
    // bench corpus: real decoded rasters — interior count is exactly
    // (w−2)(ih−2), the mean is the single rounded division, and the
    // whitened generative pixels always have edges
    val bench = MediaOps.sobelDf(spark, sfDir).collect()
    assert(bench.nonEmpty)
    bench.foreach { r =>
      assert(r.getLong(3) == (r.getInt(1) - 2L) * (r.getInt(2) - 2L))
      assert(r.getLong(4) > 0L)
      assert(r.getDouble(5) == graft.text.TextOps.round6(
        r.getLong(4).toDouble / r.getLong(3)))
    }
  }

  test("channelHist: hand-built rasters land in exactly the right " +
      "bins; the full 3x16 grid emits with zero buckets; generative " +
      "corpus replays the pixel formula") {
    val s = spark
    import s.implicits._
    // solid red 2×2: R=255 → bin 15 (4 px); G=B=0 → bin 0 (4 px each)
    val solid = handPng(2, 2, (_, _) => 0xff0000)
    val rows = MediaOps.channelHist(Seq(
      MediaOps.Media(1L, "image/png", solid)).toDS()).collect()
      .map(h => (h.channel, h.bin) -> h.c).toMap
    assert(rows.size == 48, "full grid, zero buckets included")
    assert(rows((0, 15)) == 4L && rows((1, 0)) == 4L && rows((2, 0)) == 4L)
    assert(rows.values.sum == 12L)
    assert(rows.count(_._2 != 0L) == 3)
    // generative corpus: counts replay MediaOps.pixelValue per channel
    val bench = graft.queries.Media.queries("m_media_img_hist")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bench.nonEmpty)
    texts.take(5).foreach { case (id, t) =>
      val th = MediaOps.byteHash(t.getBytes("UTF-8"))
      val (w, h) = (MediaOps.widthOf(th), MediaOps.heightOf(th))
      val want = scala.collection.mutable.Map.empty[(Int, Int), Long]
        .withDefaultValue(0L)
      var i = 0L
      while (i < w.toLong * h * 3) {
        want(((i % 3).toInt, MediaOps.pixelValue(th, 0, i) >> 4)) += 1
        i += 1
      }
      for (ch <- 0 until 3; b <- 0 until 16)
        assert(bench((id, ch, b)) == want((ch, b)), s"doc $id ch $ch bin $b")
    }
  }

  test("resize is exact nearest-neighbor: hand-replayed source indices on " +
      "a hand-built PNG") {
    val s = spark
    import s.implicits._
    // 4×2 gradient: value encodes (x, y) so NN picks are identifiable
    def v(x: Int, y: Int) = (y * 4 + x) * 20
    val png = handPng(4, 2, (x, y) => { val g = v(x, y); (g << 16) | (g << 8) | g })
    val got = MediaOps.resize(
      Seq(MediaOps.Media(3L, "image/png", png)).toDS()).collect()(0)
    var acc = 0L
    for (ty <- 0 until MediaOps.ResizeH; tx <- 0 until MediaOps.ResizeW) {
      val g = v(tx * 4 / MediaOps.ResizeW, ty * 2 / MediaOps.ResizeH)
      for (_ <- 0 until 3) acc = (acc * 31 + g) % MediaOps.P
    }
    assert(got == MediaOps.MediaResized(3L, MediaOps.ResizeW,
      MediaOps.ResizeH, acc))
  }

  test("frameSample parses the container and decodes every kept frame") {
    val s = spark
    import s.implicits._
    // hand-built 3-frame container with distinct dims per frame
    val pngs = Seq(handPng(2, 2, (_, _) => 0x102030),
      handPng(3, 2, (_, _) => 0x405060), handPng(2, 3, (_, _) => 0x708090))
    val bos = new ByteArrayOutputStream()
    pngs.foreach { p =>
      bos.write(ByteBuffer.allocate(4).putInt(p.length).array()); bos.write(p)
    }
    val got = MediaOps.frameSample(
        Seq(MediaOps.Media(9L, "video/png-seq", bos.toByteArray)).toDS())
      .collect().sortBy(_.frame_idx)
    def cks(v: Seq[Int], n: Int) =
      Seq.fill(n)(v).flatten.foldLeft(0L)((a, x) => (a * 31 + x) % MediaOps.P)
    assert(got.toSeq == Seq(
      MediaOps.MediaFrame(9L, 0, 2, 2, cks(Seq(0x10, 0x20, 0x30), 4)),
      MediaOps.MediaFrame(9L, 2, 2, 3, cks(Seq(0x70, 0x80, 0x90), 6))))
  }

  test("video payloads: frame count from the model, per-frame checksums " +
      "equal the formula fold") {
    val frames = graft.queries.Media.queries("m_media_frames")(spark, sfDir)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1))).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.take(20).foreach { case (id, t) =>
      val th = MediaOps.byteHash(t.getBytes("UTF-8"))
      val kept = (0 until MediaOps.framesOf(th))
        .filter(_ % MediaOps.FrameEvery == 0)
      val got = frames(id)
      assert(got.map(_.getInt(1)).toSeq == kept)
      got.foreach { r =>
        assert(r.getLong(4) == formulaChecksum(th, r.getInt(1)))
      }
    }
  }

  test("features are real pixel statistics: channel means on a hand-built " +
      "PNG, fixed width, deterministic") {
    val s = spark
    import s.implicits._
    val png = handPng(2, 2, {
      case (0, 0) => 0xff0000; case (1, 0) => 0x00ff00
      case (0, 1) => 0x0000ff; case _ => 0xffffff
    })
    val f = MediaOps.features(
      Seq(MediaOps.Media(1L, "image/png", png)).toDS()).collect()(0).feature
    assert(f.length == 8)
    assert(f(0) == 510f / 4 && f(1) == 510f / 4 && f(2) == 510f / 4)
    assert(f(3) == 1530f / 12)
    // quadrants of a 2×2 are single pixels: luma mean = pixel mean
    assert(f(4) == 255f / 3 && f(5) == 255f / 3 && f(6) == 255f / 3 &&
      f(7) == 255f)
    val again = MediaOps.features(MediaOps.imagesFromDocuments(spark, sfDir))
      .collect().map(x => x.doc_id -> x.feature.toSeq).toMap
    val first = MediaOps.features(MediaOps.imagesFromDocuments(spark, sfDir))
      .collect().map(x => x.doc_id -> x.feature.toSeq).toMap
    assert(again == first)
  }

  test("aHash: uniform raster hashes to all-zero bands; a half-bright " +
      "raster sets exactly the bright target columns") {
    val uni = MediaOps.decodePng(handPng(10, 6, (_, _) => 0x808080))
    assert(MediaOps.aHashBands(uni).toSeq == Seq(0, 0, 0, 0))
    // 16×8, left half white, right half black: NN picks sx = 2·tx, so
    // target columns 0-3 are bright in every row → per-row bit pattern
    // 0x0F, two rows per 16-bit band → every band 0x0F0F
    val half = MediaOps.decodePng(
      handPng(16, 8, (x, _) => if (x < 8) 0xffffff else 0x000000))
    assert(MediaOps.aHashBands(half).toSeq == Seq(0x0f0f, 0x0f0f, 0x0f0f, 0x0f0f))
  }

  test("m_media_neardup finds exactly the identical-image pairs: banded " +
      "candidates verify at Hamming 0, random band collisions are rejected") {
    val M = graft.queries.Media
    val got = M.queries("m_media_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got.foreach { case (_, _, h) => assert(h == 0) } // whitened rasters
    // expected pairs: rows of the replica-augmented doc set sharing the
    // exact text generate identical images (all C(k,2) pairs per
    // duplicate-text group, smaller id first)
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = base ++ base.collect {
      case (id, t) if id % M.ReplicaMod == M.ReplicaRes =>
        (id + M.ReplicaOffset, t)
    }
    val want = all.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j), 0)
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture has no duplicate images — test is vacuous")
  }

  test("m_media_dup_clusters: connected components over the near-dup " +
      "pairs, cluster_id = min member, singletons absent") {
    val M = graft.queries.Media
    val got = M.queries("m_media_dup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = M.queries("m_media_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && got.nonEmpty)
    // brute union-find over the pair graph
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    assert(got == want)
    // every cluster id IS its minimum member
    got.groupBy(_._2).foreach { case (cid, ms) =>
      assert(ms.keys.min == cid)
    }
  }

  test("the shared near-dup fit is served across both rows, unpins on " +
      "invalidateShared, and the refit row reproduces the same pairs") {
    val M = graft.queries.Media
    val sc = spark.sparkContext
    val before = M.queries("m_media_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pinned0 = graft.operators.SessionPins.pinned(sc)
    M.invalidateShared(spark, sfDir)
    assert(graft.operators.SessionPins.pinned(sc).size < pinned0.size,
      "invalidation must unpin the shared pair-table checkpoint")
    val after = M.queries("m_media_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(after == before) // REFIT from source — not a stale frame
  }

  test("the shared metadata fit: m_media_meta == a fresh uncached " +
      "decode, and invalidateShared refits to the same table") {
    val M = graft.queries.Media
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val fresh = canon(MediaOps.metaDf(spark, sfDir)) // bypasses the fit
    val got0 = canon(M.queries("m_media_meta")(spark, sfDir))
    assert(got0 == fresh && got0.nonEmpty)
    M.invalidateShared(spark, sfDir)
    assert(canon(M.queries("m_media_meta")(spark, sfDir)) == fresh)
  }

  test("frameHashes: every container frame decoded, per-frame bands equal " +
      "the image-level aHash of that frame") {
    val s = spark
    import s.implicits._
    val pngs = Seq(handPng(16, 8, (x, _) => if (x < 8) 0xffffff else 0),
      handPng(10, 6, (_, _) => 0x808080))
    val bos = new ByteArrayOutputStream()
    pngs.foreach { p =>
      bos.write(ByteBuffer.allocate(4).putInt(p.length).array()); bos.write(p)
    }
    val got = MediaOps.frameHashes(
        Seq(MediaOps.Media(5L, "video/png-seq", bos.toByteArray)).toDS())
      .collect().sortBy(_.frame_idx)
    assert(got.length == 2)
    got.zip(pngs).foreach { case (fhash, png) =>
      val b = MediaOps.aHashBands(MediaOps.decodePng(png))
      assert(Seq(fhash.b0, fhash.b1, fhash.b2, fhash.b3) == b.toSeq)
    }
  }

  test("m_media_video_neardup: replica videos match on every frame and " +
      "nothing else crosses the half-overlap verdict") {
    val M = graft.queries.Media
    val got = M.queries("m_media_video_neardup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val replicaIds = Tables(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % M.ReplicaMod == M.ReplicaRes).sorted
    assert(replicaIds.nonEmpty)
    // every emitted pair is a replica pair with FULL frame overlap
    got.foreach { case (a, b, n, nfa, nfb) =>
      assert(b == a + M.ReplicaOffset, s"unexpected pair $a, $b")
      assert(n == nfa && n == nfb, s"partial overlap on a replica: $n $nfa")
    }
    assert(got.map(_._1) == replicaIds.toSet)
  }

  test("audioFingerprint: hand-built alternating-energy clip sets exactly " +
      "the even-(w+b) delta bits") {
    val s = spark
    import s.implicits._
    // n = 850 → 85 slices of exactly 10 samples; slices alternate
    // energy A = 10·100² and 0, so the Haitsma–Kalker delta
    // (E(w,b)−E(w,b+1)) − (E(w−1,b)−E(w−1,b+1)) = ±2A with sign +
    // exactly when slice (w·5+b) is even — a closed form independent of
    // the generative model.
    val n = 850
    val pcm = new Array[Byte](2 * n)
    (0 until n).foreach { i =>
      val v = if ((i / 10) % 2 == 0) 100 else 0
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = MediaOps.audioFingerprint(
      Seq(MediaOps.Media(7L, "audio/wav", bos.toByteArray)).toDS()).collect()(0)
    val want = new Array[Int](4)
    for (w <- 1 to MediaOps.FpWindows; b <- 0 until MediaOps.FpBands - 1)
      if ((w * MediaOps.FpBands + b) % 2 == 0) {
        val k0 = (w - 1) * (MediaOps.FpBands - 1) + b
        want(k0 / 16) |= 1 << (k0 % 16)
      }
    assert(Seq(got.b0, got.b1, got.b2, got.b3) == want.toSeq)
  }

  test("m_media_audio_neardup: replica clips verify at Hamming 0, nothing " +
      "else survives, and distinct clips sit far outside the threshold") {
    val M = graft.queries.Media
    val got = M.queries("m_media_audio_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got.foreach { case (_, _, h) => assert(h == 0) }
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = base ++ base.collect {
      case (id, t) if id % M.ReplicaMod == M.ReplicaRes =>
        (id + M.ReplicaOffset, t)
    }
    val want = all.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j), 0)
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture has no duplicate clips — test is vacuous")
    // separation margin: brute-force pairwise Hamming over the first 120
    // DISTINCT-text fingerprints — the whitened generative PCM must keep
    // every non-duplicate pair decisively past the verify threshold
    val s = spark
    import s.implicits._
    val fps = MediaOps.audioFingerprint(MediaOps.audiosFrom(
        base.take(120).toSeq.toDF("doc_id", "text")))
      .collect().map(f => (f.doc_id, Seq(f.b0, f.b1, f.b2, f.b3)))
    val minH = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      if base(i)._2 != base(j)._2
    } yield fps(i)._2.zip(fps(j)._2)
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum).min
    assert(minH > M.NearDupMaxHamming * 2,
      s"distinct-clip fingerprints too close: min Hamming $minH")
  }

  test("codec idempotence: decode → re-encode → decode preserves every " +
      "pixel, and the kernels handle non-toy rasters") {
    // re-encoding a decoded image and decoding again must reproduce the
    // raster exactly (PNG is lossless both ways) — pins that no stage of
    // the codec path quantizes, color-manages or subsamples
    (0 until 10).foreach { k =>
      val png = MediaOps.encodePng(1000003L * (k + 1) + 17, k % 3)
      val img = MediaOps.decodePng(png)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos))
      val again = MediaOps.decodePng(bos.toByteArray)
      assert(MediaOps.pixelChecksum(again) == MediaOps.pixelChecksum(img))
      assert(MediaOps.aHashBands(again).toSeq ==
        MediaOps.aHashBands(img).toSeq)
    }
    // the kernels are not bounded to the fixture's 32×24: a 1024×768
    // hand-built PNG decodes, resizes and hashes fine
    val big = handPng(1024, 768, (x, y) => ((x ^ y) & 0xff) * 0x010101)
    val img = MediaOps.decodePng(big)
    assert(img.getWidth == 1024 && img.getHeight == 768)
    assert(MediaOps.aHashBands(img).length == 4)
    val s = spark
    import s.implicits._
    val r = MediaOps.resize(
      Seq(MediaOps.Media(1L, "image/png", big)).toDS()).collect()(0)
    assert(r.width == MediaOps.ResizeW && r.height == MediaOps.ResizeH)
  }

  test("audio: hand-built WAV decodes to exact hand-computed stats, and " +
      "the generative clip matches the formula the oracle replays") {
    val s = spark
    import s.implicits._
    // hand-built 6-sample clip through plain javax.sound — NOT encodeWav
    val samples = Array(100, -200, 300, -1, 0, 32000)
    val pcm = new Array[Byte](12)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 6L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = MediaOps.decodeAudioMeta(
      Seq(MediaOps.Media(4L, "audio/wav", bos.toByteArray)).toDS()).collect()(0)
    // sign flips: 100→-200, -200→300, 300→-1, -1→0 (0 is non-negative)
    val zc = 4L
    val energy = samples.map(v => v.toLong * v).sum
    val cks = samples.foldLeft(0L)((a, v) => (a * 31 + (v + 32768)) % MediaOps.P)
    assert(got == MediaOps.AudioMeta(4L, 8000, 1, 16, 6L, zc, energy, cks))
    // downsample keeps indices 0, 2, 4
    val ds = MediaOps.downsampleAudio(
      Seq(MediaOps.Media(4L, "audio/wav", bos.toByteArray)).toDS()).collect()(0)
    val dcks = Seq(100, 300, 0).foldLeft(0L)((a, v) =>
      (a * 31 + (v + 32768)) % MediaOps.P)
    assert(ds == MediaOps.AudioResampled(4L, 3L, dcks))
    // generative clips decode back to the formula (the oracle's replay)
    val metas = graft.queries.Media.queries("m_media_audio_meta")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.take(10).foreach { case (id, t) =>
      val th = MediaOps.byteHash(t.getBytes("UTF-8"))
      val n = MediaOps.audioSamplesOf(th)
      val want = (0 until n).foldLeft(0L)((a, i) =>
        (a * 31 + MediaOps.audioSample(th, i)) % MediaOps.P)
      assert(metas(id).getLong(4) == n.toLong)
      assert(metas(id).getLong(7) == want)
    }
  }

  test("audio vad: hand-built clip counts maximal active runs exactly; " +
      "generative clips replay the threshold formula") {
    val s = spark
    import s.implicits._
    // active flags at |s| >= 8192: T T F F T F T → 4 active, 3 segments
    val samples = Array(9000, 10000, 0, -100, -9000, 8191, 8192)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = MediaOps.decodeAudioVad(
      Seq(MediaOps.Media(7L, "audio/wav", bos.toByteArray)).toDS()).collect()(0)
    assert(got == MediaOps.AudioVad(7L, 7L, 4L, 3L,
      graft.text.TextOps.round6(4.0 / 7)))

    // generative clips: rows must equal the per-sample threshold formula
    // the oracle replays
    val vads = graft.queries.Media.queries("m_media_audio_vad")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vads.keySet == texts.keySet)
    texts.take(10).foreach { case (id, t) =>
      val th = MediaOps.byteHash(t.getBytes("UTF-8"))
      val n = MediaOps.audioSamplesOf(th)
      val act = (0 until n).map(i =>
        math.abs(MediaOps.audioSample(th, i) - 32768) >= MediaOps.VadThreshold)
      val segs = (0 until n).count(i => act(i) && (i == 0 || !act(i - 1)))
      val r = vads(id)
      assert(r.getLong(1) == n.toLong &&
        r.getLong(2) == act.count(identity).toLong &&
        r.getLong(3) == segs.toLong)
    }
  }

  test("audio gate: hand-built clip with rail samples yields exact " +
      "peak/clip/energy and an IEEE-exact RMS; generative clips match " +
      "the oracle formula") {
    val s = spark
    import s.implicits._
    // both rails present: -32768 clips, 32767 clips, 32000 does not
    val samples = Array(100, -32768, 32767, -1, 0, 32000)
    val pcm = new Array[Byte](12)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 6L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = MediaOps.decodeAudioGate(
      Seq(MediaOps.Media(7L, "audio/wav", bos.toByteArray)).toDS()).collect()(0)
    val energy = samples.map(v => v.toLong * v).sum
    assert(got == MediaOps.AudioGate(7L, 6L, 32768L, 2L, energy,
      math.sqrt(energy.toDouble / 6)))

    // zero-sample WAV: rms is DEFINED as 0.0 (not 0/0 NaN — an engine-
    // dependent NaN-vs-NULL hash hazard), every moment 0
    val ebos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.emptyByteArray), fmt, 0L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, ebos)
    val empty = MediaOps.decodeAudioGate(
      Seq(MediaOps.Media(8L, "audio/wav", ebos.toByteArray)).toDS())
      .collect()(0)
    assert(empty == MediaOps.AudioGate(8L, 0L, 0L, 0L, 0L, 0.0))

    // generative clips: the gate row must equal the formula the oracle
    // replays (peak/clip-count/energy from audioSample directly)
    val gates = graft.queries.Media.queries("m_media_audio_gate")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var clippedTotal = 0L
    texts.foreach { case (id, t) =>
      val th = MediaOps.byteHash(t.getBytes("UTF-8"))
      val n = MediaOps.audioSamplesOf(th)
      val ss = (0 until n).map(i => MediaOps.audioSample(th, i) - 32768)
      val peak = ss.map(v => math.abs(v.toLong)).max
      val clipped = ss.count(v => v == 32767 || v == -32768).toLong
      val en = ss.map(v => v.toLong * v).sum
      val g = gates(id)
      assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
        ((n.toLong, peak, clipped, en)))
      assert(g.getDouble(5) == math.sqrt(en.toDouble / n))
      clippedTotal += clipped
    }
    // the gate must be non-vacuous on the corpus: some clip hits a rail
    assert(clippedTotal > 0)
  }

  test("payload dedup groups agree with the text-side exact dedup") {
    // both key on document CONTENT (decoded-raster checksum here — equal
    // texts generate equal images — xxhash64 of the text there): keeper
    // sets and copy counts must coincide
    val media = graft.queries.Media.queries("m_media_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val text = graft.queries.Text.queries("d_dedup_exact")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(media == text)
  }
}
