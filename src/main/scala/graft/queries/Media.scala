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

  /** `m_media_neardup` verify threshold: duplicate images land at
    * Hamming 0 while unrelated whitened rasters measure ≥ 16 at both
    * verify scales, so the band-collision candidates the LSH join
    * surfaces are decisively rejected (the split is pinned in
    * MediaOpsSpec).
    */
  val NearDupMaxHamming = 6

  /** The verify corpora contain no duplicate documents (sf0.001/sf0.01
    * measure zero repeated texts), so the near-dup row would be
    * vacuously empty there. Its fixture therefore RE-INGESTS a
    * deterministic subset — every doc with id ≡ [[ReplicaRes]] (mod
    * [[ReplicaMod]]) re-enters under id + [[ReplicaOffset]] with the same
    * text — the "same image re-crawled under a new key" case a real
    * media pipeline dedups. Both engines apply the identical union, so
    * the row stays hash-checked with ~|docs|/29 true-positive pairs at
    * every scale.
    */
  val ReplicaMod = 29
  val ReplicaRes = 3
  val ReplicaOffset = 1000000L

  /** The C(4,2) = 6 band-PAIR combinations — the candidate key of every
    * banded media near-dup join. A single 16-bit band collides randomly
    * at 2⁻¹⁶ per pair, which is a QUADRATIC n²/2¹⁶ false-candidate term
    * that overtakes the true pairs at corpus scale (ScaleBench measured
    * it at 14.9× under a 4× blowup); keying on a band pair widens the
    * effective key to 32 bits (n²·6/2³² — gone at any realistic corpus)
    * at 1.5× the exchange rows. The recall contract narrows with it:
    * a candidate now needs TWO clean bands, so the guarantee covers
    * every pair whose ≤ [[NearDupMaxHamming]] differing bits touch at
    * most 2 of the 4 bands — which includes ALL exact-signature copies
    * (the re-crawled/re-encoded case the rows exist for; fixture dups
    * land at Hamming 0 while distinct whitened rasters measure ≥ 16,
    * pinned in MediaOpsSpec) — and drops the corner where ≤ 6 bits
    * spread across 3+ bands. The DuckDB oracles replay the identical
    * pair keys, so the semantics stay engine-pinned.
    */
  private[queries] val BandPairs: Seq[(Int, Int)] =
    Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))

  /** The shared banded near-dup composition over a `(doc_id, b0..b3)`
    * signature frame (image aHash or audio fingerprint): candidates from
    * any shared band PAIR ([[BandPairs]] — at 100 TB the only wide
    * exchange moves (pair-key, id) tuples, never an all-pairs comparison,
    * never payloads), exact Hamming verify over the full 64-bit
    * signature on the candidate set only.
    */
  private def bandedNearDup(h: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val lng = BandPairs.zipWithIndex.map { case ((i, j), pi) =>
      h.select(col("doc_id"), lit(pi).as("pi"),
        col(s"b$i").as("bu"), col(s"b$j").as("bv"))
    }.reduce(_.unionAll(_))
    val cand = lng.as("x").join(lng.as("y"),
        col("x.pi") === col("y.pi") && col("x.bu") === col("y.bu") &&
          col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val ha = h.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = h.select(col("doc_id").as("doc_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, Seq("doc_a")).join(hb, Seq("doc_b"))
      .withColumn("hamming", expr(
        "CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS INT)"))
      .where(col("hamming") <= NearDupMaxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** The replica-augmented (doc_id, text) source both near-dup rows and
    * the audio fingerprint row ingest (see [[ReplicaMod]]).
    */
  private[queries] def withReplicas(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    docs.unionAll(
      docs.where(col("doc_id") % ReplicaMod === ReplicaRes)
        .select((col("doc_id") + ReplicaOffset).as("doc_id"), col("text")))
  }

  /** The verified image near-dup pair table fitted once per (session,
    * source dir) — r19 optimization, second pass: `m_media_neardup` and
    * `m_media_dup_clusters` each re-ran the ENTIRE decode → perceptual
    * hash → banded candidate join → Hamming verify pipeline; a dedup
    * pipeline generates candidate pairs once and both the pair report
    * and the cluster extraction read the same table. Only the verified
    * pair table stays pinned (candidate-scale rows — tiny relative to
    * the corpus, which is the point of banded LSH); the signature
    * checkpoint is released once the pairs materialize. Invalidation
    * rides the central `Graph.invalidateModels` chain via
    * [[invalidateShared]].
    */
  private val ndCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]
  private val ndPins = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Set[Int]]

  private def neardupShared(s: SparkSession, dir: String): DataFrame =
    ndCache.getOrElseUpdate((s, dir), {
      val sc = s.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val h = MediaOps.perceptualHash(MediaOps.imagesFrom(withReplicas(s, dir)))
        .toDF().localCheckpoint(true)
      val hIds = (sc.getPersistentRDDs.keySet -- before).toSet
      val pairs = bandedNearDup(h).localCheckpoint(true)
      // release the signature scaffolding (sparing anything another
      // fit pinned); only the verified pair table pins under this key
      val pinnedNow = graft.operators.SessionPins.pinned(sc)
      hIds.filterNot(pinnedNow.contains).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      val pinIds = (sc.getPersistentRDDs.keySet -- before).toSet --
        graft.operators.SessionPins.pinned(sc)
      graft.operators.SessionPins.pin(sc, pinIds)
      ndPins.put((s, dir), pinIds)
      pairs
    })

  /** The decoded image-metadata table fitted once per (session, source
    * dir) — r19 optimization, second pass: `m_media_meta` and
    * `m_media_dedup` each re-ran the full real-PNG decode over the
    * corpus (`MediaOps.metaDf`); the dedup row only groups the decoded
    * (checksum, n_pixels) content keys, so an ingest decodes once and
    * both read the same narrow metadata table (payloads are never in
    * the frame — it is node-count rows of integers).
    */
  private val mmCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]
  private val mmPins = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Set[Int]]

  private def metaShared(s: SparkSession, dir: String): DataFrame =
    mmCache.getOrElseUpdate((s, dir), {
      val sc = s.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val meta = MediaOps.metaDf(s, dir).localCheckpoint(true)
      val pinIds = (sc.getPersistentRDDs.keySet -- before).toSet --
        graft.operators.SessionPins.pinned(sc)
      graft.operators.SessionPins.pin(sc, pinIds)
      mmPins.put((s, dir), pinIds)
      meta
    })

  /** Drop the shared media fits (near-dup pairs, decoded metadata) and
    * release their pinned blocks — the re-ingest hook
    * (`Graph.invalidateModels` calls it).
    */
  def invalidateShared(s: SparkSession, dir: String): Unit = {
    ndCache.remove((s, dir))
    ndPins.remove((s, dir)).foreach(ids =>
      graft.operators.SessionPins.unpin(s.sparkContext, ids))
    mmCache.remove((s, dir))
    mmPins.remove((s, dir)).foreach(ids =>
      graft.operators.SessionPins.unpin(s.sparkContext, ids))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_meta" -> ((s, dir) =>
      // r19 second pass: the row IS the session-fitted metadata table
      // (m_media_dedup groups the same fit's content keys).
      metaShared(s, dir)),

    // Decoded-raster channel entropy — the flat/low-palette image gate
    // (see [[MediaOps.pixelEntropy]]). Real PNG decode on the Spark
    // side; the oracle replays the generative pixel model's histogram.
    "m_media_img_entropy" -> ((s, dir) => MediaOps.entropyDf(s, dir)),
    "m_media_img_hist" -> ((s, dir) => MediaOps.histDf(s, dir)),

    // Integer Sobel edge energy over the real-decoded grayscale — see
    // [[MediaOps.sobelEnergy]]; the oracle replays the generative raster
    // and the identical integer convolution.
    "m_media_img_sobel" -> ((s, dir) => MediaOps.sobelDf(s, dir)),
    "m_media_frames" -> ((s, dir) => MediaOps.framesDf(s, dir)),
    "m_media_resize" -> ((s, dir) => MediaOps.resizedDf(s, dir)),

    // Per-image perceptual hash (aHash over the decoded raster) as four
    // 16-bit LSH bands — the fixed-width signature the near-dup join
    // buckets on. The image twin of the text side's MinHash signature
    // table.
    "m_media_phash" -> ((s, dir) => MediaOps.hashDf(s, dir)),

    // Image NEAR-duplicate pairs — the multimodal twin of d_minhash_lsh:
    // banded candidate generation (equi-join on any shared band PAIR —
    // see [[BandPairs]] for the 32-bit-key rationale; at 100 TB the only
    // wide exchange moves (pair-key, id) tuples — never an all-pairs
    // comparison, never pixel data) + exact Hamming verify over the full
    // 64-bit signature on the candidate set only. Exact dupes collide on
    // all 6 pair keys and verify at Hamming 0; random pair-key
    // collisions (~1 per 2^32 pairs per key) are measure-zero at any
    // corpus scale — the quadratic term ScaleBench flagged at 16 bits.
    "m_media_neardup" -> ((s, dir) =>
      // r19 second pass: the row IS the session-fitted verified pair
      // table (m_media_dup_clusters reads the same fit).
      neardupShared(s, dir)),

    // Duplicate-cluster extraction over the image near-dup pair graph —
    // the media twin of d_dup_clusters, closing the dedup loop the same
    // way the text side does (pairs alone over-delete transitive
    // clusters; the pipeline picks ONE keeper per connected GROUP).
    // Delegates to the shared [[graft.graph.ConnectedComponents]]
    // kernel; the candidate-pair graph is tiny relative to the corpus
    // (that is the point of banded LSH), so it rides the single-task
    // union-find regime with the superstep path behind the size guard.
    // cluster_id = min doc_id of the component; singletons are not
    // emitted.
    "m_media_dup_clusters" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // r19 second pass: cluster the session-fitted pair table instead
      // of re-running the decode+hash+verify pipeline the
      // m_media_neardup row already ran.
      graft.graph.ConnectedComponents.run(
          s, neardupShared(s, dir).select(
            col("doc_a").as("src"), col("doc_b").as("dst")),
          rounds = graft.queries.Text.DupClusterRounds)
        .select(col("node_id").as("doc_id"), col("comp").as("cluster_id"))
    }),

    // AUDIO near-duplicate pairs — the fourth dedup modality next to
    // exact (m_media_dedup), image (m_media_neardup) and video
    // (m_media_video_neardup): Haitsma–Kalker sub-band energy-delta
    // fingerprints over the REAL-decoded PCM (see
    // [[MediaOps.audioFingerprint]] — 64 integer bits as four 16-bit LSH
    // bands), then the identical banded candidate generation + Hamming
    // verify the image path runs. Same replica re-ingest for
    // non-vacuity; same 100 TB shape — wide exchanges move (band, id)
    // tuples, never samples.
    "m_media_audio_neardup" -> ((s, dir) => {
      val h = MediaOps.audioFingerprint(MediaOps.audiosFrom(withReplicas(s, dir)))
        .toDF().localCheckpoint(true)
      bandedNearDup(h)
    }),

    // The fingerprint signature table itself — the audio twin of
    // m_media_phash: one fixed-width (doc_id, b0..b3) row per clip off
    // the real WAV decode, the key material the near-dup join buckets on.
    "m_media_audio_fp" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.audioFingerprint(MediaOps.audiosFrom(
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .toDF()
    }),

    // Video NEAR-duplicate pairs via frame-hash overlap — the standard
    // video-dedup composition: per-frame aHash signatures (every frame
    // REALLY decoded from the container), banded LSH candidates on
    // (frame_idx, band) — aligned-frame comparison, the re-encoded-copy
    // case — exact Hamming verify per candidate frame pair, then a video
    // verdict when ≥ half the longer video's frames match
    // (2·n_match ≥ max(nf_a, nf_b), kept integer so the compare is
    // float-free). Same replica re-ingest as m_media_neardup for
    // non-vacuity at the verify scales; same 100 TB shape — wide
    // exchanges move (frame, band, id) tuples and per-doc frame counts,
    // never pixels.
    "m_media_video_neardup" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val fh = MediaOps.frameHashes(MediaOps.videosFrom(withReplicas(s, dir)))
        .toDF().localCheckpoint(true)
      val lng = BandPairs.zipWithIndex.map { case ((i, j), pi) =>
        fh.select(col("doc_id"), col("frame_idx"), lit(pi).as("pi"),
          col(s"b$i").as("bu"), col(s"b$j").as("bv"))
      }.reduce(_.unionAll(_))
      val cand = lng.as("x").join(lng.as("y"),
          col("x.frame_idx") === col("y.frame_idx") &&
            col("x.pi") === col("y.pi") && col("x.bu") === col("y.bu") &&
            col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.frame_idx").as("f"))
        .distinct()
      val ha = fh.select(col("doc_id").as("doc_a"),
        col("frame_idx").as("f"), col("b0").as("a0"), col("b1").as("a1"),
        col("b2").as("a2"), col("b3").as("a3"))
      val hb = fh.select(col("doc_id").as("doc_b"),
        col("frame_idx").as("f"), col("b0").as("c0"), col("b1").as("c1"),
        col("b2").as("c2"), col("b3").as("c3"))
      val matched = cand.join(ha, Seq("doc_a", "f")).join(hb, Seq("doc_b", "f"))
        .where(expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)") <= NearDupMaxHamming)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_match"))
      val nf = fh.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      matched
        .join(nf.select(col("doc_id").as("doc_a"), col("nf").as("nf_a")),
          Seq("doc_a"))
        .join(nf.select(col("doc_id").as("doc_b"), col("nf").as("nf_b")),
          Seq("doc_b"))
        .where(col("n_match") * 2 >= greatest(col("nf_a"), col("nf_b")))
        .selectExpr("doc_a", "doc_b", "CAST(n_match AS BIGINT) AS n_match",
          "CAST(nf_a AS BIGINT) AS nf_a", "CAST(nf_b AS BIGINT) AS nf_b")
    }),

    // Audio decode + signal features — the third modality (real RIFF/WAV
    // parse via javax.sound.sampled): sample rate / channels / bit depth
    // from the DECODED format, plus all-integer clip features (zero
    // crossings, Σ s² energy, rolling sample checksum). WAV PCM is
    // lossless, so the oracle's generative replay proves the encode →
    // parse → sample-reconstruction path exactly, as with PNG.
    "m_media_audio_meta" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.decodeAudioMeta(MediaOps.audiosFrom(
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .toDF()
    }),

    // Decimating audio downsample over the decoded samples — the audio
    // sibling of the image nearest-neighbor resize (integer index
    // arithmetic, narrow kernel, payloads never shuffle).
    "m_media_audio_downsample" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.downsampleAudio(MediaOps.audiosFrom(
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .toDF()
    }),

    // Audio loudness gate — the silence/clipping filter an audio ingest
    // runs before training (see [[MediaOps.decodeAudioGate]]): integer
    // peak/clip-count/energy moments plus RMS, whose division-then-sqrt
    // is IEEE-exactly-rounded on both engines (the one sketch-free float
    // column on the media board that hash-compares with no rounding).
    "m_media_audio_gate" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.decodeAudioGate(MediaOps.audiosFrom(
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .toDF()
    }),

    // Voice-activity segmentation over the decoded PCM — see
    // [[MediaOps.decodeAudioVad]]: active-sample count, maximal-run
    // segment count, display ratio; all-integer moments, generative
    // oracle replay like its audio siblings.
    "m_media_audio_vad" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      MediaOps.decodeAudioVad(MediaOps.audiosFrom(
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .toDF()
    }),

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
      // r19 second pass: group the session-fitted metadata table's
      // content keys instead of re-decoding the corpus.
      metaShared(s, dir)
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

  /** One generative pixel value — the oracle twin of
    * [[MediaOps.pixelValue]]: kmvMix((th + 7919·f + i) mod P) mod 256.
    * Expects column `th` in scope.
    */
  private def pix(i: String, f: String = "0"): String =
    s"(${graft.text.TextOps.duck.kmvMix(
      s"((th + 7919 * ($f) + ($i)) % ${MediaOps.P})")} % 256)"

  /** One interior-pixel Sobel term |gx| + |gy| for `m_media_img_sobel`:
    * `i` enumerates interior pixels row-major ((w−2)·(ih−2) of them),
    * `gs` is the 1-based row-major grayscale list, and the 3×3 taps are
    * integer list lookups — the exact convolution
    * [[MediaOps.sobelEnergy]] runs over the decoded raster.
    */
  private def sobelTermSql: String = {
    def gAt(dx: Int, dy: Int): String =
      s"gs[(1 + i // (w - 2) + ($dy)) * w + (1 + i % (w - 2) + ($dx)) + 1]"
    val gx = s"${gAt(1, -1)} + 2 * ${gAt(1, 0)} + ${gAt(1, 1)} - " +
      s"${gAt(-1, -1)} - 2 * ${gAt(-1, 0)} - ${gAt(-1, 1)}"
    val gy = s"${gAt(-1, 1)} + 2 * ${gAt(0, 1)} + ${gAt(1, 1)} - " +
      s"${gAt(-1, -1)} - 2 * ${gAt(0, -1)} - ${gAt(1, -1)}"
    s"abs($gx) + abs($gy)"
  }

  /** Raster checksum of frame `f` under the generative model: fold over
    * the w·ih·3 channel values. Expects columns `w`, `ih`, `th` in scope.
    */
  private def rasterChecksum(f: String): String =
    fold(s"list_transform(range(0, w * ih * 3), i -> ${pix("i", f)})")

  /** The generative-parameter CTE chain shared by all media oracles:
    * th (text hash) → w, ih — the mirror of [[MediaOps.widthOf]] /
    * heightOf. `docsSql` is the (doc_id, text) source — `documents` for
    * most rows, the replica-augmented union for the near-dup row.
    */
  private def paramsCte(
      docsSql: String = "SELECT doc_id, text FROM documents"): String =
    s"""WITH th_t AS (SELECT doc_id, ${fold(codesOf("text"))} AS th
       |  FROM ($docsSql)),
       |p AS (SELECT doc_id, th, 16 + th % 17 AS w,
       |  12 + (th // 17) % 13 AS ih FROM th_t)""".stripMargin

  private def replicaDocsSql: String =
    s"""SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + $ReplicaOffset AS doc_id, text
       |  FROM documents WHERE doc_id % $ReplicaMod = $ReplicaRes""".stripMargin

  /** aHash replay: gray(k) for target pixel k under the nearest-neighbor
    * 8×8 resize of the generative raster; band j assembles bits 16j..16j+15
    * non-negative (no signed-shift semantics in either engine).
    */
  /** NN-sampled grayscale of target pixel k for frame `f` (expects
    * columns `w`, `ih`, `th` in scope).
    */
  private def graySql(f: String): String = {
    val base = "((((k // 8) * ih) // 8) * w + (((k % 8) * w) // 8)) * 3"
    s"((${pix(s"$base + 0", f)} + ${pix(s"$base + 1", f)} + " +
      s"${pix(s"$base + 2", f)}) // 3)"
  }

  /** Band j of the aHash from `gray`/`mean` columns. */
  private def bandSql(j: Int): String =
    s"CAST(list_sum(list_transform(range(0, 16), t -> " +
      s"CASE WHEN gray[${j * 16} + t + 1] > mean THEN (1 << t) " +
      s"ELSE 0 END)) AS INT)"

  private def phashCte(
      docsSql: String = "SELECT doc_id, text FROM documents"): String =
    s"""${paramsCte(docsSql)},
       |pg AS (SELECT doc_id,
       |  list_transform(range(0, 64), k -> ${graySql("0")}) AS gray FROM p),
       |pm AS (SELECT doc_id, gray, list_sum(gray) // 64 AS mean FROM pg),
       |ph AS MATERIALIZED (SELECT doc_id, ${bandSql(0)} AS b0,
       |  ${bandSql(1)} AS b1, ${bandSql(2)} AS b2, ${bandSql(3)} AS b3
       |  FROM pm)""".stripMargin

  /** Per-(doc, frame) signature table `vph` over `docsSql`. */
  private def framePhashCte(docsSql: String): String =
    s"""${paramsCte(docsSql)},
       |vfr AS (SELECT doc_id, w, ih, th,
       |  unnest(range(0, 1 + th % ${MediaOps.MaxFrames})) AS f FROM p),
       |vg AS (SELECT doc_id, f,
       |  list_transform(range(0, 64), k -> ${graySql("f")}) AS gray
       |  FROM vfr),
       |vm AS (SELECT doc_id, f, gray, list_sum(gray) // 64 AS mean FROM vg),
       |vph AS MATERIALIZED (SELECT doc_id, f, ${bandSql(0)} AS b0,
       |  ${bandSql(1)} AS b1, ${bandSql(2)} AS b2, ${bandSql(3)} AS b3
       |  FROM vm)""".stripMargin

  /** Unsigned generative sample u(i) — oracle twin of
    * [[MediaOps.audioSample]]. Expects `th` in scope.
    */
  private def sampleSql(i: String): String =
    s"(${graft.text.TextOps.duck.kmvMix(
      s"((th + 524287 + ($i)) % ${MediaOps.P})")} % 65536)"

  /** Per-doc CTE `au(doc_id, n, us)` with the unsigned sample list. */
  private def audioCte(
      docsSql: String = "SELECT doc_id, text FROM documents"): String =
    s"""${paramsCte(docsSql)},
       |an AS (SELECT doc_id, th, 400 + th % 800 AS n FROM p),
       |au AS MATERIALIZED (SELECT doc_id, n,
       |  list_transform(range(0, n), i -> ${sampleSql("i")}) AS us
       |  FROM an)""".stripMargin

  /** Audio-fingerprint CTE chain ending in `ph(doc_id, b0..b3)` — the
    * generative replay of [[MediaOps.audioFingerprint]]: 85 slice
    * energies as exact BIGINTs off the unsigned sample list, the 64
    * Haitsma–Kalker delta bits assembled into four 16-bit bands. Shared
    * by the `m_media_audio_fp` and `m_media_audio_neardup` oracles.
    */
  private def audioFpCte(
      docsSql: String = "SELECT doc_id, text FROM documents"): String = {
    val S = (MediaOps.FpWindows + 1) * MediaOps.FpBands
    def eAt(w: Int, b: Int) = s"es[${w * MediaOps.FpBands + b + 1}]"
    def bandExpr(j: Int) = (0 until 16).map { t =>
      val k0 = j * 16 + t
      val w = k0 / (MediaOps.FpBands - 1) + 1
      val b = k0 % (MediaOps.FpBands - 1)
      s"CASE WHEN (${eAt(w, b)} - ${eAt(w, b + 1)}) - " +
        s"(${eAt(w - 1, b)} - ${eAt(w - 1, b + 1)}) > 0 " +
        s"THEN ${1 << t} ELSE 0 END"
    }.mkString(" + ")
    s"""${audioCte(docsSql)},
       |aes AS MATERIALIZED (SELECT doc_id,
       |  list_transform(range(0, $S), k ->
       |    CAST(coalesce(list_sum(list_transform(
       |      range((k * n) // $S, ((k + 1) * n) // $S),
       |      i -> (us[CAST(i + 1 AS INT)] - 32768) *
       |           (us[CAST(i + 1 AS INT)] - 32768))), 0) AS BIGINT))
       |    AS es
       |  FROM au),
       |ph AS MATERIALIZED (SELECT doc_id,
       |  CAST(${bandExpr(0)} AS INT) AS b0,
       |  CAST(${bandExpr(1)} AS INT) AS b1,
       |  CAST(${bandExpr(2)} AS INT) AS b2,
       |  CAST(${bandExpr(3)} AS INT) AS b3
       |  FROM aes)""".stripMargin
  }

  /** The banded candidate + Hamming-verify oracle tail over a CTE named
    * `ph(doc_id, b0..b3)` — shared verbatim by the image and audio
    * near-dup oracles (the [[bandedNearDup]] twin).
    */
  private def bandedNearDupTailSql: String = {
    val lngRows = BandPairs.zipWithIndex.map { case ((i, j), pi) =>
      if (pi == 0) s"SELECT doc_id, $pi AS pi, b$i AS bu, b$j AS bv FROM ph"
      else s"UNION ALL SELECT doc_id, $pi, b$i, b$j FROM ph"
    }.mkString("\n  ")
    s"""lng AS ($lngRows),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM lng x JOIN lng y
       |  ON y.pi = x.pi AND y.bu = x.bu AND y.bv = x.bv
       |    AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
       |      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
       |      AS INT) AS hamming
       |  FROM cand c JOIN ph a ON a.doc_id = c.doc_a
       |  JOIN ph b ON b.doc_id = c.doc_b) v
       |WHERE hamming <= $NearDupMaxHamming""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "m_media_audio_meta" ->
      s"""${audioCte()}
         |SELECT doc_id, 8000 AS sample_rate, 1 AS channels, 16 AS bits,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST(list_sum(list_transform(range(1, n), i ->
         |    CASE WHEN (us[CAST(i AS INT)] < 32768) <>
         |      (us[CAST(i + 1 AS INT)] < 32768) THEN 1 ELSE 0 END))
         |    AS BIGINT) AS zero_crossings,
         |  CAST(list_sum(list_transform(us, u ->
         |    (u - 32768) * (u - 32768))) AS BIGINT) AS energy,
         |  ${fold("us")} AS checksum
         |FROM au""".stripMargin,
    "m_media_audio_gate" ->
      s"""${audioCte()}
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
         |  CAST(coalesce(list_max(list_transform(us, u -> abs(u - 32768))),
         |    0) AS BIGINT) AS peak,
         |  CAST(coalesce(list_sum(list_transform(us, u ->
         |    CASE WHEN u = 0 OR u = 65535 THEN 1 ELSE 0 END)), 0)
         |    AS BIGINT) AS n_clipped,
         |  CAST(coalesce(list_sum(list_transform(us, u ->
         |    (u - 32768) * (u - 32768))), 0) AS BIGINT) AS energy,
         |  CASE WHEN n = 0 THEN 0.0 ELSE
         |    sqrt(CAST(list_sum(list_transform(us, u ->
         |      (u - 32768) * (u - 32768))) AS DOUBLE) / CAST(n AS DOUBLE))
         |    END AS rms
         |FROM au""".stripMargin,
    "m_media_audio_vad" ->
      s"""${audioCte()},
         |vf AS (SELECT doc_id, n,
         |  CAST(coalesce(list_sum(list_transform(us, u ->
         |    CASE WHEN abs(u - 32768) >= ${MediaOps.VadThreshold}
         |      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_active,
         |  CAST(coalesce(list_sum(list_transform(range(0, n), i ->
         |    CASE WHEN abs(us[CAST(i + 1 AS INT)] - 32768) >=
         |        ${MediaOps.VadThreshold}
         |      AND (i = 0 OR abs(us[CAST(i AS INT)] - 32768) <
         |        ${MediaOps.VadThreshold})
         |    THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_segments
         |  FROM au)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, n_active,
         |  n_segments,
         |  CASE WHEN n = 0 THEN 0.0
         |    ELSE round(CAST(n_active AS DOUBLE) / n, 6) END AS active_ratio
         |FROM vf""".stripMargin,
    "m_media_audio_downsample" ->
      s"""${audioCte()}
         |SELECT doc_id, CAST((n + 1) // 2 AS BIGINT) AS n_out,
         |  ${fold(s"list_transform(range(0, (n + 1) // 2), " +
              s"j -> us[CAST(2 * j + 1 AS INT)])")} AS checksum
         |FROM au""".stripMargin,
    "m_media_phash" -> s"${phashCte()}\nSELECT doc_id, b0, b1, b2, b3 FROM ph",
    "m_media_video_neardup" ->
      s"""${framePhashCte(replicaDocsSql)},
         |lngv AS (${BandPairs.zipWithIndex.map { case ((i, j), pi) =>
              if (pi == 0)
                s"SELECT doc_id, f, $pi AS pi, b$i AS bu, b$j AS bv FROM vph"
              else s"UNION ALL SELECT doc_id, f, $pi, b$i, b$j FROM vph"
            }.mkString("\n  ")}),
         |candv AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    x.f AS f
         |  FROM lngv x JOIN lngv y
         |  ON y.f = x.f AND y.pi = x.pi AND y.bu = x.bu AND y.bv = x.bv
         |    AND x.doc_id < y.doc_id),
         |fm AS (SELECT c.doc_a, c.doc_b, count(*) AS n_match
         |  FROM candv c
         |  JOIN vph a ON a.doc_id = c.doc_a AND a.f = c.f
         |  JOIN vph b ON b.doc_id = c.doc_b AND b.f = c.f
         |  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
         |    bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |    <= $NearDupMaxHamming
         |  GROUP BY 1, 2),
         |nfv AS (SELECT doc_id, count(*) AS nf FROM vph GROUP BY 1)
         |SELECT doc_a, doc_b, CAST(n_match AS BIGINT) AS n_match,
         |  CAST(na.nf AS BIGINT) AS nf_a, CAST(nb.nf AS BIGINT) AS nf_b
         |FROM fm JOIN nfv na ON na.doc_id = fm.doc_a
         |JOIN nfv nb ON nb.doc_id = fm.doc_b
         |WHERE n_match * 2 >= greatest(na.nf, nb.nf)""".stripMargin,
    "m_media_neardup" ->
      s"""${phashCte(replicaDocsSql)},
         |$bandedNearDupTailSql""".stripMargin,
    // the d_dup_clusters closure tail over the image near-dup pair SQL
    // (nested WITH scopes the inner ph/lng/cand names).
    "m_media_dup_clusters" ->
      s"""WITH RECURSIVE
         |upairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
         |${phashCte(replicaDocsSql)},
         |$bandedNearDupTailSql)),
         |uedges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM upairs
         |  UNION ALL SELECT doc_b AS a, doc_a AS b FROM upairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT a AS id, a AS r FROM uedges
         |  UNION
         |  SELECT e.b AS id, reach.r FROM reach JOIN uedges e ON e.a = reach.id)
         |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    // Audio near-dup: the generative replay of [[MediaOps.audioFingerprint]]
    // — 85 slice energies as exact BIGINTs off the unsigned sample list,
    // the 64 Haitsma–Kalker delta bits assembled into the same four
    // 16-bit bands, then the shared banded candidate/verify tail.
    "m_media_audio_neardup" ->
      s"""${audioFpCte(replicaDocsSql)},
         |$bandedNearDupTailSql""".stripMargin,
    // The fingerprint signature table itself — the audio twin of
    // m_media_phash (the fixed-width rows the near-dup join buckets on).
    "m_media_audio_fp" ->
      s"""${audioFpCte()}
         |SELECT doc_id, b0, b1, b2, b3 FROM ph""".stripMargin,
    "m_media_meta" ->
      s"""${paramsCte()}
         |SELECT doc_id, CAST(w AS INT) AS width, CAST(ih AS INT) AS height,
         |  3 AS channels, CAST(w * ih AS BIGINT) AS n_pixels,
         |  ${rasterChecksum("0")} AS checksum
         |FROM p""".stripMargin,
    "m_media_img_sobel" ->
      s"""${paramsCte()},
         |g AS MATERIALIZED (SELECT doc_id, w, ih, u.k AS k,
         |  (${pix("3 * u.k + 0")} + ${pix("3 * u.k + 1")} +
         |   ${pix("3 * u.k + 2")}) // 3 AS gv
         |  FROM p, UNNEST(range(0, w * ih)) AS u(k)),
         |gl AS MATERIALIZED (SELECT doc_id, w, ih,
         |  list(gv ORDER BY k) AS gs FROM g GROUP BY 1, 2, 3),
         |en AS (SELECT doc_id, w, ih,
         |  CAST(greatest(0, w - 2) * greatest(0, ih - 2) AS BIGINT)
         |    AS n_interior,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(0, greatest(0, w - 2) * greatest(0, ih - 2)),
         |      i -> $sobelTermSql)), (a, x) -> a + x) AS BIGINT)
         |    AS edge_energy
         |  FROM gl)
         |SELECT doc_id, CAST(w AS INT) AS w, CAST(ih AS INT) AS ih,
         |  n_interior, edge_energy,
         |  CASE WHEN n_interior = 0 THEN 0.0
         |    ELSE round(CAST(edge_energy AS DOUBLE) / n_interior, 6)
         |    END AS mean_grad
         |FROM en""".stripMargin,
    "m_media_img_entropy" ->
      s"""${paramsCte()},
         |px AS MATERIALIZED (SELECT doc_id, ${pix("u.i")} AS v
         |  FROM p, UNNEST(range(0, w * ih * 3)) AS u(i)),
         |hist AS MATERIALIZED (SELECT doc_id, v, count(*) AS c FROM px
         |  GROUP BY 1, 2),
         |mom AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_vals,
         |  count(*) AS n_distinct, sum(c * ln(CAST(c AS DOUBLE))) AS s
         |  FROM hist GROUP BY 1)
         |SELECT doc_id, n_vals, n_distinct,
         |  round((ln(CAST(n_vals AS DOUBLE)) - s / n_vals)
         |    / ln(CAST(2 AS DOUBLE)), 6) AS entropy_bits
         |FROM mom""".stripMargin,
    "m_media_img_hist" ->
      s"""${paramsCte()},
         |px AS MATERIALIZED (SELECT doc_id, CAST(u.i % 3 AS INT) AS channel,
         |  CAST(${pix("u.i")} // 16 AS INT) AS bin
         |  FROM p, UNNEST(range(0, w * ih * 3)) AS u(i)),
         |cnt AS MATERIALIZED (SELECT doc_id, channel, bin, count(*) AS c
         |  FROM px GROUP BY 1, 2, 3),
         |grid AS (SELECT doc_id, CAST(u.c AS INT) AS channel,
         |  CAST(v.b AS INT) AS bin
         |  FROM p, UNNEST(range(0, 3)) AS u(c), UNNEST(range(0, 16)) AS v(b))
         |SELECT g.doc_id, g.channel, g.bin,
         |  CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
         |FROM grid g LEFT JOIN cnt USING (doc_id, channel, bin)""".stripMargin,
    "m_media_dedup" ->
      s"""${paramsCte()},
         |meta AS (SELECT doc_id, CAST(w * ih AS BIGINT) AS n_pixels,
         |  ${rasterChecksum("0")} AS checksum FROM p)
         |SELECT min(doc_id) AS keep_id, n_pixels, count(*) AS n_copies
         |FROM meta GROUP BY checksum, n_pixels""".stripMargin,
    "m_media_frames" ->
      s"""${paramsCte()},
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
      s"""${paramsCte()}
         |SELECT doc_id, $tw AS width, $thh AS height,
         |  ${fold(s"list_transform(range(0, $n), j -> " +
              pix(s"($sy * w + $sx) * 3 + j % 3") + ")")} AS checksum
         |FROM p""".stripMargin
    }
  )
}
