package graft.harness

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling-exponent evidence for the dedup/ANN family (round-15): the
  * LLM-pipeline rows had gate/sf0.1 evidence but no measured GROWTH LAW.
  * This main times `d_lsh_pairs`, `d_passage_dedup`, `m_media_neardup`
  * and the `e_semdedup` body at the base corpus and at a
  * [[blowDefault]]× synthetic blowup, and discloses t(k·m)/t(m) next to
  * the candidate-set volumes — the bucketed-design claim ("candidate
  * generation is a band equi-join; quadratic work confined to candidate
  * sets"), measured.
  *
  * The blowup is NOT replication: k-copy families of near-identical text
  * would grow candidate sets quadratically in k by construction (every
  * copy pair collides). Each copy j instead applies a deterministic
  * Caesar rotation by j to the text (word lengths, whitespace and
  * punctuation preserved — the workload's shape statistics are intact —
  * but every shingle hash changes, so copies never near-dup against each
  * other) and a j-step dimension ROLL to the embeddings (norms and
  * coordinate distribution preserved; cosine against the original is
  * whitened-random). Duplicate structure WITHIN each copy mirrors the
  * original corpus, so true-positive volume scales linearly — exactly
  * the regime a k×-bigger crawl presents.
  *
  * e_semdedup runs through [[graft.queries.Embeddings.semDedupAtK]] with
  * k · blowup cells at the blowup — the documented SemDeDup scale
  * contract (k ∝ corpus; cell occupancy, and with it the in-cell
  * quadratic pairing, stays ~constant). Holding k fixed while the corpus
  * grows would measure the contract VIOLATED (cells k× fuller → pairing
  * k²×), which is what the plan-embedded distinct-per-cell guard exists
  * to refuse.
  */
object ScaleBench {

  import Fmt.r1

  val blowDefault = 4
  val CopyOffset = 10000000L

  /** Write the deterministic blown-up corpus (documents + embeddings) for
    * `sfDir` at factor `blow` and return its dir. Shared by this main and
    * OctaveBench's NSW section (r17 verdict #5) — see the object scaladoc
    * for why the blowup is a Caesar rotation + dimension roll, never
    * replication.
    */
  def writeBlownCorpus(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, blow: Int): String = {
    val dir2 = s"/tmp/graft_blowup_${blow}x"
    val az = "abcdefghijklmnopqrstuvwxyz"
    val AZ = az.toUpperCase(java.util.Locale.ROOT)
    def rot(s: String, j: Int) = s.drop(j % 26) + s.take(j % 26)
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    (0 until blow).map { j =>
      docs.select((col("doc_id") + j * CopyOffset).as("doc_id"),
        translate(col("text"), az + AZ, rot(az, j) + rot(AZ, j)).as("text"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    (0 until blow).map { j =>
      if (j == 0) emb
      else emb.selectExpr(s"vec_id + ${j * CopyOffset} AS vec_id",
        s"concat(slice(embedding, ${j + 1}, size(embedding) - $j), " +
          s"slice(embedding, 1, $j)) AS embedding")
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    dir2
  }

  /** r18 verdict #2 — the NSW POSITIVE-CONTROL corpus: `nVecs` planted-
    * cluster vectors (dim [[graft.queries.Embeddings.Dims]]-compatible),
    * written as `embeddings.parquet` (vec_id, embedding FLOAT[], label)
    * and returned as a dir the NSW build/recall rows can point at.
    *
    * Geometry (every coordinate a pure hash of (id, dim) — seeded,
    * oracle-replayable, no RNG state):
    *  - `nClusters` centers with i.i.d. hashed-uniform coordinates in
    *    [-1, 1] — pairwise near-orthogonal at 64 dims, so clusters are
    *    WELL-SEPARATED in cosine;
    *  - members (1 − bridgeFrac of the corpus, cluster = id %
    *    nClusters) are center + `noise`·U[-1,1] per coordinate — with
    *    noise 0.3 the in-cluster cosine sits ≈ 0.9 vs ≈ |N(0, d^-1/2)|
    *    across clusters, so every true top-k neighbor is in-cluster and
    *    neighbor-of-neighbor candidates are informative (the cluster
    *    locality NN-descent exploits — the property the r18 octave
    *    disclosed the near-iid roll LACKS);
    *  - a `bridgeFrac` fraction (ids ≥ NumQueries only, so queries stay
    *    cluster members) interpolate t·cA + (1−t)·cB between a hashed
    *    cluster pair — the continuum density real embedding corpora
    *    carry between superclusters, and what keeps the kNN graph
    *    ROUTABLE (isolated Gaussian islands would disconnect any pure
    *    kNN graph — a routing property, not a build property; the
    *    bridge knob lets the harness separate the two attributions).
    *    Bridge labels are -1.
    */
  def writeClusteredCorpus(spark: org.apache.spark.sql.SparkSession,
      nVecs: Long, nClusters: Int, dim: Int, noise: Double,
      bridgeFrac: Double): String = {
    val dir = s"/tmp/graft_clustered_${nVecs}_${nClusters}"
    val T = graft.text.TextOps
    val P2 = s"(CAST(${T.P} AS DOUBLE) * CAST(${T.P} AS DOUBLE))"
    // hashed uniform in [0,1): kmvMix lives in [0, P²); inputs are
    // modded into [0, P) first (the kmvMix overflow contract).
    def unif(h: String): String =
      s"(${T.spark.kmvMix(s"(($h) % ${T.P})")} / $P2)"
    def unifPm1(h: String): String = s"(2.0 * ${unif(h)} - 1.0)"
    def center(cl: String, d: String): String =
      unifPm1(s"(($cl) * 131 + ($d)) * 7 + 1")
    val nq = graft.queries.Embeddings.NumQueries
    val a = s"CAST(id % $nClusters AS BIGINT)"
    val b = s"CAST((id % $nClusters + 1 + " +
      s"CAST(${unif("id * 53 + 11")} * ${nClusters - 1} AS BIGINT)) " +
      s"% $nClusters AS BIGINT)"
    val t = unif("id * 97 + 5")
    val isBridge = s"(id >= $nq AND ${unif("id * 41 + 9")} < $bridgeFrac)"
    val memberExpr = s"${center(a, "d")} + $noise * " +
      unifPm1("id * 67 + (d) * 13 + 3")
    val bridgeExpr = s"$t * ${center(a, "d")} + " +
      s"(1.0 - $t) * ${center(b, "d")} + ${0.2 * noise} * " +
      unifPm1("id * 67 + (d) * 13 + 3")
    spark.range(nVecs).selectExpr(
      "id AS vec_id",
      s"transform(sequence(1, $dim), d -> CAST(CASE WHEN $isBridge " +
        s"THEN $bridgeExpr ELSE $memberExpr END AS FLOAT)) AS embedding",
      s"CAST(CASE WHEN $isBridge THEN -1 ELSE id % $nClusters END AS INT)" +
        " AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val blow = sys.env.getOrElse("GRAFT_BLOWUP", blowDefault.toString).toInt
    val spark = graft.LocalSession.create()
    val sc = spark.sparkContext

    val dir2 = writeBlownCorpus(spark, sfDir, blow)

    val Q = graft.SparkEntry.queries
    def timed(body: => Long): (Long, Double) = {
      val before = sc.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      val now = sc.getPersistentRDDs
      (now.keySet -- before -- graft.operators.SessionPins.pinned(sc))
        .foreach(id => now.get(id).foreach(_.unpersist(false)))
      (n, dt)
    }

    /** Band-collision candidate volume Σ_g C(|g|, 2) over a melted
      * `(doc_id, band columns...)` signature frame — the work the verify
      * stage is confined to.
      */
    def bandVolume(sig: DataFrame): Long = {
      // band-PAIR key volume — exactly the candidate exchange the media
      // near-dup join now shuffles (see queries.Media.BandPairs: the
      // single-band 2^-16 random-collision term measured 14.9x under a
      // 4x blowup; the 32-bit pair key is what retired it)
      val pairs = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
      val lng = pairs.zipWithIndex.map { case ((i, j), pi) =>
        sig.select(lit(pi).as("pi"), col(s"b$i").cast("long").as("bu"),
          col(s"b$j").cast("long").as("bv"))
      }.reduce(_ unionAll _)
      lng.groupBy(col("pi"), col("bu"), col("bv"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)))
        .collect()(0).getLong(0)
    }

    def measure(dir: String, kCells: Int): Map[String, (Long, Double)] = {
      // untimed warmup: page cache + parquet decode for both tables
      graft.Tables(spark, dir, "documents").count()
      graft.Tables(spark, dir, "embeddings").count()
      val out = scala.collection.mutable.LinkedHashMap[String, (Long, Double)]()
      out("d_lsh_pairs") = timed(Q("d_lsh_pairs")(spark, dir).count())
      out("d_passage_dedup") = timed(Q("d_passage_dedup")(spark, dir).count())
      out("m_media_neardup") = timed(Q("m_media_neardup")(spark, dir).count())
      out("e_semdedup") = timed(
        graft.queries.Embeddings.semDedupAtK(spark, dir, kCells).count())
      // the r17 NN-descent NSW graph build: per-round candidate work is
      // |V|*(2M)^2 by construction (neighbors-of-neighbors equi-joins,
      // M fixed), so build time must scale ~linearly in |V|
      out("nsw_graph_build") = timed(
        graft.queries.Embeddings.nswGraphBuild(spark, dir).count())
      out.toMap
    }

    def volumes(dir: String, kCells: Int): Map[String, Long] = Map(
      "lsh_band_pairs" -> bandVolume(Q("d_minhash")(spark, dir)),
      "media_band_pairs" -> bandVolume(Q("m_media_phash")(spark, dir)),
      "passages" -> Q("d_passage_dedup")(spark, dir)
        .agg(coalesce(sum(col("n_pass")), lit(0L))).collect()(0).getLong(0),
      "semdedup_cell_pairs" -> graft.queries.Embeddings
        .semDedupAtK(spark, dir, kCells)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)))
        .collect()(0).getLong(0))

    val kBase = graft.queries.Embeddings.KmK
    // untimed JIT/codegen warm pass over all four bodies — without it the
    // base pass absorbs kernel JIT and the ratios read flattering
    measure(sfDir, kBase)
    val base = measure(sfDir, kBase)
    val blown = measure(dir2, kBase * blow)
    val vBase = volumes(sfDir, kBase)
    val vBlown = volumes(dir2, kBase * blow)

    val names = Seq("d_lsh_pairs", "d_passage_dedup", "m_media_neardup",
      "e_semdedup", "nsw_graph_build")
    val perRow = names.map { n =>
      val (cb, tb) = base(n)
      val (ck, tk) = blown(n)
      s""""$n":{"base_sec":${r1(tb)},"blow_sec":${r1(tk)},""" +
        s""""t_ratio":${r1(if (tb > 0) tk / tb else 0.0)},""" +
        s""""base_rows":$cb,"blow_rows":$ck}"""
    }.mkString(",")
    val vols = vBase.keys.toSeq.sorted.map { k =>
      val (a, b) = (vBase(k), vBlown(k))
      s""""$k":{"base":$a,"blow":$b,""" +
        s""""ratio":${r1(if (a > 0) b.toDouble / a else 0.0)}}"""
    }.mkString(",")
    println(s"""{"metric":"scale_ops","sf":"$sfDir","blowup":$blow""" +
      s""","semdedup_k_base":$kBase,"semdedup_k_blow":${kBase * blow}""" +
      s""","rows":{$perRow},"volumes":{$vols}}""")
    spark.stop()
  }
}
