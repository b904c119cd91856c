package graft.queries

import graft.SparkSpec

/** `e_pca_power` / `e_silhouette` — the PCA power iteration replayed
  * exactly from the collected Gram, and the silhouette checked against
  * the shared k-means fit.
  */
class PcaSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("e_pca_power equals the exact driver replay of the iteration, " +
      "lambda is the dominant Rayleigh quotient, projections separate") {
    val d = Embeddings.Dims
    val tri = Embeddings.qgramRows(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val G = Array.ofDim[Double](d, d)
    tri.foreach { case (i, j, g) => G(i)(j) = g.toDouble; G(j)(i) = g.toDouble }

    // the exact fold order of pcaPower: 0-seeded, ascending index
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    def matvec(x: Array[Double]): Array[Double] = Array.tabulate(d) { i =>
      var acc = 0.0; var j = 0
      while (j < d) { acc += G(i)(j) * x(j); j += 1 }; acc
    }
    for (_ <- 1 to Embeddings.PcaIters) {
      val t = matvec(v)
      var n2 = 0.0; var i = 0
      while (i < d) { n2 += t(i) * t(i); i += 1 }
      val nrm = math.sqrt(n2)
      v = t.map(_ / nrm)
    }
    val tf = matvec(v)
    var lam = 0.0
    var i = 0
    while (i < d) { lam += v(i) * tf(i); i += 1 }

    // residual: the direction is genuinely dominant-converged
    val res = math.sqrt(tf.zip(v).map { case (t, x) =>
      val r = t - lam * x; r * r
    }.sum) / lam
    assert(lam > 0.0 && res < 0.05, s"residual $res")

    val got = Embeddings.queries("e_pca_power")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 == round6(lam)), "eigval drifted from replay")

    // recompute projections from quantized codes — exact equality
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    got.foreach { case (id, pc1, _) =>
      val vr = emb(id)
      val lo = vr.min; val hi = vr.max
      val q =
        if (hi == lo) Array.fill(d)(0.0)
        else vr.map(x => BigDecimal((x - lo) / ((hi - lo) / 255.0))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt.toDouble)
      var dot = 0.0; var k = 0
      while (k < d) { dot += q(k) * v(k); k += 1 }
      assert(pc1 == round6(dot), s"projection for $id")
    }
    // PC1 genuinely separates the collection
    val scores = got.map(_._2)
    assert(scores.max > scores.min)
  }

  test("e_silhouette agrees with the kmeans fit and is a valid " +
      "simplified silhouette (own = argmin, sil in [0, 1])") {
    val fit = Embeddings.kmFit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val got = Embeddings.queries("e_silhouette")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == fit.size)
    got.foreach { case (id, cell, dOwn, dOth, sil) =>
      val (fCell, fD2) = fit(id)
      assert(cell == fCell, s"cell drifted from e_kmeans for $id")
      assert(dOwn == round6(math.sqrt(math.max(fD2, 0.0))),
        s"d_own for $id")
      // own centroid is the argmin, so the runner-up is never closer
      assert(dOth >= dOwn, s"ordering for $id")
      assert(sil >= 0.0 && sil <= 1.0, s"range for $id")
    }
    // the fit is non-degenerate: scores spread and are positive on
    // average (a = b everywhere would mean no cluster structure at all)
    val sils = got.map(_._5)
    assert(sils.max > sils.min && sils.sum / sils.length > 0.0)
  }
}
