package graft.queries

import graft.SparkSpec
import graft.text.TextOps

/** `d_pmi_bigrams` / `d_lexical_stats` / `d_domain_jsd` — brute-force
  * replays of the collocation ranking, the corpus lexical profile, and
  * the pairwise hashed-bucket Jensen-Shannon matrix.
  */
class TextStatsSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Array[(String, String)] =
    graft.Tables(spark, sfDir, "documents")
      .selectExpr("source", "lower(text)").collect()
      .map(r => (r.getString(0), r.getString(1)))

  test("d_pmi_bigrams matches brute force and the cut is TakeOrdered") {
    val df = Text.queries("d_pmi_bigrams")(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

    val bigs = docs.flatMap { case (_, t) =>
      val toks = t.split("\\s+", -1)
      if (toks.length < 2) Array.empty[(String, String)]
      else Array.tabulate(toks.length - 1)(i => (toks(i), toks(i + 1)))
    }
    val c12 = bigs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val c2 = c12.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val b = c12.values.sum.toDouble
    val want = c12.toSeq.collect {
      case ((w1, w2), c) if c >= Text.PmiMinCount =>
        val pmi = round6(math.log(
          (c.toDouble * b) / (c1(w1).toDouble * c2(w2).toDouble)))
        (w1, w2, c, c1(w1), c2(w2), pmi)
    }.sortBy { case (w1, w2, _, _, _, pmi) => (-pmi, w1, w2) }
      .take(Text.PmiTopN)
    assert(want.nonEmpty && got == want)
    // a pair occurring exactly at independence has pmi 0; all reported
    // pairs must be meaningful counts
    got.foreach { case (_, _, c, cw1, cw2, _) =>
      assert(c >= Text.PmiMinCount && cw1 >= c && cw2 >= c)
    }
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("d_lexical_stats matches brute force (one exact row)") {
    val got = Text.queries("d_lexical_stats")(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got(0)

    val tf = docs.flatMap(_._2.split("\\s+", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTokens = tf.values.sum
    val vocab = tf.size.toLong
    val hapax = tf.values.count(_ == 1L).toLong
    val dis = tf.values.count(_ == 2L).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nTokens, vocab, hapax, dis)))
    assert(r.getDouble(4) == round6(vocab.toDouble / nTokens))
    assert(r.getDouble(5) == round6(hapax.toDouble / vocab))
  }

  test("d_domain_jsd matches the sorted-fold brute force; JSD bounded " +
      "in [0, 1] bits and every source pair reported once") {
    val got = Text.queries("d_domain_jsd")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap

    val B = Text.JsdBuckets
    // per-source bucket counts over ALL tokens (empties hash to 0 —
    // same on both engines)
    val cnt = docs.flatMap { case (src, t) =>
      t.split("\\s+", -1).map(tok => (src, TextOps.tokenHash(tok) % B))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = cnt.groupBy(_._1._1).view.mapValues(_.map {
      case ((_, bkt), c) => bkt -> c
    }.toMap).toMap
    val n = bySrc.view.mapValues(_.values.sum).toMap
    def entropy(p: Seq[(Long, Double)]): Double =
      p.sortBy(_._1).foldLeft(0.0) { case (a, (_, v)) => a - v * math.log(v) }
    val pDist = bySrc.map { case (s0, m) =>
      s0 -> m.map { case (bkt, c) => bkt -> c.toDouble / n(s0) }
    }
    val h = pDist.view.mapValues(m => entropy(m.toSeq)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val ln2 = math.log(2.0)
    val want = (for {
      a <- srcs; bb <- srcs; if a < bb
    } yield {
      val (pa, pb) = (pDist(a), pDist(bb))
      val m = (pa.keySet ++ pb.keySet).toSeq.map { k =>
        k -> (pa.getOrElse(k, 0.0) / 2 + pb.getOrElse(k, 0.0) / 2)
      }
      val hm = entropy(m)
      (a, bb) -> ((n(a), n(bb)), round6(h(a) / ln2), round6(h(bb) / ln2),
        round6((hm - (h(a) + h(bb)) / 2.0) / ln2))
    }).toMap
    assert(got.keySet == want.keySet &&
      got.size == srcs.size * (srcs.size - 1) / 2)
    got.foreach { case (k, (na, nb, ha, hb, jsd)) =>
      val ((wna, wnb), wha, whb, wjsd) = want(k)
      assert((na, nb) == ((wna, wnb)), s"totals for $k")
      assert(ha == wha && hb == whb, s"entropies for $k")
      assert(jsd == wjsd, s"jsd for $k")
      // JSD is bounded by 1 bit; tiny negative rounding slack only
      assert(jsd >= -1e-6 && jsd <= 1.0 + 1e-6, s"bound for $k")
      assert(ha >= 0.0 && hb >= 0.0 &&
        ha <= math.log(B.toDouble) / ln2 + 1e-9)
    }
  }
}
