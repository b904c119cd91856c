package graft.text

import graft.SparkSpec
import graft.queries.Text

class WinnowSpec extends SparkSpec {

  /** Independent array-level winnow: recompute the gram sequence from
    * tokenHash and apply the textbook right-min sliding rule with an
    * O(m·w) scan, collecting into a SET (the kernel's emit-on-change
    * must equal this set semantics).
    */
  private def bruteWinnow(text: String): Set[(Int, Long)] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val hs = toks.map(TextOps.tokenHash)
    val m = hs.length - TextOps.ShingleW + 1
    if (m < TextOps.WinnowW) return Set.empty
    val kg = (0 until m).map(i => ((hs(i) * TextOps.TokMul + hs(i + 1))
      % TextOps.P * TextOps.TokMul + hs(i + 2)) % TextOps.P)
    (0 to m - TextOps.WinnowW).map { w =>
      val win = (w until w + TextOps.WinnowW)
      val minv = win.map(kg).min
      val pos = win.filter(j => kg(j) == minv).max // rightmost tie
      (pos, kg(pos))
    }.toSet
  }

  test("winnow matches the brute right-min rule on the bench corpus, " +
      "with the coverage guarantee and shingle-set containment") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    var fps = 0
    docs.foreach { case (_, t) =>
      val got = TextOps.winnow(t)
      // no duplicate positions, exact match with the brute set
      assert(got.map(_._1).distinct.length == got.length)
      assert(got.toSet == bruteWinnow(t))
      // every fingerprint hash is one of the document's distinct shingles
      val sh = TextOps.shingles(t).toSet
      got.foreach { case (_, f) => assert(sh.contains(f)) }
      // coverage: every full window of WinnowW gram positions contains a
      // selected position (the guarantee that makes span matching work)
      val m = t.split("\\s+").length - TextOps.ShingleW + 1
      if (m >= TextOps.WinnowW) {
        assert(got.nonEmpty)
        val sel = got.map(_._1).toSet
        (0 to m - TextOps.WinnowW).foreach { w =>
          assert((w until w + TextOps.WinnowW).exists(sel),
            s"window at $w uncovered")
        }
      }
      fps += got.length
    }
    assert(fps > 0)
  }

  test("winnow: short documents emit nothing; a shared token run shares " +
      "a fingerprint between documents") {
    assert(TextOps.winnow("a b").isEmpty, "fewer tokens than a shingle")
    assert(TextOps.winnow("a b c d e").isEmpty, "grams < WinnowW")
    // two docs sharing a WinnowW+ShingleW-1 = 6-token run must share at
    // least one fingerprint HASH (positions may differ)
    val run = "one two three four five six"
    val a = TextOps.winnow(s"alpha beta $run gamma delta epsilon").map(_._2)
    val b = TextOps.winnow(s"zeta eta theta iota $run kappa").map(_._2)
    assert((a.toSet intersect b.toSet).nonEmpty, "coverage guarantee broken")
  }

  test("d_winnow row shape: (doc_id, pos, fp) rows replay the kernel") {
    val rows = Text.queries("d_winnow")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(t => (t._2.toInt, t._3)).toSet ==
        TextOps.winnow(docs(id)).toSet)
    }
  }
}
