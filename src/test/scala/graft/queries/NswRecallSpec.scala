package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The NSW beam sweep (`e_nsw_recall`): ef = 1 must reproduce the greedy
  * `e_nsw_search` walk exactly (same exploration, same best-so-far), the
  * beam invariants must hold at every axis point, and the recall row
  * must be internally consistent with the exact ground truth.
  */
class NswRecallSpec extends SparkSpec {

  test("ef=1 beam IS the greedy walk: final beam equals (found_id, cos) " +
      "per query") {
    val (knn, q, nbr, s0) = Embeddings.nswShared(spark, sfDir)
    val (beam, visited) = Embeddings.nswBeam(knn, q, nbr, s0, 1)
    val got = beam.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val greedy = Embeddings.queries("e_nsw_search")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("found_id"), r.getAs[Double]("cos"))).toMap
    assert(got == greedy,
      "ef=1 keeps the best node seen so far and expands it — exactly " +
        "the greedy stay-on-no-improvement schedule")
    // the ef=1 visited pool contains every greedy stop (entry included)
    val vis = visited.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    greedy.foreach { case (qid, (f, _)) => assert(vis.contains((qid, f))) }
  }

  test("beam invariants: ≤ ef rows per query, beam ⊆ visited, and the " +
      "beam head is the visited maximum") {
    val (knn, q, nbr, s0) = Embeddings.nswShared(spark, sfDir)
    for (ef <- Embeddings.NswEfAxis) {
      val (beam, visited) = Embeddings.nswBeam(knn, q, nbr, s0, ef)
      val byQ = beam.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1)
      byQ.foreach { case (qid, rows) =>
        assert(rows.length <= ef, s"q$qid: beam exceeds ef=$ef")
        assert(rows.map(_._2).distinct.length == rows.length)
      }
      val vis = visited.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val visSet = vis.toSet
      byQ.values.flatten.foreach(t => assert(visSet.contains(t),
        "every beam row was scored, so it must be in the visited pool"))
      // the beam's best equals the visited pool's best (cos desc, node)
      val bestVis = vis.groupBy(_._1).map { case (qid, rows) =>
        qid -> rows.maxBy(t => (t._3, -t._2))._3
      }
      byQ.foreach { case (qid, rows) =>
        assert(rows.maxBy(t => (t._3, -t._2))._3 == bestVis(qid),
          s"q$qid: beam head must carry the best cosine ever seen")
      }
    }
  }

  test("e_nsw_recall row shape and consistency: one row per ef, exact " +
      "integer hits, recall = n_hit / n_exact") {
    val rows = Embeddings.queries("e_nsw_recall")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Embeddings.NswEfAxis)
    rows.foreach { r =>
      val (nEx, nHit) = (r.getLong(1), r.getLong(2))
      assert(nHit >= 0 && nHit <= nEx)
      assert(r.getDouble(3) ==
        graft.text.TextOps.round6(nHit.toDouble / nEx))
      assert(r.getLong(4) > 0, "n_visited discloses the cost axis")
    }
  }
}
