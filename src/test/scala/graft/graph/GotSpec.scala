package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** GOT fixture import (S1/S2) + name resolution (P5/J5) invariants. */
class GotSpec extends SparkSpec {

  test("nodes: 107 rows, dense ids 1..n, Arya pinned") {
    val n = Got.nodes(spark).cache()
    assert(n.count() == 107)
    val ids = n.select(min("id"), max("id"), countDistinct("id")).head
    assert(ids.getLong(0) == 1L && ids.getLong(1) == 107L && ids.getLong(2) == 107L)
    val arya = n.where(col("key") === Got.SourceName).select("id").head.getLong(0)
    assert(arya == Got.AryaId, s"AryaId constant drifted: dynamic=$arya")
  }

  test("edges: symmetric, deduplicated, all endpoints resolve") {
    val e = Got.edges(spark).cache()
    val cnt = e.count()
    // 352 undirected relations -> ≤704 directed edges (dupes/reciprocals collapse).
    assert(cnt > 352 && cnt <= 704, s"edge count $cnt")
    // symmetric: reversing the edge set is a no-op.
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    assert(e.except(rev).count() == 0)
    // endpoints are within the node id range.
    val mm = e.agg(min(least(col("src"), col("dst"))),
      max(greatest(col("src"), col("dst")))).head
    assert(mm.getLong(0) >= 1L && mm.getLong(1) <= 107L)
  }

  test("got_ppr_topk: k rows (modulo ties), Arya's neighborhood ranks high") {
    val df = graft.queries.GotQueries.queries("got_ppr_topk")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length >= Got.TopK)
    // the source itself must carry the top score (π(s,s) dominates).
    val top = rows.minBy(_.getInt(2))
    assert(top.getString(0) == Got.SourceName)
  }
}
