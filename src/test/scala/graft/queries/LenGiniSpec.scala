package graft.queries

import graft.{SparkSpec, Tables}

class LenGiniSpec extends SparkSpec {

  test("d_len_gini matches the brute-force rank-formula Gini and its " +
      "integer moments") {
    val r = Text.queries("d_len_gini")(spark, sfDir).collect()(0)

    val lens = Tables(spark, sfDir, "documents")
      .select("n_chars", "doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(identity) // (n_chars, doc_id) — the query's total order
    val n = lens.length.toLong
    val sX = lens.map(_._1).sum
    val sIx = lens.zipWithIndex.map { case ((x, _), i) => (i + 1) * x }.sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n, sX, sIx)))

    val want = (2 * sIx - (n + 1) * sX).toDouble / (n * sX).toDouble
    assert(r.getDouble(3) == want) // exact integer operands → same double
    // Gini of positive values: [0, 1); the synthetic corpus has genuine
    // length spread, so strictly > 0
    assert(want > 0.0 && want < 1.0)
  }
}
