package graft.harness

import graft.graph.Csr

/** H2 — random query-node sampling (reference `Gen_Util.java:99-107`:
  * `query_num` draws WITH replacement, uniform over the dense node-id
  * space).
  *
  * The reference uses an unseeded `ThreadLocalRandom` — every benchmark
  * run measures a different sample. Here the sample is SEEDED
  * (`java.util.Random`'s LCG is specified bit-for-bit across JVMs), which
  * makes every harness run, its golden log, and the DuckDB oracle of the
  * grid queries replayable — the one deliberate deviation from the
  * reference sampler (SURVEY §2.10 H2).
  */
object QuerySampler {

  /** `num` dense indices in [0, n), with replacement. */
  def denseIndices(n: Int, num: Int, seed: Long): Seq[Int] = {
    val r = new java.util.Random(seed)
    Seq.fill(num)(r.nextInt(n))
  }

  /** Same draw mapped to original node ids through a CSR snapshot. */
  def sourceIds(csr: Csr, num: Int, seed: Long): Seq[Long] =
    denseIndices(csr.numNodes, num, seed).map(csr.originalOf)
}
