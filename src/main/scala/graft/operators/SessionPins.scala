package graft.operators

import org.apache.spark.SparkContext

/** Registry of checkpointed RDD ids that must SURVIVE the per-row
  * session-hygiene reap in [[graft.Bench]] / [[graft.Verify]].
  *
  * Those harnesses unpersist everything a query pinned once its row
  * completes — correct for per-row lineage truncation, but fatal for
  * session-scoped MODEL caches (the fitted-once PQ codebooks, the CSR
  * snapshot discipline's DataFrame analog): the second consumer row
  * would read released checkpoint blocks
  * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). A model cache registers its
  * backing RDD ids here; the reap subtracts them. Bounded by
  * construction: one model per (session, source dir), a few small
  * tables each — the 1000-executor analog is an index/model snapshot
  * pinned for the serving session's lifetime.
  */
object SessionPins {
  private val pins =
    scala.collection.concurrent.TrieMap.empty[(SparkContext, Int), Unit]

  def pin(sc: SparkContext, ids: Iterable[Int]): Unit =
    ids.foreach(id => pins.put((sc, id), ()))

  /** Ids pinned for `sc` — the set a session-hygiene reap must spare. */
  def pinned(sc: SparkContext): Set[Int] =
    pins.keysIterator.collect { case (c, id) if c eq sc => id }.toSet
}
