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
  *
  * LIFECYCLE (the round-14 advice): pins are not immortal —
  * [[unpin]] releases a model's blocks when its cache entry is
  * invalidated (see `Embeddings.invalidateModels`, the re-ingest path:
  * a source dir rewritten mid-session must refit, not serve the stale
  * codebook), and the first pin for a context registers a listener that
  * [[drop]]s the context's entries on application end, so stopped
  * sessions do not leak map references.
  */
object SessionPins {
  private val pins =
    scala.collection.concurrent.TrieMap.empty[(SparkContext, Int), Unit]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkContext, Unit]

  def pin(sc: SparkContext, ids: Iterable[Int]): Unit = {
    hooked.getOrElseUpdate(sc, {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          drop(sc)
      })
    })
    ids.foreach(id => pins.put((sc, id), ()))
  }

  /** Ids pinned for `sc` — the set a session-hygiene reap must spare. */
  def pinned(sc: SparkContext): Set[Int] =
    pins.keysIterator.collect { case (c, id) if c eq sc => id }.toSet

  /** Forget AND unpersist `ids` — the model-cache invalidation path. */
  def unpin(sc: SparkContext, ids: Iterable[Int]): Unit =
    ids.foreach { id =>
      pins.remove((sc, id))
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))
    }

  /** Forget every pin for `sc` (its blocks die with the context). */
  def drop(sc: SparkContext): Unit = {
    pins.keysIterator.filter(_._1 eq sc).foreach(pins.remove)
    hooked.remove(sc)
  }
}
