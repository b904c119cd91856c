package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Eager `localCheckpoint` chain for iterative superstep state.
  *
  * Every eager localCheckpoint pins its RDD in the block manager for the
  * life of the session. In a superstep loop the generation-(N-1) snapshot
  * is dead the moment generation N materializes, so the chain releases it
  * then — otherwise a 100-iteration run leaves 100 state snapshots pinned
  * (the regression a long-lived 1000-executor session cannot afford). The
  * FINAL generation stays pinned: it backs the returned DataFrame; callers
  * that also want that gone reap at the session level (see
  * [[graft.Bench]]).
  *
  * One chain per state variable — generations of different variables don't
  * invalidate each other.
  *
  * `resetStats = true` additionally DROPS the optimizer statistics at
  * each generation (re-wrapping the materialized rows through
  * `createDataFrame`, which plans as a fresh leaf with default
  * sizeInBytes). This matters whenever a superstep JOINS THE STATE WITH
  * ITSELF: `localCheckpoint` carries the origin plan's `sizeInBytes`
  * into the checkpointed leaf, join stats MULTIPLY child sizes, so a
  * step that references the state d times grows the carried BigInt
  * d-fold in DIGIT COUNT per generation — doubly exponential. Measured:
  * the Scc containStep (state referenced 3×) reaches million-digit
  * sizeInBytes within ~15 generations, after which JoinSelection's
  * `canBroadcastBySize` disappears into BigInteger multiplication for
  * hours (the round-15 octave wedge; CkptChainSpec pins the bounded
  * growth under the flag). The cost is one InternalRow↔Row conversion
  * layer per downstream scan — negligible for node-sized state frames,
  * which is why the flag is opt-in rather than default (edge-list
  * checkpoints that are scanned dozens of times per round, and whose
  * stats grow only linearly, keep the conversion-free path).
  */
final class CkptChain(sc: SparkContext, resetStats: Boolean = false) {
  private var live = Set.empty[Int]

  /** Eagerly checkpoint `df`, releasing this chain's previous generation. */
  def apply(df: DataFrame): DataFrame = apply(Seq(df)).head

  /** Joint generation for loops with SEVERAL state variables that derive
    * from each other's previous generation (e.g. push's residue+reserve):
    * ALL of them are materialized first, and only then is the previous
    * generation released — releasing after each one individually would
    * pull a snapshot out from under the sibling still being computed.
    */
  def apply(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    val before = sc.getPersistentRDDs.keySet
    val out = dfs.map { df =>
      val ck = df.localCheckpoint(true)
      if (resetStats) ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
      else ck
    }
    val dead = live
    live = (sc.getPersistentRDDs.keySet -- before).toSet
    dead.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    out
  }

  /** RDD ids backing the current (final) generation — for callers that
    * hand the final snapshot to a session-scoped cache and must register
    * it with [[SessionPins]].
    */
  def liveIds: Set[Int] = live

  /** Release the current (final) generation too — only after the caller
    * has fully materialized everything derived from it.
    */
  def releaseAll(): Unit = {
    live.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    live = Set.empty
  }
}
