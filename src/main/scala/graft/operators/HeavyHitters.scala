package graft.operators

import scala.collection.mutable

/** Misra-Gries frequent-items summary over long keys (Misra & Gries 1982;
  * merge analysis in Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Bounded state: at most `k` counters regardless of stream length. After
  * consuming `n` items, every key's counter is a LOWER bound on its true
  * count with undercount at most `n / k`; consequently any key whose true
  * count exceeds `n / k` is guaranteed to survive with a positive counter
  * (the no-false-negative property `ev_heavy_hitters` builds on).
  *
  * This is the per-partition PREFILTER for exact heavy-hitter detection at
  * corpus scale: each task folds its partition into ≤ `k` candidate keys,
  * so only `k × numPartitions` candidate rows ever cross an exchange —
  * the full key universe is never shuffled. A second exact counting pass
  * over the candidate semi-join (plus a pigeonhole guard, see
  * `Events.hhCandidates`) removes the false positives, making the final
  * output exact and independent of partitioning.
  *
  * Decrement-all is amortized O(1) per item: each global decrement of the
  * `k` live counters consumes `k` units paid for by `k` prior inserts.
  */
final class MisraGries(val k: Int) {
  require(k > 0, s"Misra-Gries needs at least one counter, got $k")

  private val counters = mutable.LongMap.empty[Long]
  private var n = 0L

  /** Items consumed so far (the `n` in the `n / k` undercount bound). */
  def processed: Long = n

  def add(key: Long): Unit = {
    n += 1
    // Live counters are always ≥ 1, so -1 is a safe absent sentinel
    // (LongMap.getOrElse is specialized — single probe, no boxing).
    val cur = counters.getOrElse(key, -1L)
    if (cur > 0L) counters.update(key, cur + 1)
    else if (counters.size < k) counters.update(key, 1L)
    else {
      // No free counter: decrement every live counter, dropping zeros.
      // (The incoming item's own implicit counter also hits zero, so it
      // is not inserted — the textbook k-way cancellation step.)
      val dead = mutable.ArrayBuffer.empty[Long]
      counters.foreachEntry { (kk, v) =>
        if (v == 1L) dead += kk else counters.update(kk, v - 1)
      }
      dead.foreach(counters.remove)
    }
  }

  /** Surviving (key, lowerBoundCount) entries, counter ≥ 1, ≤ k of them. */
  def entries: Iterator[(Long, Long)] =
    counters.iterator.map { case (kk, v) => (kk, v) }

  /** Absorb another summary — the mergeable-summaries rule (Agarwal et
    * al. 2012): add counters entry-wise, then if more than k survive,
    * subtract the (k+1)-th largest counter value from every counter and
    * drop the non-positives (the batched form of the one-at-a-time
    * cancellation). The merged summary keeps the MG GUARANTEE over the
    * combined stream (undercount ≤ n_total/(k+1), so any key with share
    * > 1/(k+1) survives) for ANY merge tree; the exact counter values,
    * unlike every other sketch in this codebase, DO depend on merge
    * order — callers must pin properties, not byte-equality, except in
    * the no-cancellation regime (k ≥ distinct keys) where the summary
    * degenerates to exact counting and is order-free.
    */
  def merge(other: MisraGries): Unit = {
    n += other.n
    other.counters.foreachEntry { (kk, v) =>
      counters.update(kk, counters.getOrElse(kk, 0L) + v)
    }
    if (counters.size > k) {
      val vals = counters.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      counters.foreachEntry { (kk, v) =>
        if (v - sub <= 0L) dead += kk else counters.update(kk, v - sub)
      }
      dead.foreach(counters.remove)
    }
  }

  /** Deserialization helpers: raw counter insert + processed-count
    * restore (bypassing `add`'s cancellation bookkeeping).
    */
  private[graft] def put(key: Long, c: Long): Unit = counters.update(key, c)
  private[graft] def setProcessed(total: Long): Unit = n = total
}
