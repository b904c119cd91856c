package graft.graph

import java.util.Arrays

/** Immutable CSR adjacency snapshot with a dense id mapping.
  *
  * Spark analogue of the reference's in-heap "HeavyGraph" (dual id space,
  * SURVEY §1.1 D2/D3: Neo4j node id ↔ dense matrix id via
  * `toMappedNodeId`/`toOriginalNodeId`, e.g. `Forward_Push.java:69,121-122`).
  * `ids` is sorted, so dense id = binary search; neighbor lists are sorted
  * by target for determinism.
  *
  * Built on the driver, shipped to executors via `sparkContext.broadcast`.
  * Size: 4 bytes/edge + 12 bytes/node — a 100M-edge graph is ~400 MB,
  * comfortably broadcastable; larger graphs use the DataFrame superstep
  * kernels instead.
  */
final class Csr(
    val ids: Array[Long],      // sorted original node ids, index = dense id
    val offsets: Array[Int],   // length n+1
    val targets: Array[Int]    // dense target ids, sorted within each range
) extends Serializable {

  def numNodes: Int = ids.length
  def numEdges: Int = targets.length

  /** Dense id for an original id, -1 if absent. */
  def denseOf(id: Long): Int = {
    val i = Arrays.binarySearch(ids, id)
    if (i >= 0) i else -1
  }

  def originalOf(dense: Int): Long = ids(dense)

  def outDegree(dense: Int): Int = offsets(dense + 1) - offsets(dense)

  /** k-th out-neighbor (dense), 0 <= k < outDegree. O(1) — the property the
    * reference's jagged arrays exist for (`Monte_Carlo.java:85`).
    */
  def neighbor(dense: Int, k: Int): Int = targets(offsets(dense) + k)

  /** Iterate neighbors of `dense` through `f`. */
  @inline def foreachNeighbor(dense: Int)(f: Int => Unit): Unit = {
    var p = offsets(dense)
    val end = offsets(dense + 1)
    while (p < end) { f(targets(p)); p += 1 }
  }
}

object Csr {
  def fromEdges(pairs: Array[(Long, Long)]): Csr = {
    val idSet = new java.util.TreeSet[java.lang.Long]()
    pairs.foreach { case (s, d) => idSet.add(s); idSet.add(d) }
    val ids = new Array[Long](idSet.size)
    var i = 0
    val it = idSet.iterator()
    while (it.hasNext) { ids(i) = it.next(); i += 1 }

    val n = ids.length
    val deg = new Array[Int](n)
    pairs.foreach { case (s, _) => deg(Arrays.binarySearch(ids, s)) += 1 }
    val offsets = new Array[Int](n + 1)
    i = 0
    while (i < n) { offsets(i + 1) = offsets(i) + deg(i); i += 1 }

    val targets = new Array[Int](pairs.length)
    val cursor = offsets.clone()
    pairs.foreach { case (s, d) =>
      val sd = Arrays.binarySearch(ids, s)
      targets(cursor(sd)) = Arrays.binarySearch(ids, d).toInt
      cursor(sd) += 1
    }
    // sort each adjacency range for deterministic kernels
    i = 0
    while (i < n) { Arrays.sort(targets, offsets(i), offsets(i + 1)); i += 1 }
    new Csr(ids, offsets, targets)
  }
}
