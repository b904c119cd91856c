package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: the mitigation to reach for when AQE's
  * runtime skew splitting isn't available (non-AQE paths, or a build side
  * that is replicable but not broadcastable).
  *
  * A heavy-hitter join key sends all its rows to ONE reducer — the
  * classic straggler at 100 TB. [[saltedInner]] spreads each key over
  * `salts` reducers: the probe (left) side gains a DETERMINISTIC salt in
  * `[0, salts)` hashed from the whole row (content-keyed — no
  * `monotonically_increasing_id`, whose value depends on partitioning and
  * would make retried tasks nondeterministic), the build (right) side is
  * replicated once per salt value, and the join key becomes
  * `(key, salt)`. Row multiset of the output is IDENTICAL to
  * `left.join(right, key)` — every left row still meets every matching
  * right row exactly once, in exactly one salt bucket.
  *
  * Cost model: build-side shuffle volume × `salts`; probe side unchanged.
  * Worth it when the hot key's row count ≫ rows/reducer; wrong when the
  * build side is huge (then pre-partition both sides instead) or tiny
  * (then just broadcast).
  */
object SkewJoin {

  val SaltCol = "__graft_salt"

  /** Inner equi-join on `key` with `salts`-way salt spreading. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val leftCols: Seq[Column] = left.columns.toSeq.map(col)
    val l = left.withColumn(SaltCol,
      pmod(xxhash64(leftCols: _*), lit(salts.toLong)))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(key, SaltCol)).drop(SaltCol)
  }
}
