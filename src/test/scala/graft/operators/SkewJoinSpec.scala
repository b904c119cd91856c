package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join is row-identical to the plain join and spreads the hot key") {
    val s = spark
    import s.implicits._
    // 20k rows, 90% on one hot key — the straggler shape.
    val left = s.range(20000)
      .select(col("id"),
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 100).as("k"))
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = left.join(right, Seq("k"))
      .select(col("k"), col("id"), col("name"))
    val salted = SkewJoin.saltedInner(left, right, "k", salts = 8)
      .select(col("k"), col("id"), col("name"))

    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(a == b, "salting must not change the join's row multiset")

    // straggler spread: the hot key's rows land in >1 shuffle partition
    // of the salted plan (pre-output-projection), vs exactly 1 when the
    // join key alone is the partition key.
    val hotPartitions = SkewJoin.saltedInner(left, right, "k", salts = 8)
      .where(col("k") === 7L)
      .rdd.mapPartitions(it => Iterator.single(it.size)).collect()
      .count(_ > 0)
    assert(hotPartitions > 1, s"hot key must spread, got $hotPartitions partition(s)")
  }

  test("salt assignment is deterministic across evaluations") {
    val s = spark
    import s.implicits._
    val left = s.range(1000).select(col("id"), (col("id") % 5).as("k"))
    val right = (0L until 5L).map(k => (k, k * 10)).toDF("k", "v")
    val r1 = SkewJoin.saltedInner(left, right, "k", 4).collect().length
    val r2 = SkewJoin.saltedInner(left, right, "k", 4).collect().length
    assert(r1 == 1000 && r2 == 1000, "every left row joins exactly once")
  }
}
