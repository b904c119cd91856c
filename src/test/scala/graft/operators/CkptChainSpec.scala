package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CkptChainSpec extends SparkSpec {

  test("chain releases dead generations, keeps the final one usable") {
    import spark.implicits._
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet
    val ckpt = new CkptChain(sc)
    var df = Seq.tabulate(100)(i => (i.toLong, i.toDouble)).toDF("id", "v")
    for (_ <- 1 to 5)
      df = ckpt(df.withColumn("v", col("v") + 1.0))
    // exactly one generation of pinned state remains beyond the baseline.
    val pinned = sc.getPersistentRDDs.keySet -- baseline
    assert(pinned.size <= 2, s"expected <=2 pinned RDDs, found ${pinned.size}")
    // the final generation is fully materialized and correct.
    assert(df.agg(sum("v")).head.getDouble(0) == (0 until 100).map(_ + 5.0).sum)
    ckpt.releaseAll()
    assert((sc.getPersistentRDDs.keySet -- baseline).isEmpty)
  }

  test("joint generations survive cross-derived state (push shape)") {
    import spark.implicits._
    val ckpt = new CkptChain(spark.sparkContext)
    var a = Seq((1L, 1.0)).toDF("id", "x")
    var b = Seq((1L, 0.0)).toDF("id", "y")
    for (_ <- 1 to 4) {
      // b' derives from a (the PREVIOUS generation) — the joint apply must
      // not release it until both snapshots are materialized.
      val a2 = a.withColumn("x", col("x") * 0.5)
      val b2 = b.join(a.select(col("id"), col("x").as("add")), Seq("id"))
        .select(col("id"), (col("y") + col("add")).as("y"))
      val Seq(na, nb) = ckpt(Seq(a2, b2))
      a = na; b = nb
    }
    // y = 1 + 1/2 + 1/4 + 1/8 after 4 rounds (adds PREVIOUS a each round)
    assert(math.abs(b.head.getDouble(1) - 1.875) < 1e-12)
    ckpt.releaseAll()
  }
}
