package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class SampleAggSpec extends SparkSpec {

  test("bottom_k_sample == bottom-k of the (h, id, value) multiset across " +
      "partitions, duplicate ids counted per row") {
    SampleFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy duplication on purpose: ids collide (replayed events) and
    // (h, id) pairs repeat with the SAME and with DIFFERENT values, so
    // the multiset semantics and the value-in-the-order-key tie rule
    // both bind.
    val rows = (0 until 6).flatMap { g =>
      (0 until 400).map { _ =>
        (g.toLong, rnd.nextInt(30).toLong, rnd.nextInt(20).toLong,
          (rnd.nextInt(5) * 10).toDouble)
      }
    }
    val k = 7
    val df = rows.toDF("g", "h", "id", "v").repartition(9)
    val got = df.groupBy("g")
      .agg(SampleFunctions.bottomKSample(col("h"), col("id"), col("v"), k)
        .as("vals"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val exp = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(t => (t._2, t._3, t._4)).sorted.take(k)
        .map(_._3).sorted.toList
    }
    assert(got == exp)
    // every group saw 400 rows but shipped exactly k values
    got.values.foreach(vs => assert(vs.length == k))
  }

  test("-0.0 normalizes to 0.0 in the buffer: a zero-signed boundary row " +
      "cannot select a different survivor than Spark SQL's sort") {
    // Spark's sort (SQLOrderingUtil) treats -0.0 == 0.0; the buffer's
    // Scala Ordering would sort -0.0 FIRST. Without normalization the
    // second add below would evict the first (distinct key, lt = true);
    // with it the key is identical and the full buffer drops the row.
    val b = new SampleBuffer(1)
    b.add(1L, 1L, 0.0)
    b.add(1L, 1L, -0.0)
    assert(b.map.size == 1)
    assert(b.map.head._2 == 1L)
    assert(java.lang.Double.doubleToRawLongBits(b.map.head._1._3) == 0L)
    // and -0.0 arriving FIRST still surfaces as +0.0 bits
    val c = new SampleBuffer(1)
    c.add(1L, 1L, -0.0)
    assert(java.lang.Double.doubleToRawLongBits(c.map.head._1._3) == 0L)
  }

  test("duplicate-id rows each count, exactly like the batch rs <= k cut") {
    SampleFunctions.register(spark)
    import spark.implicits._
    // two rows share (h, id, v): the sample must keep BOTH (a dedup
    // buffer would surface a phantom third-smallest row instead)
    val df = Seq(
      (5L, 1L, 7.0), (5L, 1L, 7.0), (9L, 2L, 1.0)
    ).toDF("h", "id", "v").repartition(2)
    val got = df
      .agg(SampleFunctions.bottomKSample(col("h"), col("id"), col("v"), 2)
        .as("vals"))
      .collect()(0).getSeq[Double](0).toList
    assert(got == List(7.0, 7.0))
  }
}
