package graft.operators

import graft.SparkSpec
import graft.queries.Events

class HeavyHittersSpec extends SparkSpec {

  private def exactCounts(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("Misra-Gries counters are lower bounds with undercount ≤ n/k") {
    val rnd = new scala.util.Random(42)
    // Zipf-ish stream: key j drawn with weight ~ 1/(j+1).
    val stream = Seq.fill(20000)(
      math.min(rnd.nextInt(1 << rnd.nextInt(10)), 99).toLong)
    val exact = exactCounts(stream)
    for (k <- Seq(8, 32, 128)) {
      val mg = new MisraGries(k)
      stream.foreach(mg.add)
      assert(mg.processed == stream.length)
      val est = mg.entries.toMap
      assert(est.size <= k, s"k=$k kept ${est.size} counters")
      est.foreach { case (key, lb) =>
        val tru = exact.getOrElse(key, 0L)
        assert(lb <= tru, s"k=$k key=$key counter $lb above true $tru")
        assert(tru - lb <= stream.length.toLong / k,
          s"k=$k key=$key undercount ${tru - lb} > n/k")
      }
      // no false negatives above the n/k frequency bar
      exact.foreach { case (key, tru) =>
        if (tru > stream.length.toLong / k)
          assert(est.contains(key), s"k=$k lost frequent key $key ($tru)")
      }
    }
  }

  test("bounded state survives an all-distinct stream") {
    val mg = new MisraGries(4)
    (0L until 10000L).foreach(mg.add)
    assert(mg.entries.size <= 4)
    assert(mg.processed == 10000L)
  }

  test("ev_heavy_hitters equals brute force; MG prefilter guard holds " +
      "and candidates cover every true hitter") {
    val df = Events.queries("ev_heavy_hitters")(spark, sfDir)
    val got = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // scale shape: the exact pass must count behind the broadcast
    // candidate semi-join (MG path), not a plain full aggregation.
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))

    val buckets = graft.Tables(spark, sfDir, "events")
      .selectExpr(Events.HhBucketSql + " AS b").collect().map(_.getLong(0))
    val n = buckets.length.toLong
    val exact = exactCounts(buckets.toSeq)
    val brute = exact.filter { case (_, c) => c * Events.HhRatio >= n }
    assert(brute.nonEmpty, "fixture must produce heavy hitters")
    assert(got == brute, s"got $got vs brute $brute")

    // the sqrt key's point: a φ-share filter that is neither all-pass
    // nor empty would be vacuous — require a strict subset at any scale
    // where the bucket universe is big enough to differentiate.
    if (exact.size > 4)
      assert(got.size < exact.size, "heavy-hitter filter is all-pass")

    // prefilter internals: the pigeonhole guard must hold on the demo
    // corpus (12.8× imbalance headroom) and the candidate set must be a
    // superset of the true hitters (the no-false-negative property the
    // exact verify pass builds on).
    val keys = graft.Tables(spark, sfDir, "events")
      .where("user_id IS NOT NULL")
      .selectExpr(Events.HhBucketSql + " AS bucket")
      .localCheckpoint(true)
    val t = (n + Events.HhRatio - 1) / Events.HhRatio
    val (candDf, guaranteed) = Events.hhCandidates(spark, keys, t)
    val cand = candDf.collect().map(_.getLong(0)).toSet
    assert(guaranteed, "pigeonhole guard must hold on the demo corpus")
    brute.keys.foreach(b => assert(cand.contains(b), s"candidates lost hitter $b"))
    assert(cand.size <= Events.HhK.toLong * keys.rdd.getNumPartitions)
  }

  test("exact fallback path returns the same hitters as the MG path") {
    // the guard-failed branch is the plain groupBy over ALL buckets —
    // replicate it and pin equality so partitioning can never change
    // the answer regardless of which branch runs.
    import org.apache.spark.sql.functions._
    val keys = graft.Tables(spark, sfDir, "events")
      .where("user_id IS NOT NULL")
      .selectExpr(Events.HhBucketSql + " AS bucket")
    val n = keys.count()
    val fallback = keys.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * Events.HhRatio >= n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mgPath = Events.queries("ev_heavy_hitters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mgPath == fallback)
  }
}
