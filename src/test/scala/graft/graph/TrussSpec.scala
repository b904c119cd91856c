package graft.graph

import graft.SparkSpec
import graft.queries.GotQueries

class TrussSpec extends SparkSpec {

  /** Brute-force reference: support via adjacency-set intersection,
    * synchronous peel rounds.
    */
  private def support(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    edges.iterator.map { case (a, b) =>
      (a, b) -> (adj(a) & adj(b)).size.toLong
    }.filter(_._2 > 0).toMap
  }

  private def peel(edges0: Set[(Long, Long)], k: Int,
      rounds: Int): Set[(Long, Long)] = {
    var edges = edges0
    for (_ <- 1 to rounds) {
      val sup = support(edges)
      edges = edges.filter(e => sup.getOrElse(e, 0L) >= k - 2)
    }
    edges
  }

  private def gotUnd: Set[(Long, Long)] =
    Got.edges(spark).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet

  test("got_truss matches brute-force peeling, is a strict nontrivial " +
      "subset, and the horizon reaches the fixpoint") {
    val got = GotQueries.queries("got_truss")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val und = gotUnd
    val truss = peel(und, GotQueries.TrussK, GotQueries.TrussRounds)
    val want = support(truss).filter { case (e, _) => truss(e) }
    assert(got == want)

    // nontrivial: the peel removed something and left something.
    assert(got.nonEmpty && got.size < und.size,
      s"truss ${got.size} of ${und.size} edges is vacuous")
    // fixed horizon reached the fixpoint: one more peel is a no-op,
    // hence every surviving edge's in-truss support is >= K-2.
    assert(peel(truss, GotQueries.TrussK, 1) == truss,
      "horizon missed fixpoint")
    got.values.foreach(s => assert(s >= GotQueries.TrussK - 2))
  }

  test("got_grid_truss: nested cores — each higher-K truss is a strict " +
      "subset of the lower one, every point matches the brute peel") {
    val got = GotQueries.queries("got_grid_truss")(spark, sfDir).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)), r.getLong(3)))
    val byK = got.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(byK.keySet == GotQueries.GridTrussKs.toSet)
    val und = gotUnd
    GotQueries.GridTrussKs.foreach { k =>
      val truss = peel(und, k, GotQueries.GridTrussRounds)
      val want = support(truss).filter { case (e, _) => truss(e) }
      assert(byK(k) == want, s"grid point K=$k diverged")
    }
    GotQueries.GridTrussKs.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(byK(hi).keySet.subsetOf(byK(lo).keySet), s"K=$hi ⊄ K=$lo")
        assert(byK(hi).size < byK(lo).size, s"K=$hi not strictly smaller")
      case _ => ()
    }
  }

  test("early-exit equals the full unrolled horizon (idempotent spare " +
      "rounds) and a cascading toy peel needs its later rounds") {
    import org.apache.spark.sql.functions.{col, least, greatest}
    val und = Got.edges(spark)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val base = Truss.run(spark, und, GotQueries.TrussK,
      GotQueries.TrussRounds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val more = Truss.run(spark, und, GotQueries.TrussK,
      GotQueries.TrussRounds + 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(base == more)

    // cascade fixture: K5 on GOT converges in 4 rounds, so a 1-round
    // budget returns a NON-fixpoint horizon result — the fixed-horizon
    // semantics (support over e_1, unfiltered) must still hold, and it
    // must differ from the fixpoint.
    val r1 = Truss.run(spark, und, GotQueries.TrussK, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e1 = peel(gotUnd, GotQueries.TrussK, 1)
    val want1 = support(e1).filter { case (e, _) => e1(e) }
    assert(r1 == want1)
    assert(r1 != base.map(t => (t._1, t._2) -> t._3).toMap)
  }

  test("sub-floor LOCAL regime ≡ the distributed full recompute — " +
      "converged AND horizon-exhausted — and the regime is disclosed") {
    import org.apache.spark.sql.functions.{col, least, greatest}
    val und = Got.edges(spark)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
      .localCheckpoint(true)
    // rounds = 1 exercises the horizon-exhausted branch (support over the
    // final survivor set, unfiltered); the full horizon the fixpoint one.
    for (rounds <- Seq(1, GotQueries.TrussRounds)) {
      val local = Truss.run(spark, und, GotQueries.TrussK, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val dist = Truss.runFull(spark, und, GotQueries.TrussK, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(local == dist, s"local ≠ distributed at rounds=$rounds")
    }
    val regimes = scala.collection.mutable.ArrayBuffer.empty[String]
    Truss.run(spark, und, GotQueries.TrussK, GotQueries.TrussRounds,
      (_, _) => (), (_, reg) => regimes += reg)
    assert(regimes.nonEmpty && regimes.forall(_ == "local"),
      s"GOT is far below IncrFloorEdges — every round must be local: " +
        regimes.mkString(","))
  }

  test("hybrid incremental peel ≡ full recompute ≡ brute force, with " +
      "the incremental regime ENGAGED and removing edges") {
    val s = spark
    import s.implicits._
    // P_40³ (edges i→i+1, i+2, i+3: a path power whose K=5 truss erodes
    // from the ends over several rounds with small removal sets — the
    // 2·|R| ≤ |S| shape that flips the regime) ∪ a disjoint K10 so the
    // fixpoint is non-empty.
    val n = 40L
    val edges = (0L until n).flatMap(i => Seq(1L, 2L, 3L).collect {
        case d if i + d < n => (i, i + d)
      }) ++
      (0 until 10).flatMap(a => (a + 1 until 10)
        .map(b => (1000L + a, 1000L + b)))
    val und = edges.toDF("a", "b")
    val k = 5
    val regimes = scala.collection.mutable.ArrayBuffer.empty[String]
    val sched = scala.collection.mutable.ArrayBuffer.empty[Long]
    // incrFloor = 0: the fixture is far below the production job-floor
    // cutoff, so the floor is lifted here to exercise the delta path.
    val hybrid = Truss.run(spark, und, k, 64,
        (_, m2) => sched += m2, (_, reg) => regimes += reg, incrFloor = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // the fixture exercises what it claims: an incremental round that
    // actually removed edges (regime choice + real deltas + the
    // incremental removed-set bookkeeping all on the hot path)
    val incrRemoving = regimes.zipWithIndex.exists { case (reg, i) =>
      reg == "incr" && i > 0 && sched(i) < sched(i - 1)
    }
    assert(regimes.contains("full") && incrRemoving,
      s"fixture must engage BOTH regimes with removals, got " +
        s"${regimes.zip(sched)}")
    val full = Truss.runFull(spark, und, k, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(hybrid == full, "incremental deltas diverged from recompute")
    val bruteEdges = peel(edges.toSet, k, 64)
    val brute = support(bruteEdges).filter { case (e, _) => bruteEdges(e) }
    assert(hybrid == brute)
    assert(hybrid.nonEmpty && hybrid.keySet ==
      (0 until 10).flatMap(a => (a + 1 until 10)
        .map(b => (1000L + a, 1000L + b))).toSet,
      "K=5 truss of the fixture is exactly the K10 block")

    // the DEFAULT dispatch keeps a sub-floor graph OFF the incremental
    // path entirely — since r18 that means the driver-local peel (the
    // GOT-scale job-floor economics) — with identical output.
    val regimesDef = scala.collection.mutable.ArrayBuffer.empty[String]
    val hybridDef = Truss.run(spark, und, k, 64,
        (_, _) => (), (_, reg) => regimesDef += reg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(regimesDef.nonEmpty && regimesDef.forall(_ == "local"),
      s"default floor must keep a small graph all-local, got $regimesDef")
    assert(hybridDef == full, "default-floor schedule diverged")
  }
}
