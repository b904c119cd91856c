package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-query invariants for the round-4 pipeline operators — properties
  * the DuckDB oracle cannot express (consistency BETWEEN queries and
  * determinism across runs).
  */
class PipelineQueriesSpec extends SparkSpec {

  test("d_sample_hash is deterministic and a subset of the corpus") {
    val a = Text.queries("d_sample_hash")(spark, sfDir).collect().map(_.getLong(0)).toSet
    val b = Text.queries("d_sample_hash")(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(a == b, "re-run must sample the identical set")
    val all = graft.Tables(spark, sfDir, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(all) && a.nonEmpty)
  }

  test("d_pack_chunks partitions every document exactly once per stream") {
    val chunks = Text.queries("d_pack_chunks")(spark, sfDir).collect()
    val nDocs = chunks.map(_.getAs[Long]("n_docs")).sum
    val total = graft.Tables(spark, sfDir, "documents").count()
    assert(nDocs == total, "every document lands in exactly one chunk")
    // chunk ids start at 0 and the packing is gap-free in token space:
    // chunk c exists for every c up to the stream's last chunk.
    chunks.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (k, rs) =>
      val ids = rs.map(_.getAs[Long]("chunk_id")).sorted
      assert(ids.head == 0L, s"$k: first chunk is 0")
      assert(ids.distinct.length == ids.length, s"$k: chunk ids unique")
    }
  }

  test("d_shard_export shards partition the corpus; store is shard-laid-out") {
    val a = Text.queries("d_shard_export")(spark, sfDir).collect()
    val total = graft.Tables(spark, sfDir, "documents").count()
    assert(a.map(_.getAs[Long]("n_docs")).sum == total,
      "every document lands in exactly one shard")
    assert(a.map(_.getAs[Number]("shard").intValue()).distinct.length == a.length)
    // content-keyed assignment: a re-run shards identically.
    val b = Text.queries("d_shard_export")(spark, sfDir).collect()
    assert(a.map(r => (r.getAs[Number]("shard").intValue(), r.getAs[Long]("n_docs"))).toSet ==
      b.map(r => (r.getAs[Number]("shard").intValue(), r.getAs[Long]("n_docs"))).toSet)
    // the write really is partitioned by shard (a trainer prunes to its own).
    val dirs = new java.io.File(graft.Scratch.dir(spark, "shards"))
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length == a.length, s"expected ${a.length} shard dirs")
  }

  test("d_curate output respects its own gates and agrees with d_quality") {
    val cur = Text.queries("d_curate")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("n_tokens"), r.getAs[Double]("quality")))
      .toMap
    assert(cur.nonEmpty)
    cur.values.foreach { case (n, q) =>
      assert(q >= Text.CurateMinQuality && n >= Text.CurateMinTokens)
    }
    val qual = Text.queries("d_quality")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    cur.foreach { case (id, (_, q)) =>
      assert(qual(id) == q, s"doc $id: curate quality $q != d_quality ${qual(id)}")
    }
  }

  test("d_top_terms ranks are 1..K with non-increasing counts per language") {
    val rows = Text.queries("d_top_terms")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("tf"), r.getAs[Int]("rk")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to byRank.length),
        s"$lang: dense ranks 1..${byRank.length}")
      assert(byRank.length <= Text.TopTermsK)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"$lang: tf non-increasing")
        case _ =>
      }
    }
  }

  test("q8_rollup subtotal levels are mutually consistent") {
    val rows = Relational.queries("q8_rollup")(spark, sfDir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getAs[Double]("sum_qty"), r.getAs[Long]("n"), r.getAs[Long]("gid")))
    val detail = rows.filter(_._5 == 0L)
    val flagLvl = rows.filter(_._5 == 1L)
    val grand = rows.filter(_._5 == 3L)
    assert(grand.length == 1)
    assert(grand.head._4 == detail.map(_._4).sum, "grand n = sum of detail n")
    flagLvl.foreach { case (f, _, _, n, _) =>
      assert(n == detail.filter(_._1 == f).map(_._4).sum, s"flag $f subtotal")
    }
  }

  test("q18_except and q17_intersect partition the 1995 customer set") {
    import org.apache.spark.sql.functions.{col, year}
    val except = Relational.queries("q18_except")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val intersect = Relational.queries("q17_intersect")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val o = graft.Tables(spark, sfDir, "orders")
    def custs(y: Int) = o.where(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(except.nonEmpty && (except intersect custs(1996)).isEmpty)
    assert((except & intersect).isEmpty)
    assert((except | intersect) == custs(1995),
      "churned ∪ retained = all 1995 customers")
  }

  test("q26_unpivot is the exact inverse of q9_pivot: the long rows " +
      "equal the direct grouped aggregate, null cells dropped") {
    import org.apache.spark.sql.functions._
    val long = Relational.queries("q26_unpivot")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val direct = graft.Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
      .collect()
      .map(r => (r.getString(0),
        if (r.getString(1) == "F") "qty_f" else "qty_o", r.getDouble(2)))
      .toSet
    assert(long == direct)
    assert(long.nonEmpty)
    // round-trip: every wide row contributes at most 2 long rows
    val wide = Relational.queries("q9_pivot")(spark, sfDir).count()
    assert(long.size <= 2 * wide)
  }

  test("q26_unpivot drops an ABSENT pivot cell instead of emitting a " +
      "NULL-qty row (Spark's unpivot keeps null cells; our filter drops)") {
    import spark.implicits._
    // a wide frame with a missing (returnflag, linestatus) combination —
    // the standard-TPC-H shape (no R/O rows): qty_o is NULL for "R".
    val wide = Seq(("A", Some(10.0), Some(20.0)), ("R", Some(5.5), None))
      .toDF("l_returnflag", "qty_f", "qty_o")
    val got = Relational.unpivotQty(wide).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(("A", "qty_f", 10.0), ("A", "qty_o", 20.0),
      ("R", "qty_f", 5.5)), s"NULL cell must melt to NO row, got $got")
    // and the raw Spark unpivot really does keep the null cell — the
    // regression this spec exists to catch: if this ever starts failing,
    // the explicit filter went redundant, not wrong.
    val raw = wide.unpivot(Array(col("l_returnflag")),
      Array(col("qty_f"), col("qty_o")), "linestatus", "qty").count()
    assert(raw == 4, "Spark unpivot emits the NULL cell as a row")
  }

  test("q21_late_suppliers: the aggregate rewrite equals the literal " +
      "EXISTS/NOT-EXISTS semantics replayed in memory") {
    import org.apache.spark.sql.functions.col
    val got = Relational.queries("q21_late_suppliers")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val od = graft.Tables(spark, sfDir, "orders")
      .selectExpr("o_orderkey", "unix_micros(o_orderdate) AS ous")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey", "unix_micros(l_shipdate) AS sus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lateUs = Relational.QLateDays * Events.DayUs
    val perOrder = li.groupBy(_._1).map { case (ok, ls) =>
      val bySupp = ls.groupBy(_._2).view
        .mapValues(_.exists(t => t._3 - od(ok) > lateUs)).toMap
      ok -> bySupp
    }
    // literal semantics: supplier s credited in order o iff s late,
    // EXISTS another supplier, NOT EXISTS another late supplier
    val credit = perOrder.toSeq.flatMap { case (_, bySupp) =>
      bySupp.collect { case (s0, true)
        if bySupp.size >= 2 && bySupp.count(_._2) == 1 => s0 }
    }
    val names = graft.Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = credit.groupBy(identity).map { case (s0, xs) =>
      (names(s0), xs.size.toLong)
    }.toSeq.sortBy { case (n, c) => (-c, n) }.take(Relational.QLateTopN)
    assert(want.nonEmpty && got == want)
  }

  test("q22_idle_customers: integer-exact threshold equals the float-avg " +
      "semantics and every reported customer group has no orders") {
    val got = Relational.queries("q22_idle_customers")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getDouble(2))))
      .toMap
    val cust = graft.Tables(spark, sfDir, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS LONG) AS c_nationkey",
        "CAST(round(c_acctbal * 100) AS LONG) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = graft.Tables(spark, sfDir, "orders")
      .where(org.apache.spark.sql.functions.col("o_orderdate") >=
        org.apache.spark.sql.functions.lit(Relational.Q22Cutoff)
          .cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val (nPos, sPos) = (pos.length.toLong, pos.sum)
    val want = cust
      .filter { case (ck, _, c) => c * nPos > sPos && !ordered(ck) }
      .groupBy(_._2).map { case (nk, xs) =>
        nk -> ((xs.length.toLong,
          xs.map(_._3).sum.toDouble / 100.0))
      }
    assert(want.nonEmpty && got == want)
    // the integer predicate IS the above-average predicate
    cust.foreach { case (_, _, c) =>
      assert((c * nPos > sPos) ==
        (c.toDouble > sPos.toDouble / nPos.toDouble) ||
        c.toDouble == sPos.toDouble / nPos.toDouble)
    }
  }

  test("q19_distribution: ratios replay from per-partition ranks and " +
      "ntile groups differ in size by at most one") {
    val rows = Relational.queries("q19_distribution")(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, part) =>
      val n = part.length
      val sorted = part.sortBy(t => (t._3, t._2))
      sorted.zipWithIndex.foreach { case ((_, _, _, pr, cd, _), i) =>
        val wantPr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(pr == graft.text.TextOps.round6(wantPr))
        assert(cd == graft.text.TextOps.round6((i + 1).toDouble / n))
      }
      val tiles = sorted.map(_._6)
      assert(tiles.sameElements(tiles.sorted), "tiles follow the order")
      val sizes = tiles.groupBy(identity).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, "ntile balance")
    }
  }

  test("q20_running_total: exact-cents cumulative sums per customer in " +
      "(date, key) order; final value equals the customer's total") {
    val rows = Relational.queries("q20_running_total")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getTimestamp(2).getTime,
        r.getLong(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, os) =>
      val ordered = os.sortBy(t => (t._2, t._3))
      var acc = 0L
      ordered.foreach { case (_, _, _, run) =>
        // recover this order's cents from the running difference — the
        // reported total must be the exact prefix sum
        val cents = math.round(run * 100) - acc
        assert(cents > 0, "order amounts are positive")
        acc += cents
        assert(run == acc.toDouble / 100.0, "exact cents, one division")
      }
    }
  }

  test("ev_sliding counts every event in exactly two hopping windows") {
    val slide = Events.queries("ev_sliding")(spark, sfDir).collect()
      .map(_.getAs[Long]("n")).sum
    val total = graft.Tables(spark, sfDir, "events").count()
    assert(slide == 2 * total)
  }

  test("e_kmeans assigns every vector to one of K cells, deterministically") {
    val a = Embeddings.queries("e_kmeans")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    assert(a.size == n, "one assignment per vector")
    assert(a.values.toSet.subsetOf((0 until Embeddings.KmK).toSet))
    val b = Embeddings.queries("e_kmeans")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    assert(a == b, "Lloyd's rounds are deterministic")
  }

  test("e_pq encodes every vector with in-range per-subspace codes") {
    val a = Embeddings.queries("e_pq")(spark, sfDir).collect()
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    assert(a.length == n, "one code word per vector")
    val codeCols = (0 until Embeddings.PqM).map(j => s"code$j")
    a.foreach { r =>
      codeCols.foreach { c =>
        val v = r.getAs[Number](c).intValue()
        assert(v >= 0 && v < Embeddings.KmK, s"$c out of range: $v")
      }
    }
    // the codebooks genuinely partition the data: each subspace uses
    // more than one centroid
    codeCols.foreach { c =>
      assert(a.map(_.getAs[Number](c).intValue()).distinct.length > 1, c)
    }
    val b = Embeddings.queries("e_pq")(spark, sfDir).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "Lloyd rounds are deterministic")
  }

  test("e_pq_search returns full per-query top-k and self-retrieves at rank 1") {
    val rows = Embeddings.queries("e_pq_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("rk")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == Embeddings.NumQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1 to Embeddings.TopK), s"q $q")
      // ADC distance of a vector to its own code is just its quantization
      // error — the query's own vector must win its ranking
      assert(rs.exists(t => t._2 == q && t._3 == 1), s"q $q self-retrieval")
    }
  }

  test("the served LSH pair table and exact-dedup groups unpin on " +
      "invalidateShared and refit from source to the same answer") {
    val sc = spark.sparkContext
    val pairs0 = Text.queries("d_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val groups0 = Text.queries("d_dedup_exact")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs0.nonEmpty && groups0.nonEmpty)
    val pinned0 = graft.operators.SessionPins.pinned(sc)
    Text.invalidateShared(spark, sfDir)
    assert(graft.operators.SessionPins.pinned(sc).size < pinned0.size,
      "invalidation must unpin the served text-side frames")
    assert(Text.queries("d_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      == pairs0) // REFIT from source — not a stale frame
    assert(Text.queries("d_dedup_exact")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == groups0)
  }

  test("d_split_leakage: exactly the cross-split subset of the verified " +
      "near-dup pairs, splits replayed from fingerprints") {
    val leaks = Text.queries("d_split_leakage")(spark, sfDir).collect()
    assert(leaks.nonEmpty, "fixture should contain cross-split near-dups")
    val pairs = Text.queries("d_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val m = graft.text.TextOps.fingerprint(r.getString(1)) % 10
        r.getLong(0) -> (if (m < 8) "train" else if (m == 8) "val" else "test")
      }.toMap
    leaks.foreach { r =>
      val (a, b, sa, sb) = (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))
      assert(pairs((a, b)), s"($a,$b) not a verified near-dup pair")
      assert(sa != sb && split(a) == sa && split(b) == sb, s"($a,$b) splits")
    }
    // completeness: every cross-split near-dup pair is reported
    val expected = pairs.count { case (a, b) => split(a) != split(b) }
    assert(leaks.length == expected)
  }

  test("d_weighted_sample: exact K per language, keys replayed, " +
      "length-biased, map-side group limit in the plan") {
    val df = Text.queries("d_weighted_sample")(spark, sfDir)
    val out = df.collect()
    val perLang = out.groupBy(_.getString(1))
    perLang.values.foreach(rows =>
      assert(rows.length == Text.WeightedSampleK))
    // keys replay independently: u^(1/w) from the fingerprint kernel
    val docs = graft.Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "text", "greatest(n_chars, 1) AS wt").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (id, wt, skey) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val (text, w) = docs(id)
      assert(w == wt)
      val u = (graft.text.TextOps.fingerprint(text) + 1.0) /
        (graft.text.TextOps.P + 1.0)
      val expect = BigDecimal(math.pow(u, 1.0 / w))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(skey == expect, s"doc $id key $skey vs $expect")
    }
    // the point of weighting: the sample is length-biased — sampled docs
    // average a larger weight than their language's corpus average.
    val corpusAvg = docs.values.map(_._2.toDouble).sum / docs.size
    val sampleAvg = out.map(_.getLong(2).toDouble).sum / out.length
    assert(sampleAvg > corpusAvg,
      s"sample avg wt $sampleAvg vs corpus $corpusAvg")
    // scale shape: the row_number cut must compile to WindowGroupLimit
    // (map-side per-group top-K), not a full window sort.
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("d_dsir_resample: K rows, no target docs, rank over the rounded " +
      "Gumbel key, importance bias, map-side group limit in the plan") {
    val df = Text.queries("d_dsir_resample")(spark, sfDir)
    val out = df.collect()
    assert(out.length == Text.DsirK)
    // schema: doc_id, source, lang, n_big, logw, gkey, rk
    out.foreach { r =>
      assert(r.getString(1) != Text.DsirTarget, s"target doc ${r.getLong(0)} sampled")
      assert(r.getLong(3) >= 1L) // every sampled doc has a bigram stream
    }
    val byRank = out.sortBy(_.getInt(6))
    assert(byRank.map(_.getInt(6)).toSeq == (1 to Text.DsirK))
    // ranks follow the rounded key desc with doc_id tie-break
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (ka, kb) = (a.getDouble(5), b.getDouble(5))
      assert(ka > kb || (ka == kb && a.getLong(0) < b.getLong(0)))
    case _ => ()
    }
    // the point of importance weighting: the resample is biased toward
    // target-looking docs — its mean logw exceeds the raw-corpus mean
    // (Gumbel noise is zero-centered-ish and iid across docs, so the
    // selection bias survives it on this corpus; deterministic seed).
    val gum = out.map(r => r.getDouble(5) - r.getDouble(4))
    assert(gum.forall(g => !g.isNaN && !g.isInfinite))
    val sampleAvg = out.map(_.getDouble(4)).sum / out.length
    assert(sampleAvg > -0.2, s"sample mean logw $sampleAvg implausibly low")
    // determinism: a second run reproduces the same sample
    val again = Text.queries("d_dsir_resample")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
    // scale shape: the global top-K must not be a full sort — either the
    // partitionless-window group limit or (what Spark actually picks
    // here) TakeOrderedAndProject, the map-side partial top-K + bounded
    // driver merge.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject"))
  }

  test("codePointSyms splits by code point, not UTF-16 unit") {
    assert(Text.codePointSyms("abc").toSeq == Seq("a", "b", "c"))
    assert(Text.codePointSyms("").toSeq == Seq.empty)
    // astral-plane character (surrogate pair) stays one symbol — the
    // DuckDB string_split(word, '') unit.
    val emoji = new String(Character.toChars(0x1F600))
    assert(Text.codePointSyms(s"a${emoji}b").toSeq == Seq("a", emoji, "b"))
  }

  test("bpeApply: greedy non-overlapping merge semantics") {
    def ap(s: String, a: String, b: String) =
      Text.bpeApply(s.split("").filter(_.nonEmpty), a, b).toSeq
    assert(ap("aaa", "a", "a") == Seq("aa", "a"))
    assert(ap("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(ap("abab", "a", "b") == Seq("ab", "ab"))
    assert(ap("xaby", "a", "b") == Seq("x", "ab", "y"))
    assert(ap("ab", "b", "a") == Seq("a", "b"))
    // merged symbols are single units afterward: "ab"+"a" ≠ "a"+"ba"
    assert(Text.bpeApply(Array("ab", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
  }

  test("d_bpe_vocab reproduces an independent in-memory BPE trainer") {
    val rows = Text.queries("d_bpe_vocab")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to Text.BpeRounds))
    // merging only removes or re-labels pair occurrences, so the best
    // count cannot grow across rounds
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 >= b._4, s"$a then $b")
      case _ => ()
    }
    // ground truth: plain-Scala BPE over the collected word dictionary
    var dict: Map[Seq[String], Long] = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .map { case (w, f) => w.split("").filter(_.nonEmpty).toSeq -> f }
    for ((rk, p1, p2, cnt) <- rows) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val (bp, bc) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      assert((bp._1, bp._2, bc) == ((p1, p2, cnt)), s"round $rk")
      dict = dict.groupBy { case (syms, _) =>
        Text.bpeApply(syms.toArray, bp._1, bp._2).toSeq
      }.view.mapValues(_.values.sum).toMap
    }
  }

  test("d_ngram_diversity equals a brute-force per-source replay") {
    val rows = Text.queries("d_ngram_diversity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.nonEmpty)
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)
        .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
        .filter(_.nonEmpty).toSeq))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (for {
      (src, ds) <- docs.groupBy(_._1)
      n <- 1 to 3
    } yield {
      val grams = ds.flatMap(_._2.sliding(n).filter(_.length == n).toSeq)
      (src, n) -> ((grams.length.toLong, grams.distinct.length.toLong,
        r6(grams.distinct.length.toDouble / grams.length)))
    }).toMap
    assert(rows == want)
    // structural sanity on any natural-ish corpus: diversity grows in n —
    // non-strictly, because a small or fully-distinct source saturates a
    // ratio at 1.0 and consecutive ratios legitimately tie there.
    rows.keys.map(_._1).foreach { src =>
      assert(rows((src, 1))._3 <= rows((src, 2))._3 &&
        rows((src, 2))._3 <= rows((src, 3))._3)
      assert(rows((src, 1))._3 < rows((src, 2))._3 ||
        rows((src, 2))._3 == 1.0)
      assert(rows((src, 2))._3 < rows((src, 3))._3 ||
        rows((src, 3))._3 == 1.0)
    }
  }

  test("gopherRepCounts: hand-computed repetition counts, incl. the " +
      "dup-5-gram signal the demo corpus never trips") {
    val T = graft.text.TextOps
    // "a b c d e a b c d e": tot=10 one-char words; (a,b) wins the
    // 2-gram tie lexically at cnt 2 → top2 = 2·(1+1); the 5-gram
    // (a,b,c,d,e) occurs twice → dup5 = 2·5.
    assert(T.gopherRepCounts("a b c d e a b c d e") == ((10L, 4L, 10L)))
    // no repeats: top-2-gram falls to the lexically-first pair at cnt 1
    // ("five six" → 1·(4+3)), dup signal zero
    assert(T.gopherRepCounts("one two three four five six") ==
      ((22L, 7L, 0L)))
    // tie-break is load-bearing: "bb cc" (cnt 1) vs "a a" (cnt 2)
    assert(T.gopherRepCounts("a a a bb cc") == ((7L, 2L * 2L, 0L)))
    // short/empty docs
    assert(T.gopherRepCounts("word") == ((4L, 0L, 0L)))
    assert(T.gopherRepCounts("") == ((0L, 0L, 0L)))
  }

  test("d_gopher_rep: fractions replay from the kernel, flag matches the " +
      "thresholds on rounded values") {
    val rows = Text.queries("d_gopher_rep")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (id, f2, f5, fl) =>
      val (tot, top2, dup5) = graft.text.TextOps.gopherRepCounts(docs(id))
      val (w2, w5) =
        (if (tot == 0) 0.0 else r6(top2.toDouble / tot),
          if (tot == 0) 0.0 else r6(dup5.toDouble / tot))
      assert((f2, f5) == ((w2, w5)), s"doc $id")
      assert(fl == (if (f2 > Text.GopherTop2Max || f5 > Text.GopherDup5Max) 1
        else 0), s"doc $id flag")
      assert(f2 >= 0 && f2 <= 1 && f5 >= 0 && f5 <= 1)
    }
    // the corpus actually exercises the flag
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0))
  }

  test("production-path BPE: the driver-local merge loop equals the " +
      "distributed per-round path and affords a 200-merge schedule") {
    val demo = Text.queries("d_bpe_vocab")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // same stage-1 fold, merge loop on the collected dictionary: merges
    // identical to the distributed rounds, tie-breaks included
    assert(Text.bpeTrainLocal(spark, sfDir, Text.BpeRounds) == demo)
    // the production round count the per-round distributed loop cannot
    // afford (200 sequential Spark jobs): the local loop is a prefix-
    // stable greedy, so the first BpeRounds merges must coincide
    val long = Text.bpeTrainLocal(spark, sfDir, 200)
    assert(long.take(Text.BpeRounds) == demo)
    assert(long.length > Text.BpeRounds)
    // greedy invariant: the picked pair count never increases round over
    // round (a post-merge pair's count is bounded by the merged pair's)
    long.sliding(2).foreach {
      case Seq(x, y) => assert(y._4 <= x._4, s"$x then $y")
      case _ =>
    }
    // deterministic end to end
    assert(Text.bpeTrainLocal(spark, sfDir, 200) == long)
  }

  test("d_bpe_encode equals an independent in-memory train-then-apply") {
    val df = Text.queries("d_bpe_encode")(spark, sfDir)
    // scale shape: the word→symbol-count dictionary joins as a
    // broadcast; a shuffled join here would re-shuffle the corpus on a
    // string key.
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    // in-memory trainer: same loop as the d_bpe_vocab ground truth
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .split("\\s+", -1).filter(_.nonEmpty).toSeq)
    var dict: Map[Seq[String], Long] = docs.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .map { case (w, f) => w.split("").filter(_.nonEmpty).toSeq -> f }
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 1 to Text.BpeRounds) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val (bp, _) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      merges += bp
      dict = dict.groupBy { case (syms, _) =>
        Text.bpeApply(syms.toArray, bp._1, bp._2).toSeq
      }.view.mapValues(_.values.sum).toMap
    }
    // apply: per word the merge cascade, per doc the (n_words, Σ syms)
    val ms = merges.result()
    val enc = collection.mutable.Map.empty[String, Long]
    def nSyms(w: String): Long = enc.getOrElseUpdate(w, {
      var syms = w.split("").filter(_.nonEmpty)
      for ((a, b) <- ms) syms = Text.bpeApply(syms, a, b)
      syms.length.toLong
    })
    val want = docs.collect { case (id, ws) if ws.nonEmpty =>
      id -> ((ws.length.toLong, ws.map(nSyms).sum))
    }.toMap
    assert(rows == want)
  }

  test("e_hard_negatives: different-label top-k per query, under the dup cap") {
    val rows = graft.queries.Embeddings.queries("e_hard_negatives")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getInt(4)))
    val labels = graft.Tables(spark, sfDir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.map(_._1).distinct.length ==
      graft.queries.Embeddings.NumQueries)
    rows.foreach { case (q, v, lab, cos, rk) =>
      assert(labels(v) == lab && lab != labels(q), s"q=$q v=$v")
      assert(cos < graft.queries.Embeddings.HnDupMax)
      assert(rk >= 1 && rk <= graft.queries.Embeddings.HnK)
      assert(v != q)
    }
    // within each query the ranked list is non-increasing in cosine
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._5).sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ => ()
      }
    }
  }

  test("ev_cms_freq: CMS never underestimates and matches exact counts " +
      "replayed from the raw events") {
    val rows = graft.queries.Events.queries("ev_cms_freq")(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.nonEmpty)
    // the defining one-sided error: min over d rows of bucket counts
    // includes every one of the key's own increments
    rows.foreach { case (k, (exact, est)) =>
      assert(est >= exact, s"$k: est $est < exact $exact")
    }
    // exact column replays from the raw table
    val want = graft.Tables(spark, sfDir, "events")
      .selectExpr("date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day",
        "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map { case (k, (exact, _)) => k -> exact }.toMap == want)
  }

  test("ev_daily_hll equals an independent in-memory HLL replay of the " +
      "raw events") {
    val E = graft.queries.Events
    val rows = E.queries("ev_daily_hll")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    // replay: same mixer, registers and correction computed straight in
    // Scala (numberOfLeadingZeros instead of the SQL bin-length spelling)
    val P = graft.text.TextOps.P
    val raw = graft.Tables(spark, sfDir, "events")
      .selectExpr("date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day",
        "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = raw.groupBy(_._1).map { case (day, evs) =>
      val regs = new Array[Int](E.HllM)
      evs.foreach { case (_, uid) =>
        val hm = graft.text.TextOps.kmvMix(uid % P)
        val b = (hm % E.HllM).toInt
        val w = hm / E.HllM
        val rho =
          if (w == 0) E.HllW + 1
          else E.HllW + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(b)) regs(b) = rho
      }
      val v = regs.count(_ == 0)
      val sScaled = regs.map(m => 1L << (E.HllW + 1 - m)).sum
      val rawEst = (0.673 * E.HllM * E.HllM) /
        (sScaled.toDouble / (1L << (E.HllW + 1)).toDouble)
      val est =
        if (rawEst <= 2.5 * E.HllM && v > 0) E.HllM * math.log(E.HllM.toDouble / v)
        else rawEst
      val est4 = BigDecimal(est)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      day -> ((evs.map(_._2).distinct.size.toLong, v.toLong, est4))
    }
    assert(rows == want)
  }

  test("ev_value_quantiles: exact columns replay from raw values by the " +
      "rank rule, sample degenerates to exact when a day fits the sample, " +
      "and the sample cut is a WindowGroupLimit") {
    val E = graft.queries.Events
    val df = E.queries("ev_value_quantiles")(spark, sfDir)
    // scale shape: the bottom-k-by-hash sample cut must stay map-side
    // bounded like its sibling rows' cuts.
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val rows = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), (r.getDouble(2), r.getDouble(3), r.getDouble(4)),
        (r.getDouble(5), r.getDouble(6), r.getDouble(7))))).toMap
    assert(rows.nonEmpty)
    val raw = graft.Tables(spark, sfDir, "events")
      .selectExpr("date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day",
        "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def rank(q: Double, n: Int): Int = math.floor(q * (n - 1)).toInt
    rows.foreach { case (day, (n, ex, sp)) =>
      val vs = raw(day)
      assert(n == vs.length, s"$day: n $n vs ${vs.length}")
      val want = (vs(rank(0.5, vs.length)), vs(rank(0.9, vs.length)),
        vs(rank(0.99, vs.length)))
      assert(ex == want, s"$day: exact $ex vs replay $want")
      // sf0.001 days are all smaller than the sample: the deterministic
      // sample IS the population, so the sketch must equal the truth.
      if (n <= E.EvQK) assert(sp == ex, s"$day: sample $sp vs exact $ex")
    }
  }

  test("d_ccnet_buckets: scores match d_bigram_lm, buckets are " +
      "score-ordered and all three are inhabited") {
    val T = graft.queries.Text
    val df = T.queries("d_ccnet_buckets")(spark, sfDir)
    // scale shape: the sample is a bounded TakeOrderedAndProject and the
    // thresholds join back as a broadcast 1-row nested loop — no global
    // sort of per-doc scores anywhere.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") &&
      plan.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.nonEmpty)
    // the labeling pass must not drift from the scoring row it embeds
    val lm = T.queries("d_bigram_lm")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach { case (id, s, _) => assert(lm(id) == s, s"doc $id") }
    assert(rows.map(_._1).toSet == lm.keySet)
    // threshold semantics: every head score is >= every middle score,
    // every middle >= every tail (buckets are half-open score intervals)
    val byB = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byB.keySet == Set("head", "middle", "tail"))
    assert(byB("head").min >= byB("middle").max)
    assert(byB("middle").min > byB("tail").max)
  }

  test("e_cluster_balance caps every cell, keeps small cells whole, stays " +
      "consistent with the kmeans assignment") {
    val E = graft.queries.Embeddings
    val df = E.queries("e_cluster_balance")(spark, sfDir)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val cells = E.queries("e_kmeans")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellSizes = cells.groupBy(_._2).view.mapValues(_.size).toMap
    rows.foreach { case (v, c, _, rk) =>
      assert(cells(v) == c, s"vec $v cell drifted")
      assert(rk >= 1 && rk <= E.CbPerCell)
    }
    rows.groupBy(_._2).foreach { case (c, g) =>
      assert(g.length == math.min(E.CbPerCell, cellSizes(c)),
        s"cell $c kept ${g.length} of ${cellSizes(c)}")
    }
    // the cap binds somewhere on this corpus (otherwise the row tests
    // nothing) — and the per-cell cut is a map-side group limit.
    assert(cellSizes.values.exists(_ > E.CbPerCell))
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("d_span_dups equals the brute-force rolling-span duplicate report") {
    val df = Text.queries("d_span_dups")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._4)
    assert(got.length == Text.SpanTopN)
    // scale shape: the global top-N cut must stay map-side-bounded —
    // either InferWindowGroupLimit fires on the partition-less
    // row_number window (what Spark picks here) or the plan is a
    // TakeOrderedAndProject; a plain global WindowExec would funnel
    // every duplicated-span aggregate row through one partition.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // brute force over the collected corpus with the same hash fold
    val spans = collection.mutable.Map.empty[Long, (Set[Long], Long)]
    graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .foreach { r =>
        val (id, t) = (r.getLong(0), r.getString(1))
        val hs = t.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+", -1).map(graft.text.TextOps.tokenHash)
        for (i <- 0 to hs.length - Text.SpanW) {
          var x = 0L
          for (j <- i until i + Text.SpanW)
            x = (x * graft.text.TextOps.TokMul + hs(j)) % graft.text.TextOps.P
          val (ds, c) = spans.getOrElse(x, (Set.empty[Long], 0L))
          spans(x) = (ds + id, c + 1)
        }
      }
    val want = spans.toSeq
      .map { case (sh, (ds, c)) => (sh, ds.size.toLong, c) }
      .filter(_._2 > 1)
      .sortBy { case (sh, d, c) => (-c, -d, sh) }
      .take(Text.SpanTopN).zipWithIndex
      .map { case ((sh, d, c), i) => (sh, d, c, i + 1) }
    assert(got.toSeq == want)
  }

  test("d_decontam_frac agrees with d_decontam's hit counts and bounds") {
    val hits = Text.queries("d_decontam")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frac = Text.queries("d_decontam_frac")(spark, sfDir).collect()
    assert(frac.nonEmpty)
    frac.foreach { r =>
      val (id, nSh, nHits, f, flag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))
      // the fractional row's hit count IS d_decontam's (absent = 0)
      assert(nHits == hits.getOrElse(id, 0L), s"doc $id")
      assert(nHits <= nSh && f >= 0.0 && f <= 1.0)
      assert((flag == 1) == (f >= Text.DecontamFracThreshold), s"doc $id flag")
    }
    // every doc d_decontam scored appears in the fractional table
    assert(hits.keySet.subsetOf(frac.map(_.getLong(0)).toSet))
  }

  test("d_passage_dedup keeps each distinct passage exactly once") {
    val rows = Text.queries("d_passage_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nPass, nDup, nKept) =>
      assert(nPass > 0 && nDup <= nPass && nKept <= nPass, s"doc $id")
      // non-duplicated passages are always kept
      assert(nKept >= nPass - nDup, s"doc $id")
    }
    // global invariant: Σ n_kept = number of DISTINCT passage hashes
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
    val distinct = docs.flatMap(r =>
      graft.text.TextOps.passageHashes(r.getString(1), Text.PassageW)).toSet
    assert(rows.map(_._4).sum == distinct.size)
    // only documents with at least one full window appear
    val expectDocs = docs.filter(r =>
      graft.text.TextOps.passageHashes(r.getString(1), Text.PassageW).nonEmpty)
    assert(rows.length == expectDocs.length)
  }

  test("d_lsh_verify covers exactly the LSH candidate set with sane bounds") {
    val ver = Text.queries("d_lsh_verify")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("jac"), r.getAs[Int]("edit_dist"), r.getAs[Double]("sim")))
      .toMap
    val pairs = Text.queries("d_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ver.keySet == pairs)
    ver.foreach { case (k, (jac, dist, sim)) =>
      assert(jac >= 0.3 && dist >= 0 && sim <= 1.0, s"pair $k")
      // near-dup candidates at this threshold are genuinely close in
      // edit space — normalized similarity stays high
      assert(sim >= 0.5, s"pair $k: sim $sim")
    }
  }

  test("d_bigram_lm scores are log-probs consistent with the token stream") {
    val lm = Text.queries("d_bigram_lm")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_logp"))).toMap
    assert(lm.nonEmpty)
    // smoothed conditionals are strict probabilities: (c12+1)/(c1+V) < 1
    // whenever V > observed types, so every mean log is negative.
    lm.values.foreach { case (n, s) => assert(n > 0 && s < 0.0) }
    // bigram count is exactly n_ws - 1 for every multi-token document
    // (same tokenizer as d_tokens), and docs with < 2 tokens are absent.
    val ws = Text.queries("d_tokens")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_ws")).toMap
    ws.foreach { case (id, n) =>
      if (n >= 2) assert(lm(id)._1 == n - 1L, s"doc $id")
      else assert(!lm.contains(id))
    }
  }
}
