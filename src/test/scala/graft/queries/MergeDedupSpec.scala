package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-4 merge / runtime-filter / incremental-dedup
  * operators beyond what the DuckDB oracle checks: that the bloom filter
  * actually PRUNES (not just preserves output), that merge keys stay
  * unique with delta-wins resolution, and that incremental dedup drops
  * cross-snapshot duplicates when they exist (the sf0.001 corpus has
  * none, so the dup path is exercised on a constructed frame).
  */
class MergeDedupSpec extends SparkSpec {

  test("q13_bloom_join output equals the plain join, and the sketch prunes") {
    val out = Relational.queries("q13_bloom_join")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val li = graft.Tables(spark, sfDir, "lineitem")
    val o = graft.Tables(spark, sfDir, "orders").where(col("o_totalprice") > 450000.0)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(out == plain, "bloom pruning must not change join semantics")

    // the sketch itself must reject most non-matching fact keys: build the
    // same filter and measure survivors vs the full fact table.
    val nKeys = math.max(o.count(), 1000L)
    val bf = o.select(col("o_orderkey")).stat.bloomFilter("o_orderkey", nKeys, 0.01)
    val keys = li.select("l_orderkey").collect().map(_.getLong(0))
    val kept = keys.count(bf.mightContainLong)
    val trueMatch = keys.count(
      o.select("o_orderkey").collect().map(_.getLong(0)).toSet)
    assert(kept < keys.length, "filter must prune some fact rows")
    // false-positive mass stays near the 1% design point (generous 10× slack).
    assert(kept - trueMatch <= math.max(50, keys.length / 10),
      s"bloom kept $kept of ${keys.length} with only $trueMatch true matches")
  }

  test("q14_merge: keys unique, delta wins, inserts present, base preserved") {
    val out = Relational.queries("q14_merge")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(out.length == out.map(_._1).distinct.length, "merge keys must be unique")
    val byKey = out.toMap
    val base = graft.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3))).toMap
    base.foreach { case (k, (cust, status, price)) =>
      if (k % 7 == 3) {
        // updated: status flipped, price bumped by the exact IEEE add.
        assert(byKey(k) == ((cust, "U", price + 1000.0)), s"update row $k")
      } else {
        assert(byKey(k) == ((cust, status, price)), s"untouched row $k")
      }
      if (k % 11 == 5) {
        // insert keys are offset by max(o_orderkey) — above every real key
        // at any scale factor
        assert(byKey(k + base.keys.max) == ((cust, "N", price)),
          s"insert row $k")
      }
    }
    val nInserts = base.keys.count(_ % 11 == 5)
    assert(out.length == base.size + nInserts, "row count = base + inserts")
  }

  test("d_incr_dedup drops exactly the cross-snapshot text duplicates") {
    import spark.implicits._
    // constructed corpus: new snapshot ids {0,3,6,9}; 3 and 9 duplicate
    // existing texts (including a dup of a doc that ALSO appears twice in
    // the old snapshot), 0 and 6 are novel.
    val docs = Seq(
      (0L, "alpha beta", "en", "s0", 10L),
      (3L, "dup one", "en", "s0", 7L),
      (6L, "gamma delta", "de", "s1", 11L),
      (9L, "dup two", "fr", "s1", 7L),
      (1L, "dup one", "en", "s2", 7L),
      (2L, "dup two", "fr", "s2", 7L),
      (4L, "dup two", "fr", "s3", 7L),
      (5L, "other old", "en", "s3", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Text.queries("d_incr_dedup")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 6L), s"survivors were $out")
    // and on the real sf0.001 corpus the op must keep every new doc that
    // has no text twin in the old snapshot (oracle-equivalent semantics).
    val real = Text.queries("d_incr_dedup")(spark, sfDir).collect().map(_.getLong(0)).toSet
    val d = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val oldTexts = d.collect { case (id, t) if id % 3 != 0 => t }.toSet
    val expect = d.collect { case (id, t) if id % 3 == 0 && !oldTexts(t) => id }.toSet
    assert(real == expect)
  }
}
