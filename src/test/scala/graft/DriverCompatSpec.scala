package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-compat static checks. The correctness harness compares Spark
  * parquet output to DuckDB oracle output through pandas, which (a) cannot
  * sort rows on array/map-typed columns (`TypeError: unhashable type`) and
  * (b) renders DuckDB HUGEINT — the result type of an un-cast
  * `sum(INTEGER)` — as float64 while the Spark side is int64, so the value
  * hash misses even when every value is identical. Both classes produced
  * red rows in round 4 (`e_quantize`; `d_pack_chunks`/`d_shard_export`/
  * `d_passage_dedup`). These specs make them impossible to reintroduce.
  */
class DriverCompatSpec extends SparkSpec {

  test("every query's final schema is scalar-only (pandas-sortable)") {
    val sc = spark.sparkContext
    SparkEntry.queries.foreach { case (name, fn) =>
      val pinned = sc.getPersistentRDDs.keySet
      val bad = fn(spark, sfDir).schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(bad.isEmpty, s"$name emits non-scalar columns " +
        s"[${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}] — " +
        "the driver comparator cannot sort them; encode as string/hash")
      // release whatever the query pinned (same hygiene as Verify/Bench)
      val now = sc.getPersistentRDDs
      (now.keySet -- pinned).foreach(id => now.get(id).foreach(_.unpersist(false)))
    }
  }

  /** Text of an oracle from its first top-level (paren-depth-0) SELECT to
    * the end: the final SELECT plus any top-level set-op branches. CTE
    * bodies sit inside parens, so they're excluded — intermediate integer
    * sums (e.g. d_simhash's bit sums) feed further arithmetic and never
    * reach pandas.
    */
  private def finalRegion(sql: String): String = {
    var depth = 0
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && sql.regionMatches(true, i, "SELECT", 0, 6) =>
          return sql.substring(i)
        case _ =>
      }
      i += 1
    }
    sql
  }

  /** Offsets of raw (un-wrapped, depth-0) `sum(` calls in the final SELECT
    * of `sql` — each one is a HUGEINT hazard. A sum inside `CAST(`/`round(`
    * sits at depth > 0 and is excluded; a depth-0 sum used as a divisor is
    * excluded (the whole expression is already DOUBLE).
    */
  private def rawFinalSums(sql: String): Seq[Int] = {
    val region = finalRegion(sql)
    val depthAt = region.scanLeft(0) {
      case (d, '(') => d + 1
      case (d, ')') => d - 1
      case (d, _)   => d
    }
    "(?i)\\bsum\\s*\\(".r.findAllMatchIn(region)
      .filter(m => depthAt(m.start) == 0)
      .filterNot { m =>
        region.substring(math.max(0, m.start - 12), m.start).trim.endsWith("/")
      }
      .map(_.start).toSeq
  }

  test("no oracle carries a raw sum( in its final SELECT (DuckDB HUGEINT)") {
    // self-check on round 4's actual red-row shape, so a lint regression
    // can't silently pass everything
    assert(rawFinalSums(
      "WITH t AS (SELECT a, b FROM x) SELECT a, sum(b) AS s FROM t GROUP BY a").nonEmpty)
    assert(rawFinalSums(
      "WITH t AS (SELECT a, sum(b) AS s FROM x GROUP BY a) " +
        "SELECT a, CAST(sum(s) AS BIGINT) AS s2, round(sum(s), 2) AS s3, " +
        "n / sum(n) OVER () AS p FROM t GROUP BY a, n").isEmpty)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val bad = rawFinalSums(sql)
      assert(bad.isEmpty,
        s"$name final SELECT has unwrapped sum( at offsets $bad — DuckDB" +
          " promotes integer sums to HUGEINT, which the driver comparator" +
          " renders as float64; wrap as CAST(sum(..) AS BIGINT) (or" +
          " round(..) for doubles)")
    }
  }
}
