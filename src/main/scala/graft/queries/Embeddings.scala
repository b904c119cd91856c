package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (beyond-reference
  * roadmap, SURVEY §7.5): brute-force cosine top-k as the exact baseline,
  * and a sign-bit LSH-bucketed variant as the scale path.
  *
  * Scale shape: the query side is broadcast (queries << corpus); the
  * corpus side streams through a single projection — no shuffle until the
  * per-query top-k (TakeOrderedAndProject-style window). The LSH variant
  * replaces the full cross product with an equi-join on the bucket key,
  * which Catalyst executes as a hash join — candidate count drops from
  * |Q|·N to |Q|·N/2^bits on balanced buckets.
  *
  * The dot product folds left-to-right in BOTH engines (Spark `aggregate`
  * vs DuckDB `list_reduce` with a prepended 0-accumulator), so the
  * rounded cosine matches bit-for-bit.
  */
object Embeddings {

  val NumQueries = 20 // query vectors: vec_id < NumQueries
  val TopK = 10
  val LshBits = 8
  val LshTopK = 5

  private val dotExpr =
    "aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, x) -> a + x)"
  private val normExpr = (c: String) =>
    s"sqrt(aggregate(transform($c, x -> x * x), CAST(0 AS DOUBLE), (a, x) -> a + x))"

  private def embDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("vec_id", "v", s"${normExpr("v")} AS nrm")

  private def cosineJoined(s: SparkSession, dir: String): DataFrame = {
    val emb = embDf(s, dir)
    val q = emb.where(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS q_id", "v AS qv", "nrm AS qnrm")
    emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round($dotExpr / (qnrm * nrm), 6) AS cos")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact cosine top-k per query (tie-inclusive RANK on the
    // rounded score so cross-engine float noise cannot flip the cut).
    "e_cosine_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc)
      cosineJoined(s, dir)
        .withColumn("rk", rank().over(w))
        .where(col("rk") <= TopK)
        .select(col("q_id"), col("vec_id"), col("cos"), col("rk"))
    }),

    // LSH-bucketed ANN: candidates share the sign-bit bucket of the first
    // LshBits dimensions; exact cosine within the bucket.
    "e_ann_lsh" -> ((s, dir) => {
      val bucketExpr = (0 until LshBits)
        .map(b => s"(CASE WHEN element_at(v, ${b + 1}) >= 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      val emb = embDf(s, dir).selectExpr("vec_id", "v", "nrm", s"$bucketExpr AS bkt")
      val q = emb.where(col("vec_id") < NumQueries)
        .selectExpr("vec_id AS q_id", "v AS qv", "nrm AS qnrm", "bkt")
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc)
      emb.join(broadcast(q), Seq("bkt"))
        .where(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id",
          s"round($dotExpr / (qnrm * nrm), 6) AS cos")
        .withColumn("rk", rank().over(w))
        .where(col("rk") <= LshTopK)
        .select(col("q_id"), col("vec_id"), col("cos"), col("rk"))
    })
  )

  // --------------------------------------------------------------- oracle

  private val duckBase =
    s"""emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |embn AS (SELECT vec_id, v,
       |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm FROM emb)""".stripMargin

  private val duckDot =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list_transform(range(1, 65), i -> q.v[i] * c.v[i])), (a, x) -> a + x)"

  def oracleSql: Map[String, String] = Map(
    "e_cosine_topk" ->
      s"""WITH $duckBase,
         |cosj AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         |  round($duckDot / (q.nrm * c.nrm), 6) AS cos
         |  FROM embn q JOIN embn c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NumQueries)
         |SELECT q_id, vec_id, cos, rk FROM (
         |  SELECT q_id, vec_id, cos,
         |    rank() OVER (PARTITION BY q_id ORDER BY cos DESC) AS rk FROM cosj)
         |WHERE rk <= $TopK""".stripMargin,
    "e_ann_lsh" -> {
      val bucketExpr = (sideV: String) => (0 until LshBits)
        .map(b => s"(CASE WHEN $sideV[${b + 1}] >= 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $duckBase,
         |embb AS (SELECT vec_id, v, nrm, ${bucketExpr("v")} AS bkt FROM embn),
         |cosj AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         |  round($duckDot / (q.nrm * c.nrm), 6) AS cos
         |  FROM embb q JOIN embb c ON c.bkt = q.bkt AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NumQueries)
         |SELECT q_id, vec_id, cos, rk FROM (
         |  SELECT q_id, vec_id, cos,
         |    rank() OVER (PARTITION BY q_id ORDER BY cos DESC) AS rk FROM cosj)
         |WHERE rk <= $LshTopK""".stripMargin
    }
  )
}
