package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S1/S2/P5/J5 — the reference's own front door: the Game-of-Thrones CSV
  * fixture imported into the engine's (nodes, edges) data model.
  *
  * Reference shape (`README.md:19`): `GOT_Nodes.csv` header `:ID,name`
  * (107 rows, string keys; the file carries a UTF-8 BOM), `GOT_Rels.csv`
  * header `:START_ID,:END_ID,:TYPE` (352 rows, one row per undirected
  * relation). `neo4j-admin import` assigns internal long ids; here dense
  * ids are assigned deterministically by sorting the string key
  * (sort by key + `zipWithIndex` — reproducible in the DuckDB oracle as
  * `row_number() OVER (ORDER BY key)`, unlike Neo4j's insertion-order
  * ids). Name↔id resolution (`Algo_Util.java:21-30`, a per-row
  * transaction in the reference) is a broadcast hash join against the
  * 107-row nodes side.
  *
  * Scale note: id assignment is a range-partitioned sort + zipWithIndex —
  * contiguous ids without funneling the table through one partition (the
  * global-window alternative would); billions of nodes sort in parallel.
  * The rest of the pipeline — name-resolution joins, symmetrize, PPR — is
  * partition-parallel as-is.
  */
object Got {

  val DefaultDir = "/root/reference/dataset/got"

  /** Dense id of source node "Arya" under the sorted-key assignment —
    * pinned as a constant so the DuckDB oracle is pure SQL-free-of-lookups;
    * GotSpec asserts the dynamic lookup agrees.
    */
  val AryaId = 7L
  val SourceName = "Arya"
  /** Reference GOT demo defaults: α=0.15, k=10 (`PPR.java:177-184`). */
  val Alpha = 0.15
  val TopK = 10
  val Iters = 100

  private val nodesSchema = StructType(Seq(
    StructField("key", StringType), StructField("name", StringType)))
  private val relsSchema = StructType(Seq(
    StructField("s", StringType), StructField("d", StringType),
    StructField("t", StringType)))

  /** `(id LONG, key STRING, name STRING)` — dense ids 1..n by sorted key.
    * Explicit schema skips the BOM'd header line entirely.
    */
  def nodes(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    import spark.implicits._
    spark.read.schema(nodesSchema).option("header", "true")
      .csv(s"$dir/GOT_Nodes.csv")
      .select(col("key"), col("name")).as[(String, String)]
      .rdd.sortBy(_._1).zipWithIndex
      .map { case ((k, n), i) => (i + 1L, k, n) }
      .toDF("id", "key", "name")
  }

  /** Directed, symmetrized, deduplicated edge list `(src LONG, dst LONG)`:
    * rel endpoints name-resolved via broadcast joins (J5), then both
    * directions union'd (the CSV stores each undirected relation once;
    * SURVEY §1.4.5).
    */
  def edges(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    val n = nodes(spark, dir)
    val rels = spark.read.schema(relsSchema).option("header", "true")
      .csv(s"$dir/GOT_Rels.csv")
    val resolved = rels
      .join(broadcast(n.select(col("key").as("s"), col("id").as("src"))), Seq("s"))
      .join(broadcast(n.select(col("key").as("d"), col("id").as("dst"))), Seq("d"))
      .select(col("src"), col("dst"))
    GraphOps.symmetrize(resolved)
  }

  /** Load-once CSR snapshot of the GOT graph per dataset dir (the
    * reference's setupAdjMatrix-once lifecycle — see
    * [[GraphOps.lineitemCsr]] for the rationale).
    */
  private val csrCache = scala.collection.concurrent.TrieMap.empty[String, Csr]
  def cachedCsr(spark: SparkSession, dir: String = DefaultDir): Csr =
    csrCache.getOrElseUpdate(dir, GraphOps.buildCsr(edges(spark, dir)))

  // ----------------------------------------------------------- oracle SQL

  /** DuckDB CTE fragments over the same CSVs (read_csv with explicit names
    * sidesteps the BOM'd header exactly like the Spark schema read).
    */
  def nodesSql(dir: String = DefaultDir): String =
    s"""SELECT row_number() OVER (ORDER BY key) AS id, key, name
       |FROM read_csv('$dir/GOT_Nodes.csv', header=true, names=['key','name'])""".stripMargin

  def edgesSql(dir: String = DefaultDir): String =
    s"""WITH got_nodes AS (${nodesSql(dir)}),
       |got_rels AS (SELECT s, d FROM read_csv('$dir/GOT_Rels.csv', header=true, names=['s','d','t'])),
       |got_dir AS (SELECT a.id AS src, b.id AS dst FROM got_rels r
       |  JOIN got_nodes a ON a.key = r.s JOIN got_nodes b ON b.key = r.d)
       |SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM got_dir UNION ALL SELECT dst AS src, src AS dst FROM got_dir)""".stripMargin
}
