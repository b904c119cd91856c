package graft.harness

import org.apache.spark.sql.SparkSession
import graft.graph.Got

/** H1 — the CLI entry point (reference `PPR.main`, `PPR.java:154-200`,
  * commons-cli options at `:156-184`). Same eight options with the same
  * defaults; `-node`/`-label`/`-rel` are accepted for parity but are
  * no-ops here — the CSV data model has a fixed schema instead of Neo4j
  * label/property/rel-type names. `-db` points at the GOT-format CSV
  * dataset directory (the reference's embedded-DB dir).
  *
  * Extensions (not in the reference): `-grid got|smoke` selects the
  * parameter grid, `-log <path>` overrides the result-file path (default:
  * `<dbName>_AlgoPerfResults.txt` in the working directory — the
  * reference appends next to its db path, which here may be read-only),
  * `-seed <long>` pins the query sample and walk streams.
  */
object Main {

  final case class Options(
      alpha: Double = 0.15,
      epsilon: Double = 0.5,
      queryNum: Int = 50,
      k: Int = 10,
      nodeProperty: String = "name",
      labelType: String = "Person",
      relType: String = "Relation",
      dbDir: String = Got.DefaultDir,
      grid: String = "got",
      logPath: Option[String] = None,
      seed: Long = 42L,
      help: Boolean = false)

  val usage: String =
    """usage: PPR
      | -alpha <arg>   The possibility that a random walk stops at current node (Default: 0.15)
      | -eps <arg>     The relative error bound (Default: 0.5)
      | -query <arg>   The number of queries for the test (Default: 50)
      | -k <arg>       For Top-k Algorithm tests: the number of nodes with greatest PPR value that we're interested in (Default: 10)
      | -node <arg>    The node property in the input database (Default: "name"; no-op for the CSV loader)
      | -label <arg>   The nodes' label type in the input database (Default: "Person"; no-op for the CSV loader)
      | -rel <arg>     The relationships' type in the input database (Default: "Relation"; no-op for the CSV loader)
      | -db <arg>      The directory of the input dataset (Default: the GOT CSV fixture)
      | -grid <arg>    Parameter grid: got | smoke | blogcatalog | flickr | grqc | amazon (Default: got)
      | -log <arg>     Result file path (Default: <dbName>_AlgoPerfResults.txt)
      | -seed <arg>    RNG seed for query sampling and walks (Default: 42)
      | -help          Print information about command line inputs.""".stripMargin

  def parse(args: Array[String]): Options = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Options): Options = rest match {
      case Nil => acc
      case "-help" :: t => loop(t, acc.copy(help = true))
      case "-alpha" :: v :: t => loop(t, acc.copy(alpha = v.toDouble))
      case "-eps" :: v :: t => loop(t, acc.copy(epsilon = v.toDouble))
      case "-query" :: v :: t => loop(t, acc.copy(queryNum = v.toInt))
      case "-k" :: v :: t => loop(t, acc.copy(k = v.toInt))
      case "-node" :: v :: t => loop(t, acc.copy(nodeProperty = v))
      case "-label" :: v :: t => loop(t, acc.copy(labelType = v))
      case "-rel" :: v :: t => loop(t, acc.copy(relType = v))
      case "-db" :: v :: t => loop(t, acc.copy(dbDir = v))
      case "-grid" :: v :: t => loop(t, acc.copy(grid = v))
      case "-log" :: v :: t => loop(t, acc.copy(logPath = Some(v)))
      case "-seed" :: v :: t => loop(t, acc.copy(seed = v.toLong))
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown option '$other'\n$usage")
    }
    loop(args.toList, Options())
  }

  def main(args: Array[String]): Unit = {
    val o = parse(args)
    if (o.help) { println(usage); return }
    val hadSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ppr-harness")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val edges = Got.edges(spark, o.dbDir)
      val logPath = o.logPath.getOrElse(
        new java.io.File(o.dbDir).getName + "_AlgoPerfResults.txt")
      GridDriver.run(spark, edges, Grids.byName(o.grid),
        GridDriver.Conf(alpha = o.alpha, queryNum = o.queryNum, k = o.k,
          seed = o.seed, logPath = logPath))
      println(s"AlgoPerfResults written to $logPath")
    } finally if (!hadSession) spark.stop()
  }
}
