package graft.harness

/** H5 — parameter grids as data (reference `Gen_Util.java:328-647` keeps
  * five per-dataset grids as commented-in/out array blocks; here each is a
  * value and the driver takes one as input).
  *
  * Algorithms are keyed by the reference's enum spelling, except the
  * library baseline: the reference wraps Neo4j's PageRank
  * (`NEO4J_METHOD`), this engine wraps GraphX — logged as `LIBRARY`.
  */
object Grids {

  /** Algo names in the reference's loop order (`Gen_Util.java:482-502`). */
  val WholeGraphAlgos: Seq[String] =
    Seq("FORA_WHOLE_GRAPH", "FWDPUSH", "LIBRARY", "MC", "BASE_WHOLE_GRAPH")
  val TopkAlgos: Seq[String] =
    Seq("FORA_TOPK", "FWDPUSH", "LIBRARY", "MC", "BASE_WHOLE_GRAPH")
  val PrepAlgos: Seq[String] = WholeGraphAlgos

  /** One test-suite grid: accuracy-param array per non-BASE algo
    * (ε for FORA/MC, rmax for FWDPUSH, iterations for LIBRARY) and the
    * BASE threshold array.
    */
  final case class SuiteGrid(
      params: Map[String, Seq[Double]],
      baseThresholds: Seq[Double])

  final case class Grid(
      wholeGraph: SuiteGrid,
      topk: SuiteGrid,
      prep: SuiteGrid)

  /** The GOT dataset grid — Testset5, `Gen_Util.java:451-478`, verbatim. */
  val Got: Grid = Grid(
    wholeGraph = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(10.0, 5.0, 0.5, 0.1, 0.05),
        "FWDPUSH" -> Seq(1.0e-4, 1.0e-5, 1.0e-6, 1.0e-7, 1.0e-8),
        "LIBRARY" -> Seq(5, 40, 100, 200, 300),
        "MC" -> Seq(1.0, 0.5, 0.3, 0.1, 0.05)),
      baseThresholds = Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-6, 5.0e-7)),
    topk = SuiteGrid(
      params = Map(
        "FORA_TOPK" -> Seq(10.0, 5.0, 0.5, 0.1, 0.05),
        "FWDPUSH" -> Seq(1.0e-4, 1.0e-5, 1.0e-6, 1.0e-7, 1.0e-8),
        "LIBRARY" -> Seq(5, 40, 100, 200, 300),
        "MC" -> Seq(1.0, 0.5, 0.3, 0.1, 0.05)),
      baseThresholds = Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-6, 5.0e-7)),
    prep = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(10.0, 5.0, 0.5, 0.1, 0.05),
        "FWDPUSH" -> Seq(1.0e-4, 1.0e-5, 1.0e-6, 1.0e-7, 1.0e-8),
        "LIBRARY" -> Seq(5, 40, 100, 200, 300),
        "MC" -> Seq(1.0, 0.5, 0.3, 0.1, 0.05)),
      baseThresholds = Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-6, 5.0e-7)))

  /** The four non-GOT dataset grids (Testset1-4,
    * `Gen_Util.java:334-449`), kept verbatim as DATA for parity. The
    * public datasets themselves (BlogCatalog, Flickr, GR-QC, Com-Amazon)
    * are not shipped in this environment, so these are dormant values:
    * point `-db` at a GOT-format CSV export of the dataset and select
    * with `-grid <name>`. GridsSpec pins every array to the reference's.
    */
  val BlogCatalog: Grid = Grid( // Testset1, `Gen_Util.java:334-362`
    wholeGraph = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(50.0, 10.0, 5.0, 1.0, 0.5),
        "FWDPUSH" -> Seq(1.0e-6, 7.0e-7, 5.0e-7, 3.0e-7, 1.0e-7),
        "LIBRARY" -> Seq(1, 5, 10, 40, 100),
        "MC" -> Seq(5.0, 1.0, 0.7, 0.5, 0.3)),
      baseThresholds = Seq(0.001, 7.0e-4, 5.0e-4, 1.0e-4, 5.0e-5)),
    topk = SuiteGrid(
      params = Map(
        "FORA_TOPK" -> Seq(1.0, 0.5, 0.1, 0.05, 0.01),
        "FWDPUSH" -> Seq(1.0e-6, 5.0e-7, 1.0e-7, 5.0e-8, 1.0e-8),
        "LIBRARY" -> Seq(1, 5, 10, 40, 100),
        "MC" -> Seq(5.0, 1.0, 0.5, 0.1, 0.05)),
      baseThresholds = Seq(0.001, 7.0e-4, 5.0e-4, 1.0e-4, 5.0e-5)),
    prep = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(50.0, 10.0, 5.0, 1.0, 0.5),
        "FWDPUSH" -> Seq(1.0e-6, 7.0e-7, 5.0e-7, 3.0e-7, 1.0e-7),
        "LIBRARY" -> Seq(1, 5, 10, 40, 100),
        "MC" -> Seq(5.0, 1.0, 0.7, 0.5, 0.3)),
      baseThresholds = Seq(0.001, 7.0e-4, 5.0e-4, 1.0e-4, 5.0e-5)))

  val Flickr: Grid = Grid( // Testset2, `Gen_Util.java:364-389`
    wholeGraph = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(500.0, 50.0, 10.0, 5.0, 3.0, 1.0, 0.5),
        "FWDPUSH" -> Seq(5.0e-5, 1.0e-6, 5.0e-8, 1.0e-8, 5.0e-9),
        "LIBRARY" -> Seq(1, 5, 10, 40, 100),
        "MC" -> Seq(10.0, 5.0, 1.0, 0.5, 0.3)),
      baseThresholds = Seq(0.005, 0.001, 5.0e-4, 1.0e-4, 7.0e-5)),
    topk = SuiteGrid(
      params = Map(
        "FORA_TOPK" -> Seq(50.0, 10.0, 1.0, 0.1, 0.05),
        "FWDPUSH" -> Seq(5.0e-7, 1.0e-7, 5.0e-8, 1.0e-8, 5.0e-9),
        "LIBRARY" -> Seq(5, 10, 40, 100, 200),
        "MC" -> Seq(5.0, 1.0, 0.3, 0.1, 0.05)),
      baseThresholds = Seq(5.0e-4, 3.0e-4, 1.0e-4, 7.0e-5, 5.0e-5)),
    prep = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(500.0, 200.0, 100.0, 20.0, 10.0),
        "FWDPUSH" -> Seq(5.0e-5, 1.0e-5, 5.0e-6, 1.0e-6, 7.0e-7),
        "LIBRARY" -> Seq(1, 5, 10, 40, 100),
        "MC" -> Seq(20.0, 10.0, 7.0, 5.0, 3.0)),
      baseThresholds = Seq(0.01, 0.005, 0.001, 7.0e-4, 5.0e-4,
        1.0e-4, 7.0e-5, 5.0e-5, 3.0e-5, 1.0e-5)))

  val Grqc: Grid = Grid( // Testset3, `Gen_Util.java:391-419`
    wholeGraph = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(10.0, 5.0, 0.5, 0.1, 0.05),
        "FWDPUSH" -> Seq(1.0e-4, 1.0e-5, 1.0e-6, 1.0e-7, 1.0e-8),
        "LIBRARY" -> Seq(5, 40, 100, 200, 300),
        "MC" -> Seq(1.0, 0.5, 0.3, 0.1, 0.05)),
      baseThresholds = Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-6, 5.0e-7)),
    topk = SuiteGrid(
      params = Map(
        "FORA_TOPK" -> Seq(10.0, 0.5, 0.1, 0.01, 0.001),
        "FWDPUSH" -> Seq(1.0e-4, 1.0e-6, 5.0e-8, 7.0e-9, 7.0e-10),
        "LIBRARY" -> Seq(5, 40, 300, 500, 1000),
        "MC" -> Seq(3.0, 1.0, 0.2, 0.1, 0.05)),
      baseThresholds = Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-7, 5.0e-8)),
    prep = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(10.0, 5.0, 0.5, 0.3, 0.1),
        "FWDPUSH" -> Seq(1.0e-4, 1.0e-5, 1.0e-6, 5.0e-7, 1.0e-7),
        "LIBRARY" -> Seq(5, 40, 100, 200, 300),
        "MC" -> Seq(1.0, 0.5, 0.3, 0.2, 0.1)),
      baseThresholds = Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-6, 5.0e-7)))

  val ComAmazon: Grid = Grid( // Testset4, `Gen_Util.java:421-449`
    wholeGraph = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(50.0, 10.0, 5.0, 3.0, 1.0),
        "FWDPUSH" -> Seq(1.0e-6, 5.0e-7, 3.0e-7, 5.0e-8, 1.0e-8),
        "LIBRARY" -> Seq(1, 5, 10, 40, 100),
        "MC" -> Seq(1.0, 0.7, 0.5, 0.3, 0.1)),
      baseThresholds = Seq(1.0e-4, 5.0e-5, 4.0e-5, 3.0e-5, 2.0e-5)),
    topk = SuiteGrid(
      params = Map(
        "FORA_TOPK" -> Seq(50.0, 10.0, 5.0, 1.0, 0.5),
        "FWDPUSH" -> Seq(5.0e-5, 1.0e-5, 5.0e-6, 1.0e-6, 5.0e-7),
        "LIBRARY" -> Seq(5, 10, 100, 200, 300),
        "MC" -> Seq(10.0, 5.0, 1.0, 0.5, 0.3)),
      baseThresholds = Seq(1.0e-3, 5.0e-4, 1.0e-4, 5.0e-5)),
    prep = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(500.0, 200.0, 70.0, 50.0, 30.0),
        // verbatim from rmax_arr_prep (Gen_Util.java:446) — the reference's
        // array really is non-monotonic (1e-5, 5e-5, 1e-6, ...); do not
        // "fix" the order, GridsSpec pins it.
        "FWDPUSH" -> Seq(1.0e-5, 5.0e-5, 1.0e-6, 5.0e-7, 3.0e-7),
        "LIBRARY" -> Seq(1),
        "MC" -> Seq(50.0, 20.0, 10.0, 7.0, 5.0)),
      baseThresholds = Seq.empty)) // reference's threshold_arr_base_prep = {}

  /** Reduced grid for CI/spec runs: every suite and row shape exercised,
    * minimal point count (one library point — GraphX runs per source).
    */
  val Smoke: Grid = Grid(
    wholeGraph = SuiteGrid(
      params = Map(
        "FORA_WHOLE_GRAPH" -> Seq(0.5),
        "FWDPUSH" -> Seq(1.0e-5),
        "LIBRARY" -> Seq(40),
        "MC" -> Seq(0.5)),
      baseThresholds = Seq(5.0e-5)),
    topk = SuiteGrid(
      params = Map(
        "FORA_TOPK" -> Seq(0.5),
        "FWDPUSH" -> Seq(1.0e-5),
        "MC" -> Seq(0.5)),
      baseThresholds = Seq(5.0e-5)),
    prep = SuiteGrid(
      params = Map(
        "FWDPUSH" -> Seq(1.0e-5),
        "MC" -> Seq(0.5)),
      baseThresholds = Seq(5.0e-5)))

  def byName(name: String): Grid = name match {
    case "got" => Got
    case "smoke" => Smoke
    case "blogcatalog" => BlogCatalog
    case "flickr" => Flickr
    case "grqc" => Grqc
    case "amazon" => ComAmazon
    case other => throw new IllegalArgumentException(
      s"unknown grid '$other' (expected: got, smoke, blogcatalog, flickr," +
        " grqc, amazon)")
  }
}
