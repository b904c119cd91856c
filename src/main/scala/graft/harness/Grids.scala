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
    case other => throw new IllegalArgumentException(
      s"unknown grid '$other' (expected: got, smoke)")
  }
}
