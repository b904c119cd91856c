package graft.harness

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.scalatest.Tag
import scala.io.Source

/** Tag for long-running suites excluded from the default `sbt test` run
  * (build.sbt passes `-l graft.SlowTest` unless GRAFT_SLOW is set). Run
  * with `GRAFT_SLOW=1 sbt "testOnly graft.harness.FullGridSpec"`.
  */
object SlowTest extends Tag("graft.SlowTest")

/** The reference's ACTUAL top-level entry point, end to end: the complete
  * 3-suite GOT parameter grid (`algo_perf_batch_test`,
  * `Gen_Util.java:451-478,504-645`) at the reference defaults
  * (queryNum=50, k=10, α=0.15, seed=42) — 5 points per algorithm family
  * per suite, BASE threshold sweeps included. The produced AlgoPerfResults
  * log must match the committed full-grid golden after the
  * environment-dependent fields are normalized ([[GoldenLog]]).
  *
  * ~7 min on local[32] (the preprocessing suite preps every algorithm's
  * store for all 107 GOT nodes per grid point), hence tagged
  * [[SlowTest]]; the smoke grid in [[HarnessSpec]] stays the CI default.
  */
class FullGridSpec extends SparkSpec {

  test("Main end-to-end: full GOT grid matches the committed golden log",
      SlowTest) {
    spark // force the shared session so Main reuses it
    val log = Files.createTempDirectory("fullgrid").toString + "/got_perf.txt"
    Main.main(Array("-grid", "got", "-log", log))

    val produced = GoldenLog.normalize(
      Source.fromFile(log).getLines().toSeq.filter(_.nonEmpty))
    val golden = Source.fromInputStream(
        getClass.getResourceAsStream("/got_full_golden.txt"))
      .getLines().toSeq.filter(_.nonEmpty)
    assert(produced == golden,
      s"normalized full-grid log differs\nproduced:\n${produced.mkString("\n")}")
    Files.deleteIfExists(Paths.get(log))
  }
}
