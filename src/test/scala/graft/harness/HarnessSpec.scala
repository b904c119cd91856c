package graft.harness

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.io.Source

/** H1/H2/H4/H5/S10 end to end: the CLI main drives the smoke grid on the
  * reference's own GOT fixture with fixed seeds, and the produced
  * AlgoPerfResults log matches a golden file after the environment-
  * dependent fields (timestamp, durations, store bytes) are normalized —
  * every deterministic field (params, thresholds, k, precision, NDCG,
  * max-err, section structure) is compared verbatim.
  */
class HarnessSpec extends SparkSpec {

  test("query sampler is seeded, in-range, with replacement (H2)") {
    val a = QuerySampler.denseIndices(107, 50, seed = 42L)
    val b = QuerySampler.denseIndices(107, 50, seed = 42L)
    assert(a == b)
    assert(a.forall(i => i >= 0 && i < 107))
    assert(QuerySampler.denseIndices(107, 50, seed = 43L) != a)
    // with replacement: 50 draws from 107 values collide w.h.p.
    assert(QuerySampler.denseIndices(10, 100, 1L).distinct.length <= 10)
  }

  test("CLI parser: reference defaults, all eight options, help, errors (H1)") {
    val d = Main.parse(Array.empty)
    assert(d.alpha == 0.15 && d.epsilon == 0.5 && d.queryNum == 50 &&
      d.k == 10 && d.nodeProperty == "name" && d.labelType == "Person" &&
      d.relType == "Relation" && !d.help)
    val o = Main.parse(Array("-alpha", "0.2", "-eps", "1.0", "-query", "7",
      "-k", "3", "-node", "title", "-label", "Page", "-rel", "LINKS",
      "-db", "/some/dir", "-grid", "smoke", "-seed", "7"))
    assert(o.alpha == 0.2 && o.epsilon == 1.0 && o.queryNum == 7 &&
      o.k == 3 && o.nodeProperty == "title" && o.labelType == "Page" &&
      o.relType == "LINKS" && o.dbDir == "/some/dir" &&
      o.grid == "smoke" && o.seed == 7L)
    assert(Main.parse(Array("-help")).help)
    intercept[IllegalArgumentException](Main.parse(Array("-bogus")))
    intercept[IllegalArgumentException](Grids.byName("nope"))
  }

  test("Main end-to-end: seeded GOT smoke grid matches the golden log " +
      "(H1+H4+H5+S10)") {
    spark // force the shared session so Main reuses it
    val log = Files.createTempDirectory("harness").toString + "/got_perf.txt"
    Main.main(Array("-query", "2", "-k", "5", "-grid", "smoke", "-log", log))

    val produced = GoldenLog.normalize(
      Source.fromFile(log).getLines().toSeq.filter(_.nonEmpty))
    val golden = Source.fromInputStream(
        getClass.getResourceAsStream("/got_smoke_golden.txt"))
      .getLines().toSeq.filter(_.nonEmpty)
    assert(produced == golden,
      s"normalized log differs\nproduced:\n${produced.mkString("\n")}")
    Files.deleteIfExists(Paths.get(log))
  }
}
