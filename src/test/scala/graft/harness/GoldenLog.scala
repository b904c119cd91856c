package graft.harness

/** Shared golden-log normalization for the AlgoPerfResults comparisons
  * (HarnessSpec smoke grid, FullGridSpec complete GOT grid): volatile
  * fields — the timestamp line, per-row durations, store sizes — are
  * replaced by TS/T/B placeholders; every deterministic field (params,
  * thresholds, k, precision, NDCG, max-err, section structure) is kept
  * verbatim. Row shapes are keyed by (test number, field count) exactly as
  * documented in [[PerfLog]].
  */
object GoldenLog {

  def normalize(lines: Seq[String]): Seq[String] = {
    var testNo = 0
    lines.map { line =>
      if (line.matches("""\d{4}-\d{2}-\d{2} .*""")) "TS"
      else if (line.startsWith("Test ")) {
        testNo = line.stripPrefix("Test ").takeWhile(_.isDigit).toInt
        line
      } else if (line.contains(",") && !line.matches("""\d\.\d .*""")) {
        val f = line.split(",", -1)
        (testNo, f.length) match {
          case (1, 3) => f(1) = "T"
          case (1, 6) => f(2) = "T"; f(3) = "B"; f(4) = "T"
          case (2, 5) => f(2) = "T"
          case (2, 7) => f(2) = "T"; f(3) = "B"; f(4) = "T"
          case (3, 5) => f(2) = "T"; f(3) = "B"
          case other => sys.error(s"unexpected row shape $other: $line")
        }
        f.mkString(",")
      } else line
    }
  }
}
