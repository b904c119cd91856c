package graft.harness

import java.io.FileWriter
import java.text.SimpleDateFormat
import java.util.Date

/** S10 — the benchmark log sink: the reference's append-only
  * `<db>_AlgoPerfResults.txt` with timestamp header, `Test N.` section
  * headers, `N.i ALGO` subsections and comma-separated result rows
  * (`Gen_Util.java:329,505-510,538,583`; row shapes from
  * `algo_perf_test`, `:139-142,179,188-203,244-247`).
  *
  * Row shapes (field order exactly as the reference writes them):
  *   - whole-graph, non-prep:  `param,avgMs,avgMaxErr`
  *   - whole-graph, BASE:      `param,threshold,prepMs,prepBytes,avgMs,avgMaxErr`
  *   - top-k, non-BASE:        `param,k,avgMs,avgPrecision,avgNDCG`
  *   - top-k, BASE:            `threshold,k,prepMs,prepBytes,avgMs,avgPrecision,avgNDCG`
  *   - preprocessing suite:    `param,threshold,prepMs,prepBytes,avgMaxErr`
  *     (query time is measured but NOT logged — `Gen_Util.java:243-244`
  *     only writes it when not preprocessed; preserved as-is.)
  */
final class PerfLog(val path: String) {

  private def append(s: String): Unit = {
    val fw = new FileWriter(path, true)
    try fw.write(s) finally fw.close()
  }

  def header(): Unit =
    append(new SimpleDateFormat("yyyy-MM-dd HH:mm:ss").format(new Date()) + "\n")

  def section(title: String): Unit = append(s"\n$title\n")

  def subsection(testIdx: Int, algoIdx: Int, algo: String): Unit =
    append(s"\n$testIdx.$algoIdx $algo\n")

  def wholeGraphRow(param: String, avgMs: Long, avgMaxErr: Double): Unit =
    append(s"$param,$avgMs,$avgMaxErr\n")

  def wholeGraphBaseRow(param: String, threshold: Double, prepMs: Long,
      prepBytes: Long, avgMs: Long, avgMaxErr: Double): Unit =
    append(s"$param,$threshold,$prepMs,$prepBytes,$avgMs,$avgMaxErr\n")

  def topkRow(param: String, k: Int, avgMs: Long, avgPrecision: Double,
      avgNdcg: Double): Unit =
    append(s"$param,$k,$avgMs,$avgPrecision,$avgNdcg\n")

  def topkBaseRow(threshold: Double, k: Int, prepMs: Long, prepBytes: Long,
      avgMs: Long, avgPrecision: Double, avgNdcg: Double): Unit =
    append(s"$threshold,$k,$prepMs,$prepBytes,$avgMs,$avgPrecision,$avgNdcg\n")

  def prepRow(param: String, threshold: Double, prepMs: Long,
      prepBytes: Long, avgMaxErr: Double): Unit =
    append(s"$param,$threshold,$prepMs,$prepBytes,$avgMaxErr\n")
}
