package graft.harness

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import scala.io.Source

/** Dev utility: regenerate the committed golden logs after an intentional
  * semantic change to a grid algorithm (run via
  * `sbt "Test/runMain graft.harness.RegenGoldens"`; review the diff before
  * committing — every non-volatile field change must be explainable).
  */
object RegenGoldens {
  def main(args: Array[String]): Unit = {
    SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate().sparkContext.setLogLevel("WARN")
    val res = "src/test/resources"
    def regen(mainArgs: Array[String], out: String): Unit = {
      val log = Files.createTempDirectory("regen").toString + "/log.txt"
      Main.main(mainArgs :+ "-log" :+ log)
      // keep blank lines: the committed goldens preserve the reference
      // log's section spacing (the specs filter nonEmpty on both sides).
      val norm = GoldenLog.normalize(Source.fromFile(log).getLines().toSeq)
      Files.write(Paths.get(s"$res/$out"),
        (norm.mkString("\n") + "\n").getBytes)
      println(s"wrote $res/$out (${norm.size} lines)")
    }
    regen(Array("-query", "2", "-k", "5", "-grid", "smoke"),
      "got_smoke_golden.txt")
    regen(Array("-grid", "got"), "got_full_golden.txt")
  }
}
