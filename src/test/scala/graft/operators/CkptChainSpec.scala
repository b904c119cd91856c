package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CkptChainSpec extends SparkSpec {

  /** One Scc-containStep-shaped generation: the state frame is joined
    * THREE times, so carried sizeInBytes stats roughly double in digit
    * count per generation (join stats multiply child sizes).
    */
  private def step(e: DataFrame, st: DataFrame): DataFrame = {
    val contrib = e.join(st.select(col("id").as("dst"), col("r").as("ur")),
        Seq("dst"))
      .select(col("src").as("id"), col("ur"))
    val filt = contrib.join(st.select(col("id"), col("c")), Seq("id"))
      .groupBy("id").agg(max(col("ur")).as("nr"))
    st.join(filt, Seq("id"), "left")
      .select(col("id"), col("c"), coalesce(col("r"), col("nr")).as("r"))
  }

  test("localCheckpoint carries sizeInBytes stats, so a self-joining " +
      "superstep grows them exponentially — resetStats pins them flat") {
    val s = spark
    import s.implicits._
    val e = (0L until 100L).map(i => (i, (i + 1) % 100))
      .toDF("src", "dst").localCheckpoint(true)
    val st0 = (0L until 100L).map(i => (i, i, Option.empty[Long]))
      .toDF("id", "c", "r")
    def bitsOf(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.toString(2).length

    // default chain: carried stats — digit count grows ~2× per generation
    val plain = new CkptChain(s.sparkContext)
    var stP = plain(st0)
    val growth = (1 to 6).map { _ =>
      stP = plain(step(e, stP)); bitsOf(stP)
    }
    assert(growth.last > growth.head * 8,
      s"expected exponential carried-stats growth, got $growth")
    plain.releaseAll()

    // resetStats chain: every generation plans as a fresh leaf — bounded
    val fresh = new CkptChain(s.sparkContext, resetStats = true)
    var stF = fresh(st0)
    val flat = (1 to 6).map { _ =>
      stF = fresh(step(e, stF)); bitsOf(stF)
    }
    assert(flat.distinct.size == 1 && flat.head <= 64,
      s"resetStats generations must plan as fresh bounded leaves: $flat")
    // and the data itself is untouched by the re-wrap
    assert(stF.count() == 100L)
    fresh.releaseAll()
  }
}
