package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate why MultiQuantileConstraint's exact percentile is slower than the same
  * three-percentile agg written directly (manual: `runMain graft.tools.ScratchQuantile`).
  */
object ScratchQuantile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    def direct() = li.agg(
      expr("percentile(l_extendedprice, 0.25)"),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.75)")).head()

    def viaSuite() = {
      import graft.constraints._
      import graft.core._
      val ge0 = Assertion.GreaterThanOrEqual(0.0)
      ValidationSuite.evaluateBatched(li, Seq(MultiQuantileConstraint("l_extendedprice",
        Seq(0.25 -> ge0, 0.5 -> ge0, 0.75 -> ge0), QuantileMethod.Exact)))
    }

    def viaConstraintEvaluate() = {
      import graft.constraints._
      import graft.core._
      val ge0 = Assertion.GreaterThanOrEqual(0.0)
      MultiQuantileConstraint("l_extendedprice",
        Seq(0.25 -> ge0, 0.5 -> ge0, 0.75 -> ge0), QuantileMethod.Exact).evaluate(li)
    }

    direct(); viaSuite(); viaConstraintEvaluate() // warmup
    (1 to 3).foreach { i =>
      println(f"[scratch] run$i direct=${secs(direct())}%5.2f suite=${secs(viaSuite())}%5.2f " +
        f"evaluate=${secs(viaConstraintEvaluate())}%5.2f")
    }
    // count() vs head(): does ColumnPruning drop the percentile work under count()?
    val cols = Seq(
      expr("percentile(l_extendedprice, 0.25)").as("g0"),
      expr("percentile(l_extendedprice, 0.5)").as("g1"),
      expr("percentile(l_extendedprice, 0.75)").as("g2"))
    def agg() = li.agg(cols.head, cols.drop(1): _*)
    (1 to 2).foreach { i =>
      println(f"[scratch] count$i=${secs(agg().count())}%5.2f head$i=${secs(agg().head())}%5.2f")
    }
    println("[scratch] head plan:\n" + agg().queryExecution.executedPlan.toString.take(1200))
    val cdf = agg().groupBy().count()
    println("[scratch] count-shaped optimized logical:\n" +
      cdf.queryExecution.optimizedPlan.toString.take(1200))
    spark.stop()
  }
}
