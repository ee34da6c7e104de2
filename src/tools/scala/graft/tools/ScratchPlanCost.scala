package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does suite20's wall time go: Catalyst planning or execution? (manual) */
object ScratchPlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cached = li.repartition(32).cache(); cached.count()
    (1 to 3).foreach(_ => Bench.suite20(cached))

    def ms(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }

    // Build the same agg the suite builds, but separate planning from execution.
    val aggExprs = Seq(
      count(lit(1)), count(col("l_orderkey")), count(col("l_partkey")), count(col("l_suppkey")),
      count(col("l_quantity")), count(col("l_extendedprice")), count(col("l_discount")),
      count(col("l_tax")),
      sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)),
      sum(when(col("l_linestatus").isin("O", "F"), 1L).otherwise(0L)),
      min(col("l_quantity")), max(col("l_quantity")), avg(col("l_discount")),
      sum(col("l_extendedprice")), stddev_samp(col("l_extendedprice")),
      min(col("l_extendedprice")), max(col("l_tax")),
      sum(when(col("l_returnflag").rlike("^[ANR]$"), 1L).otherwise(0L)),
      sum(when(expr("l_discount >= 0 AND l_discount <= 0.5"), 1L).otherwise(0L)),
      approx_count_distinct(col("l_partkey")))

    (1 to 5).foreach { i =>
      val tBuild = ms { cached.agg(aggExprs.head, aggExprs.tail: _*) }
      val df = cached.agg(aggExprs.head, aggExprs.tail: _*)
      val tPlan = ms { df.queryExecution.executedPlan }
      val tExec = ms { df.queryExecution.executedPlan.executeCollect() }
      val tHead = ms { cached.agg(aggExprs.head, aggExprs.tail: _*).head() }
      val tSuite = ms { Bench.suite20(cached) }
      println(f"[scratch] iter$i build=$tBuild%6.1f plan=$tPlan%6.1f exec=$tExec%6.1f head=$tHead%6.1f suite=$tSuite%6.1f ms")
    }
    cached.unpersist()
    spark.stop()
  }
}
