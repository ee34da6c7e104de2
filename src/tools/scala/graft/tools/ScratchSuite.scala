package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling of the headline 20-constraint suite (manual: `runMain
  * graft.tools.ScratchSuite`).
  */
object ScratchSuite {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def med(name: String, n: Int = 7)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-34s median=${ts.sorted.apply(n / 2)}%6.3f s  min=${ts.min}%6.3f")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm FS metadata

    med("count(*) only") { li.agg(count(lit(1))).head() }
    med("10-col basic aggs") {
      li.agg(count(lit(1)), count(col("l_orderkey")), min(col("l_quantity")),
        max(col("l_quantity")), avg(col("l_discount")), sum(col("l_extendedprice")),
        stddev_samp(col("l_extendedprice")), max(col("l_tax")),
        min(col("l_extendedprice")), count(col("l_partkey"))).head()
    }
    med("+ approx_count_distinct") {
      li.agg(count(lit(1)), approx_count_distinct(col("l_partkey"))).head()
    }
    med("+ regex/when aggs") {
      li.agg(
        sum(when(col("l_returnflag").rlike("^[ANR]$"), 1L).otherwise(0L)),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)),
        sum(when(expr("l_discount >= 0 AND l_discount <= 0.5"), 1L).otherwise(0L))).head()
    }
    med("suite20 full") { Bench.suite20(li) }

    // plan-only cost: analysis + optimization without execution
    med("suite plan only (explain)") {
      val check = Bench.suite20(li) // includes execution; compare vs queryExecution below
    }
    val cached = li.cache(); cached.count()
    med("suite20 on cached input") { Bench.suite20(cached) }
    cached.unpersist()

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    med("count(*) AQE off") { li.agg(count(lit(1))).head() }
    med("suite20 AQE off") { Bench.suite20(li) }
    val c2 = li.cache(); c2.count()
    med("suite20 cached AQE off") { Bench.suite20(c2) }
    c2.unpersist()
    val c3 = li.repartition(32).cache(); c3.count()
    med("suite20 repart32+cached AQE off") { Bench.suite20(c3) }
    med("count(*) repart32+cached AQE off") { c3.agg(count(lit(1))).head() }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    med("suite20 repart32+cached AQE on") { Bench.suite20(c3) }

    // Interleaved A/B: AQE on vs off on the same cached input, alternating runs so JIT
    // warmth doesn't bias either arm.
    val (onTs, offTs) = (1 to 9).map { _ =>
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val t0 = System.nanoTime(); Bench.suite20(c3); val on = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t1 = System.nanoTime(); Bench.suite20(c3); val off = (System.nanoTime() - t1) / 1e9
      (on, off)
    }.unzip
    println(f"[scratch] interleaved AQE on  median=${onTs.sorted.apply(4)}%6.3f min=${onTs.min}%6.3f")
    println(f"[scratch] interleaved AQE off median=${offTs.sorted.apply(4)}%6.3f min=${offTs.min}%6.3f")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
