package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.WebFunctions

object ScratchUrlCost {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val scheme = when(col("o_orderkey") % 2 === 0, "HTTP").otherwise("HTTPS")
    val port = when(col("o_orderkey") % 2 === 0, ":80").otherwise(":443")
    val tld = when(col("o_custkey") % 5 === 0, ".CO.UK").otherwise(".COM")
    val u = concat(scheme, lit("://WWW.Shop"), (col("o_custkey") % 40).cast("string"),
      tld, port, lit("/items/"), col("o_orderkey").cast("string"),
      lit("/?utm_source=feed&b="), (col("o_orderkey") % 7).cast("string"),
      lit("&a="), (col("o_orderkey") % 3).cast("string"), lit("#frag"))
    val proj = orders.select(WebFunctions.urlNormalize(u).as("norm"), WebFunctions.domainOf(u).as("dom"))
    // struct-once variant: one url_parts per row, fields extracted in a second
    // projection (CollapseProject keeps non-cheap multiply-referenced aliases apart)
    val projOnce = orders.select(WebFunctions.urlParts(u).as("_p"))
      .select(col("_p.norm").as("norm"), col("_p.domain").as("dom"))
    def agg(p: org.apache.spark.sql.DataFrame) =
      p.agg(count(lit(1)), countDistinct(col("norm")), countDistinct(col("dom")),
        min(col("norm")), max(col("norm")), coalesce(sum(length(col("norm"))), lit(0L))).collect()
    // warmup both shapes
    agg(proj); agg(projOnce)
    val tProj = (1 to 3).map(_ => secs { proj.agg(count(col("norm")), count(col("dom"))).collect() }).min
    val tAgg = (1 to 5).map(_ => secs { agg(proj) }).min
    val tAggOnce = (1 to 5).map(_ => secs { agg(projOnce) }).min
    val fanned = orders.repartition(32)
    val projFan = fanned.select(WebFunctions.urlNormalize(u).as("norm"), WebFunctions.domainOf(u).as("dom"))
    val projFanOnce = fanned.select(WebFunctions.urlParts(u).as("_p"))
      .select(col("_p.norm").as("norm"), col("_p.domain").as("dom"))
    agg(projFan); agg(projFanOnce)
    val tFan = (1 to 5).map(_ => secs { agg(projFan) }).min
    val tFanOnce = (1 to 5).map(_ => secs { agg(projFanOnce) }).min
    println(f"[urlcost] projection-only: $tProj%.2f s, full-agg 2-call: $tAgg%.2f s, " +
      f"struct-once: $tAggOnce%.2f s, fanned 2-call: $tFan%.2f s, fanned once: $tFanOnce%.2f s")
    spark.stop()
  }
}
