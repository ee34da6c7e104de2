package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing breakdown of the profiler passes (iteration harness). */
object ScratchProfiler {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
    secs("count")(df.count())
    secs("pass1 agg")(df.agg(
      count(lit(1)), count(col("c_acctbal")),
      approx_count_distinct(col("c_acctbal"), 0.01),
      min(col("c_acctbal")).cast("double"), max(col("c_acctbal")).cast("double"),
      avg(col("c_acctbal")), stddev_samp(col("c_acctbal"))).head())
    secs("pass1 agg again")(df.agg(
      count(lit(1)), count(col("c_acctbal")),
      approx_count_distinct(col("c_acctbal"), 0.01),
      min(col("c_acctbal")).cast("double"), max(col("c_acctbal")).cast("double"),
      avg(col("c_acctbal")), stddev_samp(col("c_acctbal"))).head())
    secs("acd only rsd=0.01")(df.agg(approx_count_distinct(col("c_acctbal"), 0.01)).head())
    secs("acd only rsd=0.05")(df.agg(approx_count_distinct(col("c_acctbal"), 0.05)).head())
    secs("quantiles acc=10000")(df.agg(
      percentile_approx(col("c_acctbal"), array(Seq(0.25, 0.5, 0.75, 0.9, 0.99).map(lit): _*),
        lit(10000))).head())
    secs("quantiles acc=10000 again")(df.agg(
      percentile_approx(col("c_acctbal"), array(Seq(0.25, 0.5, 0.75, 0.9, 0.99).map(lit): _*),
        lit(10000))).head())
    secs("quantiles acc=1000")(df.agg(
      percentile_approx(col("c_acctbal"), array(Seq(0.25, 0.5, 0.75, 0.9, 0.99).map(lit): _*),
        lit(1000))).head())
    secs("full profile")(new graft.analyzers.ColumnProfiler()
      .profile(df, Seq("c_acctbal")))
    secs("full profile again")(new graft.analyzers.ColumnProfiler()
      .profile(df, Seq("c_acctbal")))
    spark.stop()
  }
}
