package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 warm-path audit (VERDICT finding: suite20_warm 0.67 s vs 0.141 s cached —
  * what is the scan paying, and would a different physical layout move it?).
  */
object ScratchWarmScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1/lineitem.parquet"

    println("[warm] layout audit of sf0.1 lineitem:")
    graft.sources.Sources.parquetLayoutAudit(spark, src).collect().foreach { r =>
      println(f"[warm]   ${r.getString(0).split('/').last}%-40s ${r.getLong(1)}%10d B  groups=${r.getLong(2)} rows=${r.getLong(3)} grpRows=[${r.getLong(4)},${r.getLong(5)}] comp=${r.getLong(6)} uncomp=${r.getLong(7)}")
    }

    def median(runs: Seq[Double]): Double = runs.sorted.apply(runs.size / 2)
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def measure(label: String, path: String, conf: Map[String, String] = Map.empty): Unit = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = spark.read.parquet(path)
      (1 to 3).foreach(_ => graft.Bench.suite20(df)) // warmup
      val suiteRuns = (1 to 7).map(_ => time(graft.Bench.suite20(df)))
      // scan-only proxy: a single global agg forcing every suite20 input column
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
      def scanOnly(): Unit = {
        val d = spark.read.parquet(path)
        d.agg(count(col(cols.head)), cols.drop(1).map(c => count(col(c))): _*).head()
      }
      (1 to 3).foreach(_ => scanOnly())
      val scanRuns = (1 to 7).map(_ => time(scanOnly()))
      println(f"[warm] $label%-46s suite=${median(suiteRuns)}%.3f s  scan9col=${median(scanRuns)}%.3f s")
      conf.keys.foreach(k => spark.conf.unset(k))
    }

    measure("as-shipped", src)
    measure("as-shipped, 32MiB maxPartitionBytes", src,
      Map("spark.sql.files.maxPartitionBytes" -> (32L * 1024 * 1024).toString))
    measure("as-shipped, 16MiB maxPartitionBytes", src,
      Map("spark.sql.files.maxPartitionBytes" -> (16L * 1024 * 1024).toString))

    // Rewritten layouts (testdata is read-only; measure what a different layout WOULD buy)
    val base = spark.read.parquet(src)
    for ((nFiles, grpRows) <- Seq((32, 1 << 20), (32, 1 << 17), (8, 1 << 18))) {
      val out = s"/tmp/warm_li_${nFiles}_$grpRows"
      if (!new java.io.File(out).exists())
        base.repartition(nFiles).write
          .option("parquet.block.size", (grpRows.toLong * 110).toString) // ~bytes per group
          .mode("overwrite").parquet(out)
      measure(s"rewritten files=$nFiles blk=${grpRows * 110 / 1024 / 1024}MiB", out)
    }
    spark.stop()
  }
}
