package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase breakdown of the suite20_cold arm (fresh JVM each run): session build,
  * parquet read, constraint-suite plan analysis, first execution, second execution.
  * `runMain graft.tools.ScratchColdProfile [sfDir]`.
  */
object ScratchColdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    def mark(label: String, since: Long): Long = {
      val now = System.nanoTime()
      println(f"[coldprof] $label%-28s ${(now - since) / 1e9}%6.2f s (total ${(now - t0) / 1e9}%6.2f)")
      now
    }
    var t = t0
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t = mark("session build", t)
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t = mark("read.parquet (lazy)", t)
    // constraint construction only
    val report1 = {
      val c = graft.Bench.suite20(lineitem)
      t = mark("suite20 first run", t)
      c
    }
    require(report1.metrics.totalConstraints == 20)
    graft.Bench.suite20(lineitem)
    t = mark("suite20 second run", t)
    graft.Bench.suite20(lineitem)
    t = mark("suite20 third run", t)
    spark.stop()
  }
}
