package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time individual `SparkEntry.queries` entries by name (iteration harness; not part of
  * the library surface). Usage:
  * `runMain graft.tools.QueryTime <sfDir> <queryName>[ <queryName>…] [--n=K]`
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (pos.length > 1) pos.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val n = flags.collectFirst { case f if f.startsWith("--n=") => f.drop(4).toInt }.getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        // collect, not count: count() over lazy aggregates prunes the agg work away
        val collected = fn(spark, sfDir).collect()
        println(f"[scratch] $name%-36s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=${collected.length}")
        if (flags.contains("--show")) collected.take(5).foreach(r => println(s"[scratch]   $r"))
      }
    }
    spark.stop()
  }
}
