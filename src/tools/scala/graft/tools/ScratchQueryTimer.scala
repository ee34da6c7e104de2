package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated full-query timing: `runMain graft.tools.ScratchQueryTimer <dir> <name> [n]`
  * in an exclusive JVM — the adjudication ground truth for in-bench readings
  * (the op-arm twin is ScratchOpArm).
  */
object ScratchQueryTimer {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SQP", "32"))
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", sys.env.getOrElse("INITP", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).collect()
      println(f"[scratch] $name%-40s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
