package graft.tools

import org.apache.spark.sql.SparkSession

/** Time an operator-only arm (Queries.operatorArms) by name at a given sf dir
  * — the op/verify adjudication harness for scale-block ratios. Usage:
  * `runMain graft.tools.ScratchOpArm <sfDir> <armName> [n]`
  */
object ScratchOpArm {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.Queries.operatorArms(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).collect()
      println(f"[scratch] $name%-40s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
