package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke + scaling check for the round-15 cpu_scaling_minhash_kernel bench arm:
  * times Queries.cpuScalingKernelArm at a given core count.
  * `runMain graft.tools.ScratchCpuArm <cores> [sfDir] [n]`
  */
object ScratchCpuArm {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val row = graft.Queries.cpuScalingKernelArm(spark, dir).collect().head
      println(f"[cpuarm] cores=$cores run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        s"sig_check=${row.getLong(0)}")
    }
    spark.stop()
  }
}
