package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Exclusive-JVM profile pair for the sf10 suite20 block-worst ratio (round-15
  * verdict item 4): suite20 over generated sf1 vs sf10 lineitem, AQE off (the
  * bench's warm-suite config), min of N, with per-run stage spill / peak
  * execution memory from a listener. `runMain graft.tools.ScratchSuiteSf10 [n]`
  */
object ScratchSuiteSf10 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          peak.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def arm(tag: String, dir: String): Double = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      (1 to 2).foreach(_ => graft.Bench.suite20(li)) // codegen + page-cache warmup
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        require(graft.Bench.suite20(li).metrics.totalConstraints == 20)
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500)
      println(f"[suitesf10] $tag runs ${ts.map(t => f"$t%.3f").mkString(", ")} " +
        f"min=${ts.min}%.3f median=${ts.sorted.apply(n / 2)}%.3f " +
        f"cumSpillMB=${spill.get / 1e6}%.1f peakStageMemMB=${peak.get / 1e6}%.1f")
      ts.min
    }
    val s1 = arm("sf1 ", "/tmp/graft_sf1_gen_v3")
    val s10 = arm("sf10", "/tmp/graft_sf10_gen_v3")
    println(f"[suitesf10] ratio ${s10 / s1}%.2fx (sf1 $s1%.3f, sf10 $s10%.3f)")
    spark.stop()
  }
}
