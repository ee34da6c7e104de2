package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named `SparkEntry.queries` entries to files
  * (optimization-round plan evidence). Usage:
  * `runMain graft.tools.PlanDump <outDir> <suffix> <queryName>[ <queryName>…]`
  * writes `<outDir>/<query>_<suffix>.txt` per query. With no names, dumps every
  * declared query. sfDir via SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query…]")
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      // "op:<query>" dumps the OPERATOR arm's plan (graft.Queries.operatorArms):
      // queries that localCheckpoint their pair pipeline show only the cheap
      // rollup in their final plan, so the arm is where the pipeline's plan
      // shape is visible (round-15 media evidence).
      val fn =
        if (name.startsWith("op:"))
          graft.Queries.operatorArms.getOrElse(name.drop(3),
            sys.error(s"unknown operator arm ${name.drop(3)}"))
        else SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val fname = name.replace(":", "_")
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case scala.util.control.NonFatal(e) => s"PLAN FAILED: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${fname}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${fname}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
