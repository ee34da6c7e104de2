package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time declared queries on the generated sf1/sf10 corpora (the bench's sf10
  * block protocol: full query collect, min of N). Usage:
  * `runMain graft.tools.ScratchSf10Arm <query>[ <query>…] [--n=K]`
  */
object ScratchSf10Arm {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    val names = if (pos.nonEmpty) pos.toSeq else Seq("dedup_ngram_jaccard_documents")
    val n = flags.collectFirst { case f if f.startsWith("--n=") => f.drop(4).toInt }.getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val dirs = Seq("sf1" -> "/tmp/graft_sf1_gen_v3", "sf10" -> "/tmp/graft_sf10_gen_v3")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val t = dirs.map { case (tag, d) =>
        val ts = (1 to n).map(_ => secs { fn(spark, d).collect() })
        println(f"[sf10arm] $name $tag arms ${ts.map(x => f"$x%.2f").mkString(", ")}")
        tag -> ts.min
      }.toMap
      println(f"[sf10arm] $name ratio ${t("sf10") / t("sf1")}%.2fx (sf1 ${t("sf1")}%.2f, sf10 ${t("sf10")}%.2f)")
    }
    spark.stop()
  }
}
