package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 profile: where do contamination_firewall's seconds go at sf0.1 —
  * bloom build vs flag pass vs the query's exact verification arm.
  */
object ScratchFirewall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id").isNotNull)
    val probe = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("p_id"), col("text").as("p_text"))
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val runs = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[fw] $label%-32s median=${runs.sorted.apply(1)}%.2f s  (${runs.map(r => f"$r%.2f").mkString(",")})")
    }
    var bytes: Array[Byte] = null
    time("buildContaminationBloom") {
      bytes = graft.operators.Dedup.buildContaminationBloom(probe, "p_text", 8)
    }
    time("contaminationFlagsBloom") {
      graft.operators.Dedup.contaminationFlagsBloom(docs, bytes, "doc_id", "text", 8)
        .agg(count(lit(1)), sum(col("grams_flagged"))).head()
    }
    time("corpus gram explode only") {
      docs.select(explode(graft.functions.TextFunctions
        .wordShingleHashes(col("text"), 8)).as("_h"))
        .agg(count(lit(1))).head()
    }
    spark.stop()
  }
}
