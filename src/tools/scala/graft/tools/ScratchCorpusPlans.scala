package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan review for the round-6 corpus-stats/splits operators. */
object ScratchCorpusPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n[plan] ================ $name ================")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    show("bigramSurprisal")(graft.operators.CorpusStats.bigramSurprisal(docs, "doc_id", "text"))
    show("tfIdfTopTerms")(graft.operators.CorpusStats.tfIdfTopTerms(docs, "doc_id", "text", 3))
    show("collocationsPmi")(graft.operators.CorpusStats.collocationsPmi(docs, "doc_id", "text", 20))
    spark.stop()
  }
}
