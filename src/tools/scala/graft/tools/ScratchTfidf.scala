package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off measurement (round 8): tfIdfTopTerms' deliberate two-pass corpus scan vs
  * localCheckpointing the tf frame, at sf0.1 and the synthetic 10x. Decides whether
  * CorpusStats.scala:47's documented trade holds at scale.
  */
object ScratchTfidf {
  private def variant(df: DataFrame, checkpoint: Boolean): DataFrame = {
    import graft.functions.TextFunctions
    val base = df.filter(col("doc_id").isNotNull && col("text").isNotNull)
    val toks = base.select(col("doc_id").as("_id"),
      explode(TextFunctions.tokens(col("text"))).as("token"))
    val tf0 = toks.groupBy(col("_id"), col("token")).agg(count(lit(1)).as("tf"))
    val tf = if (checkpoint) tf0.localCheckpoint(true) else tf0
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df_docs"))
    val nDocs = base.agg(countDistinct(col("doc_id")).as("_n"))
    val w = Window.partitionBy(col("_id")).orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, "token").crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") *
        (log((col("_n").cast("double") + 1.0) / (col("df_docs").cast("double") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = s"/tmp/graft-sf1-tfidf"
    if (!new java.io.File(s"$out/documents.parquet").exists())
      ScaleSweep.build10x(spark, src, out)
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    for (dir <- Seq(src, out); cp <- Seq(false, true)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      time(variant(docs, cp).collect()) // warmup
      val runs = (1 to 3).map(_ => time(variant(docs, cp).collect()))
      println(f"[tfidf] dir=$dir cp=$cp median=${runs.sorted.apply(1)}%.2f s runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
