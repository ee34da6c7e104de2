package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Same-JVM A/B of the scan fan-out on the tokenize-heavy corpus-stats shape:
  * replicates tfIdfTopTerms' body with the source either raw (one-task scan) or
  * repartitioned to core count. `runMain graft.tools.ScratchFanAB [sfDir]`.
  */
object ScratchFanAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    val base0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)

    def tfidf(base: DataFrame): Unit = {
      val toks = base.select(col("doc_id").as("_id"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("_id"), col("token")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df_docs"))
      val nDocs = base.agg(countDistinct(col("doc_id")).as("_n"))
      val w = Window.partitionBy(col("_id")).orderBy(col("score").desc, col("token").asc)
      val out = tf.join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf").cast("double") *
          (log((col("_n").cast("double") + 1.0) / (col("df_docs").cast("double") + 1.0)) + 1.0))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
      out.write.format("noop").mode("overwrite").save()
    }

    // warmups (both shapes compile)
    tfidf(base0); tfidf(base0.repartition(32))
    (1 to 4).foreach { _ =>
      val a = secs { tfidf(base0) }
      val b = secs { tfidf(base0.repartition(32)) }
      println(f"[fanab] tfidf raw-scan $a%6.2f s   fanned $b%6.2f s")
    }
    spark.stop()
  }
}
