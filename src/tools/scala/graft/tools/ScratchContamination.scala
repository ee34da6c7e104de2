package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for cross-corpus contamination (manual:
  * `runMain graft.tools.ScratchContamination`): fixed probe (every 10th doc), corpus
  * replicated K× with texts salted per replica (so corpus size grows but the matched
  * gram set does not). Evidence for the corpus-linear / probe-bounded claim: wall time
  * should grow ~K× at most (one corpus pass) while the matched-hash shuffle stays
  * constant.
  */
object ScratchContamination {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()
    val probe = docs.filter(col("doc_id") % 10 === 0)
    val base = docs.filter(col("doc_id") % 10 =!= 0)

    def corpusTimes(k: Int): DataFrame =
      (0 until k).map { i =>
        // Salt replica texts (i>0) so added corpus volume adds NO new matches —
        // isolates corpus-scan cost from match-volume cost.
        if (i == 0) base
        else base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(lit(s"replica$i "), col("text")).as("text"))
      }.reduce(_ union _)

    Seq(1, 2, 4, 8).foreach { k =>
      val corpus = corpusTimes(k)
      val t0 = System.nanoTime()
      val row = Dedup.crossCorpusContamination(corpus, probe, "text", "doc_id", "text", 8)
        .agg(count(lit(1)), sum(when(col("ngrams_matched") > 0, 1L).otherwise(0L)),
          sum(col("ngrams_matched"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] k=$k corpusDocs=${4500L * k}%7d probes=${row.getLong(0)}%5d " +
        f"contaminated=${row.getLong(1)}%5d matched=${row.getLong(2)}%7d wall=$sec%6.2f s")
    }
    spark.stop()
  }
}
