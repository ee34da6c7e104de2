package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the near-dup pipeline (manual: `runMain graft.tools.ScratchScale`):
  * replicate the documents corpus K× (ids offset per replica so replicas ARE near-dups
  * of each other — the worst realistic case: every doc gains K-1 true duplicates) and
  * measure wall time + candidate-pair counts at each K. Evidence for the subquadratic
  * claim: candidates and time should grow ~K× (pair groups grow K²-per-bucket, but the
  * bucket-size guard and banding keep the joined volume proportional to true dups).
  */
object ScratchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()

    def replicate(k: Int): DataFrame =
      (0 until k).map(i => docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("text"))).reduce(_ union _)

    Seq(1, 2, 4, 8).foreach { k =>
      val corpus = replicate(k)
      val t0 = System.nanoTime()
      // candidate stage only first (the potentially quadratic part), then full verify
      val cands = Dedup.minhashCandidatePairs(corpus, "doc_id", "text").count()
      val t1 = System.nanoTime()
      val verified = Dedup.nearDupPairsMinhash(corpus, "doc_id", "text", 0.9).count()
      val t2 = System.nanoTime()
      println(f"[scale] k=$k docs=${n * k}%7d cand=$cands%9d verified=$verified%9d " +
        f"candSec=${(t1 - t0) / 1e9}%6.2f verifySec=${(t2 - t1) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
