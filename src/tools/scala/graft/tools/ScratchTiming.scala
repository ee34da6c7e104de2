package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness for iterating on operator performance (not part of the
  * library surface; driven manually via `runMain graft.tools.ScratchTiming`).
  */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    println(s"[scratch] docs=${docs.count()}")

    time("signatures only") {
      docs.select(Dedup.minhashSignature(col("text"), 5, 128).as("sig"))
        .agg(count(lit(1))).head(); 1L
    }
    time("candidates") {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text").count()
    }
    time("nearDupPairsMinhash e2e") {
      Dedup.nearDupPairsMinhash(docs, "doc_id", "text", 0.9).count()
    }
    if (sys.env.contains("SCRATCH_ALLPAIRS")) time("allPairsJaccard (baseline)") {
      Dedup.allPairsJaccard(docs, "doc_id", "text").filter(col("jaccard") >= 0.9).count()
    }
    spark.stop()
  }
}
