package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage breakdown of the minhash near-dup pipeline (iteration harness). */
object ScratchMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    secs("docs.count")(docs.count())
    (1 to 3).foreach { i =>
      secs(s"candidates only #$i")(
        Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    }
    (1 to 3).foreach { i =>
      secs(s"full pairs #$i")(
        Dedup.nearDupPairsMinhash(docs, "doc_id", "text", 0.9).count())
    }
    (1 to 2).foreach { i =>
      secs(s"near kept #$i")(
        Dedup.dedupNearMinhash(docs, "doc_id", "text", 0.9).count())
    }
    spark.stop()
  }
}
