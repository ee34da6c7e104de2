package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis of the sf10 dedup_ngram_jaccard OOM: how many LSH
  * candidate pairs does the generated 100x corpus produce, and from what
  * bucket-size distribution? (iteration harness; not part of the library)
  */
object ScratchNgramSf10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10_gen_v2")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[scratch] docs=${docs.count()}")
    val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text",
      shingleSize = 6, numHashes = 128, bands = 32)
    val sizes = idx.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    sizes.agg(count(lit(1)).as("buckets"), max(col("n")).as("max_n"),
      sum(col("n") * (col("n") - 1) / 2).as("intra_pairs")).show(false)
    sizes.filter(col("n") > 100).agg(count(lit(1)).as("big_buckets"),
      sum(col("n") * (col("n") - 1) / 2).as("big_pairs")).show(false)
    // what the maxBucketSize=1000 guard actually lets through
    sizes.filter(col("n") <= 1000).agg(
      sum(col("n") * (col("n") - 1) / 2).as("surviving_pairs")).show(false)
    // exact-dup structure of the generated corpus
    docs.groupBy("text").agg(count(lit(1)).as("g"))
      .agg(count(lit(1)).as("distinct_texts"), max(col("g")).as("max_group"),
        sum(col("g") * (col("g") - 1) / 2).as("equal_text_pairs")).show(false)
    spark.stop()
  }
}
