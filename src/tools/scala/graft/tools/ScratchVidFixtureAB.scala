package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the video-dedup query over the single-file vs splittable
  * (one-file-per-core) clip fixture layouts. `runMain graft.tools.ScratchVidFixtureAB`.
  */
object ScratchVidFixtureAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    val oldFix = "/tmp/graft_bench_vid_7418e66b_5000_df4bf6c9a8611bb2"
    val newFix = "/tmp/graft_bench_vid_7418e66b_5000_df4bf6c9a8611bb2_p32"
    val nDocs = 5000L
    val guard = math.max(10000L, nDocs / 37 * 2 + 16).min(Int.MaxValue).toInt

    def fullQuery(media: DataFrame): Unit = {
      import graft.operators.Multimodal
      val pairs = Multimodal.nearDupPairsVideo(media, "doc_id", "clip",
        maxHamming = 3, minMatchingFrames = 2, maxBucketSize = guard)
        .localCheckpoint(true)
      val dropped = pairs.select(col("id_b")).distinct()
        .agg(count(lit(1)).as("_n_dropped"))
      val nClips = media.agg(count(lit(1)).as("n_clips"))
      val out = pairs.agg(
          count(lit(1)).as("n_pairs"),
          bool_and(pmod(col("id_a"), lit(37)) === pmod(col("id_b"), lit(37)))
            .as("same_seed_ok"),
          bool_and(col("matching_frames") === lit(2) + pmod(col("id_a"), lit(37)) % 2 &&
            col("min_hamming") === 0).as("frames_ok"))
        .crossJoin(nClips).crossJoin(dropped)
        .select(col("n_clips"), col("n_pairs"), col("same_seed_ok"),
          col("frames_ok"), (col("n_clips") - col("_n_dropped")).as("kept"))
      out.collect()
    }
    def opOnly(media: DataFrame): Unit = {
      import graft.operators.Multimodal
      Multimodal.nearDupPairsVideo(media, "doc_id", "clip",
        maxHamming = 3, minMatchingFrames = 2, maxBucketSize = guard)
        .agg(count(lit(1))).collect()
    }

    val oldDf = spark.read.parquet(oldFix)
    val newDf = spark.read.parquet(newFix)
    // warmups
    fullQuery(oldDf); fullQuery(newDf); opOnly(oldDf); opOnly(newDf)
    (1 to 3).foreach { _ =>
      val a = secs { fullQuery(oldDf) }
      val b = secs { fullQuery(newDf) }
      val c = secs { opOnly(oldDf) }
      val e = secs { opOnly(newDf) }
      println(f"[vidab] full old $a%6.2f s   full new $b%6.2f s   op old $c%6.2f s   op new $e%6.2f s")
    }
    spark.stop()
  }
}
