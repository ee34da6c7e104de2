package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-vs-verified accounting for dedup_ngram_jaccard at generated sf1 /
  * sf10: how many LSH candidate pairs reach the verify stage, how many verify at
  * j >= 0.9, and how many would be eliminated by the exact shingle-set-size
  * prefilter j <= min/max (iteration harness; not part of the library).
  */
object ScratchNgramVerify {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf1_gen_v3", "/tmp/graft_sf10_gen_v3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cand = graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 6, numHashes = 128, bands = 32).localCheckpoint(true)
      val nCand = cand.count()
      val ver = graft.operators.Dedup.exactJaccard(cand, docs, "doc_id", "text", 6)
        .localCheckpoint(true)
      val nVer = ver.filter(col("jaccard") >= 0.9).count()
      // size-prefilter potential: join shingle-set sizes, count pairs with
      // min/max < 0.9 (those can never verify)
      val sizes = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(graft.operators.Dedup.shingleHashSet(col("text"), 6)).as("_n"))
      val withSizes = cand
        .join(sizes.select(col("doc_id").as("id_a"), col("_n").as("_na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("_n").as("_nb")), "id_b")
      val killed = withSizes
        .filter(least(col("_na"), col("_nb")).cast("double") <
          lit(0.9) * greatest(col("_na"), col("_nb")).cast("double"))
        .count()
      println(f"[ngramver] $dir candidates=$nCand verified=$nVer sizeKilled=$killed " +
        f"(${100.0 * killed / math.max(1, nCand)}%.1f%% of candidates)")
      // time the verify pass alone on the checkpointed candidates, both paths
      def timeVerify(minJ: Double): Double = (1 to 2).map(_ => secs {
        graft.operators.Dedup.exactJaccard(cand, docs, "doc_id", "text", 6,
            minJaccard = minJ)
          .filter(col("jaccard") >= 0.9)
          .agg(count(lit(1))).collect()
      }).min
      val nFilt = graft.operators.Dedup.exactJaccard(cand, docs, "doc_id", "text", 6,
        minJaccard = 0.9).filter(col("jaccard") >= 0.9).count()
      println(f"[ngramver] $dir verify unfiltered ${timeVerify(0.0)}%.2f s  " +
        f"prefiltered ${timeVerify(0.9)}%.2f s  (filtered-path verified=$nFilt)")
    }
    spark.stop()
  }
}
