package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split of dedup_ngram_jaccard at generated sf10: LSH candidate stage vs
  * prefiltered verify stage (iteration harness; not part of the library).
  */
object ScratchNgramSplit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10_gen_v3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (1 to 2).foreach { i =>
      var cand: org.apache.spark.sql.DataFrame = null
      val tCand = secs {
        cand = graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text",
          shingleSize = 6, numHashes = 128, bands = 32).localCheckpoint(true)
      }
      val tVer = secs {
        graft.operators.Dedup.exactJaccard(cand, docs, "doc_id", "text", 6,
            minJaccard = 0.9)
          .filter(col("jaccard") >= 0.9).agg(count(lit(1))).collect()
      }
      println(f"[ngramsplit] run$i lsh-candidates $tCand%.2f s   verify $tVer%.2f s")
      if (i == 1) {
        // docs the kernel touches: all candidate-pair docs vs surviving-pair docs
        val candDocs = cand.select(col("id_a").as("id"))
          .union(cand.select(col("id_b").as("id"))).distinct().count()
        val sizes = docs.filter(col("text").isNotNull)
          .select(col("doc_id"),
            size(graft.operators.Dedup.shingleHashSet(col("text"), 6)).cast("long").as("_n"))
        val surv = cand
          .join(sizes.select(col("doc_id").as("id_a"), col("_n").as("_na")), "id_a")
          .join(sizes.select(col("doc_id").as("id_b"), col("_n").as("_nb")), "id_b")
          .filter(least(col("_na"), col("_nb")).cast("double") >=
            lit(0.9 - 1e-9) * greatest(col("_na"), col("_nb")).cast("double"))
        val survDocs = surv.select(col("id_a").as("id"))
          .union(surv.select(col("id_b").as("id"))).distinct().count()
        println(s"[ngramsplit] candidate docs=$candDocs surviving-pair docs=$survDocs " +
          s"of ${docs.count()} corpus docs")
      }
    }
    spark.stop()
  }
}
