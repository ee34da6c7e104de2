package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot 10× scale-factor sweep for the LLM-pipeline headliners (manual:
  * `runMain graft.tools.ScratchSweep10x [sfDir]`): replicate documents/embeddings 10×
  * (ids offset per replica — worst case for dedup: every doc gains 9 true dups) and
  * compare wall time against 1× for near-dup dedup, cross-corpus contamination
  * (corpus side scales, probe fixed), and brute-force ANN. Evidence for the
  * reference's 10×-data ⇒ <15×-time bound on the operators whose scaling isn't
  * already pinned by PerfSpec. Prints one [sweep10x] JSON line for PROGRESS.jsonl.
  */
object ScratchSweep10x {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val probeDocs = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("p_id"), col("text").as("p_text")).cache()
    probeDocs.count()
    val probeVec = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toSeq

    def repl(df: DataFrame, idCol: String, k: Int): DataFrame =
      (0 until k).map(i => df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ union _)

    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    def sweep(k: Int): Map[String, Double] = {
      val d = repl(docs, "doc_id", k)
      val e = repl(emb, "vec_id", k)
      Map(
        "neardup" -> secs { Dedup.nearDupPairsMinhash(d, "doc_id", "text", 0.9).count() },
        "contamination" -> secs {
          Dedup.crossCorpusContamination(d, probeDocs, "text", "p_id", "p_text").count()
        },
        "ann_brute" -> secs { Similarity.bruteForceTopK(e, "vec_id", "embedding", probeVec, 10).count() })
    }

    sweep(1) // untimed warmup: codegen + JIT for every kernel
    val t1 = sweep(1)
    val t10 = sweep(10)
    def r(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val parts = t1.keys.toSeq.sorted.map { q =>
      s""""$q":{"x1_sec":${r(t1(q))},"x10_sec":${r(t10(q))},"ratio":${r(t10(q) / t1(q))}}"""
    }
    println(s"""[sweep10x] {"sf":"$sfDir",${parts.mkString(",")}}""")
    spark.stop()
  }
}
