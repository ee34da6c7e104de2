package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Verifies the round-3 leak fix: dedup pipelines must leave NO cached blocks behind
  * and the candidate-pair plan must reuse one exchange for all bucket consumers.
  */
object ScratchLeak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
    val docs = if (sys.env.contains("GRAFT_CACHE_INPUT")) docs0.cache() else docs0

    val pairs = Dedup.nearDupPairsMinhash(docs, "doc_id", "text", 0.8)
    println("pairs=" + pairs.collect().length)
    // collect() runs on the DataFrame's own QueryExecution, so this is the final
    // adaptive plan of the execution that actually ran.
    val post = pairs.queryExecution.executedPlan.toString
    println("POST-REUSE=" + post.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("ReusedQueryStage") || l.contains("reuses")))
    println("POST-SCANS=" + post.linesIterator.count(_.contains("documents.parquet")))
    new java.io.PrintWriter("/tmp/plan.txt") { write(post); close() }
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", 0.8)
    println("clusters=" + clusters.count())
    val kept = Dedup.dedupNearMinhash(docs, "doc_id", "text", 0.8)
    println("kept=" + kept.count())

    val cachedRdds = spark.sparkContext.getPersistentRDDs
    println("PERSISTED-AFTER=" + cachedRdds.size +
      cachedRdds.values.map(r => s" [${r.id}:${r.getStorageLevel.description}]").mkString)
    spark.stop()
  }
}
