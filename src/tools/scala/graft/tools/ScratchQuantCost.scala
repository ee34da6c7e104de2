package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchQuantCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").filter(col("vec_id").isNotNull)
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def run() = graft.operators.Similarity.quantizationFidelity(embs, "vec_id", "embedding")
      .agg(count(lit(1)), avg(col("max_abs_err")), min(col("cos_fidelity"))).collect()
    run()
    println(f"[quantcost] native: ${(1 to 3).map(_ => secs(run())).min}%.2f s")
    spark.stop()
  }
}
