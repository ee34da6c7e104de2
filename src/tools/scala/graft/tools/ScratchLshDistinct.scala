package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** How much of the sf10 LSH candidate stage is the pair distinct? Measures the
  * pre-distinct join output volume vs the distinct pair count, and times the
  * stage with and without the final distinct (iteration harness).
  */
object ScratchLshDistinct {
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

    def stage(distinctPairs: Boolean): Long = {
      val buckets = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text",
        shingleSize = 6, numHashes = 128, bands = 32)
        .repartition(col("band"), col("bucket"))
      val bounded = buckets
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
        .filter(col("_n") <= 1000)
      val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val joined = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val out = if (distinctPairs) joined.distinct() else joined
      out.count()
    }
    // warm
    stage(distinctPairs = false)
    (1 to 2).foreach { _ =>
      var n1 = 0L; var n2 = 0L
      val tRaw = secs { n1 = stage(distinctPairs = false) }
      val tDist = secs { n2 = stage(distinctPairs = true) }
      println(f"[lshdist] pre-distinct rows=$n1 ($tRaw%.2f s)   distinct rows=$n2 ($tDist%.2f s, +${tDist - tRaw}%.2f)")
    }
    spark.stop()
  }
}
