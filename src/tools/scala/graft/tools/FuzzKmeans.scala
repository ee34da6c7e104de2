package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch runner for tools/fuzz_kmeans.py: executes the engine half of every
  * k-means-assignment trial in ONE JVM. Directory name encodes k:
  *
  *   kmeans_<i>_k<k>  -> ivfAssign with centroids = first k non-null vectors by vid
  *       inputs  vecs.parquet(vid, v: array<float>)
  *       output  got.parquet(vid, cell)
  *
  * The Python driver replays each trial in DuckDB with the explicit double
  * dot/norm formula (ties to the HIGHEST cell, zero-norm vectors to cell 0 —
  * the ivfAssign contract) and diffs (vid, cell) sets.
  */
object FuzzKmeans {
  def main(args: Array[String]): Unit = {
    val root = new java.io.File(args(0))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val trials = root.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("kmeans_")).sortBy(_.getName)
    var n = 0
    trials.foreach { dir =>
      val k = dir.getName.split("_")(2).stripPrefix("k").toInt
      val vecs = spark.read.parquet(s"${dir.getPath}/vecs.parquet")
        .filter(col("v").isNotNull)
      val seeds = vecs.orderBy("vid").limit(k)
        .select("v").collect().map(_.getSeq[Float](0).toSeq).toSeq
      val out =
        if (seeds.isEmpty) vecs.select(col("vid"), lit(0L).as("cell")).limit(0)
        else graft.operators.Similarity.ivfAssign(vecs, "v", seeds, out = "cell")
          .select(col("vid"), col("cell").cast("long").as("cell"))
      out.write.mode("overwrite").parquet(s"${dir.getPath}/got.parquet")
      n += 1
    }
    println(s"[fuzz] ran $n trials")
    spark.stop()
  }
}
