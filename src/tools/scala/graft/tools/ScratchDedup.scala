package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash near-dup pipeline (iteration harness). */
object ScratchDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"[scratch] ---- round $round ----")
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val target = spark.sparkContext.defaultParallelism
      val fan = time("fanOut check")(
        if (docs.rdd.getNumPartitions >= target) docs else docs.repartition(target))

      val sig = fan.select(col("doc_id").as("id"),
        Dedup.minhashSignature(col("text"), 5, 128).as("_sig"))
      time("signature pass (count)")(sig.count())

      val buckets = sig
        .select(col("id"), explode(Dedup.lshBuckets(col("_sig"), 16, 8)).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("buckets persist+count")(buckets.count())

      val oversized = buckets.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1000)
        .select(col("band"), col("bucket"))
      val bounded = buckets.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
      val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val cands = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      time("candidate join+distinct (count)")(cands.count())

      val sh = fan.select(col("doc_id").as("_jid"), Dedup.shingleHashSet(col("text"), 5).as("_sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("shingle persist+count")(sh.count())

      time("verify joins (count)")(cands
        .join(sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "_sh_a"), "id_a")
        .join(sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "_sh_b"), "id_b")
        .count())

      time("whole nearDupPairsMinhash (count)")(
        Dedup.nearDupPairsMinhash(docs, "doc_id", "text", 0.9).count())
      buckets.unpersist(); sh.unpersist()
    }
    spark.stop()
  }
}
