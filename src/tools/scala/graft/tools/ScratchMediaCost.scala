package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Arm-by-arm cost of the video/image dedup pipeline over the stored media
  * fixture: fixture read+count, frame-hash kernel (1-task vs fanned), banded
  * pairs, full query. `runMain graft.tools.ScratchMediaCost [sfDir]`.
  */
object ScratchMediaCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Multimodal

    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Rebuild the fixture exactly as Queries does (p32 layout)
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id").isNotNull)
    val fix = "/tmp/graft_mediacost_vid"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val mkU = udf((id: Long) => {
        val seed = ((id % 37) + 37) % 37
        Multimodal.MediaCodecs.encodeAnimatedGif(16, 12, (2 + seed % 2).toInt, seed)
      })
      docs.select(col("doc_id"), mkU(col("doc_id")).as("clip"))
        .repartition(par).write.mode("overwrite").parquet(fix)
    }
    val media = spark.read.parquet(fix)
    println(s"[mediacost] read partitions: ${media.rdd.getNumPartitions}")

    val fh = udf { (bytes: Array[Byte]) =>
      Multimodal.MediaCodecs.gifFrameHashes(bytes, 1, 16) match {
        case Some(hs) => hs.zipWithIndex.collect { case (Some(h), i) => (i, h) }
        case None => Seq.empty[(Int, Long)]
      }
    }
    def kernel(src: DataFrame): DataFrame = src
      .select(col("doc_id").as("id"), explode(fh(col("clip"))).as("_fh"))
      .select(col("id"), col("_fh._1").as("frame_idx"), col("_fh._2").as("frame_hash"))

    // warmup
    noop(kernel(media))

    // stage-by-stage: replicate bandedHammingPairs internals over the frame rows
    import org.apache.spark.sql.expressions.Window
    val frameRows = kernel(media)
      .select(struct(col("id").as("cid"), col("frame_idx").as("fidx")).as("id"),
        col("frame_hash").as("_h64"))
    def banded = frameRows.select(col("id"), col("_h64"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("_h64"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))
        }: _*)).as("bb"))
      .select(col("id"), col("_h64"), col("bb.band").as("band"), col("bb.bits").as("bits"))
      .repartition(col("band"), col("bits"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("band"), col("bits"))))
      .filter(col("_n") <= 10000).drop("_n")
    def side(b: DataFrame, sfx: String) = b.select(col("band"), col("bits"),
      col("id").as(s"id_$sfx"), col("_h64").as(s"h_$sfx"))
    def joined = side(banded, "a").join(side(banded, "b"), Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))

    (1 to 3).foreach { i =>
      println(f"[mediacost] kernel as-read            ${secs { noop(kernel(media)) }}%6.2f s")
      println(f"[mediacost] banded+guard              ${secs { noop(banded) }}%6.2f s")
      println(f"[mediacost] + self-join               ${secs { noop(joined) }}%6.2f s")
      println(f"[mediacost] + distinct                ${secs { noop(joined.distinct()) }}%6.2f s")
      println(f"[mediacost] + filter-then-distinct    ${secs { noop(joined.filter(col("hamming") <= 3).distinct()) }}%6.2f s")
      println(f"[mediacost] full pairs (operator)     ${secs {
        noop(Multimodal.nearDupPairsVideo(media, "doc_id", "clip", maxHamming = 3,
          minMatchingFrames = 2, maxBucketSize = 10000))
      }}%6.2f s")
    }
    spark.stop()
  }
}
