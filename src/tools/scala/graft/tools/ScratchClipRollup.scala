package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Same-JVM A/B of the video clip rollup (round-15 verdict item 1): the r14
  * shape (frame-pair distinct + countDistinct Expand rollup) vs the r15 shape
  * (no distinct, two-level (ca,cb,fa) -> (ca,cb) aggregation), over the real
  * video fixture. Also asserts the two rollups produce IDENTICAL results.
  * `runMain graft.tools.ScratchClipRollup [sfDir]`
  */
object ScratchClipRollup {
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
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    // fixture identical to videoClipFixture's p32 layout
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id").isNotNull)
    val fix = "/tmp/graft_cliprollup_vid"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val mkU = udf((id: Long) => {
        val seed = ((id % 37) + 37) % 37
        Multimodal.MediaCodecs.encodeAnimatedGif(16, 12, (2 + seed % 2).toInt, seed)
      })
      docs.select(col("doc_id")).repartition(par)
        .select(col("doc_id"), mkU(col("doc_id")).as("clip"))
        .write.mode("overwrite").parquet(fix)
    }
    val media = spark.read.parquet(fix)
    val nDocs = media.count()
    val guard = math.max(10000L, nDocs / 37 * 2 + 16).toInt

    // frame rows exactly as videoFrameHashes' fused route
    val fh = udf { (bytes: Array[Byte]) =>
      Multimodal.MediaCodecs.gifFrameHashes(bytes, 1, 16) match {
        case Some(hs) => hs.zipWithIndex.collect { case (Some(h), i) => (i, h) }
        case None => Seq.empty[(Int, Long)]
      }
    }
    def frameRows = media
      .select(col("doc_id").as("id"), explode(fh(col("clip"))).as("_fh"))
      .select(struct(col("id").as("cid"), col("_fh._1").as("fidx")).as("id"),
        col("_fh._2").as("_h64"))

    // banded join WITHOUT the trailing distinct (bandedHammingPairs dedup=false)
    def rawPairs = {
      val banded = frameRows.select(col("id"), col("_h64"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("_h64"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))
          }: _*)).as("bb"))
        .select(col("id"), col("_h64"), col("bb.band").as("band"), col("bb.bits").as("bits"))
        .repartition(col("band"), col("bits"))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("band"), col("bits"))))
        .filter(col("_n") <= guard).drop("_n")
      def side(sfx: String) = banded.select(col("band"), col("bits"),
        col("id").as(s"id_$sfx"), col("_h64").as(s"h_$sfx"))
      side("a").join(side("b"), Seq("band", "bits"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
        .filter(col("hamming") <= 3)
    }

    def crossClip(df: DataFrame) = df.filter(col("id_a.cid") =!= col("id_b.cid"))
      .select(col("id_a.cid").as("_ca"), col("id_b.cid").as("_cb"),
        col("id_a.fidx").as("_fa"), col("hamming"))

    // r14 shape: distinct + countDistinct rollup
    def oldRollup = crossClip(rawPairs.distinct())
      .groupBy(col("_ca"), col("_cb"))
      .agg(countDistinct(col("_fa")).as("matching_frames"), min(col("hamming")).as("min_hamming"))
      .filter(col("matching_frames") >= 2)

    // r15 shape: no distinct, two-level aggregation
    def newRollup = crossClip(rawPairs)
      .groupBy(col("_ca"), col("_cb"), col("_fa"))
      .agg(min(col("hamming")).as("_mh"))
      .groupBy(col("_ca"), col("_cb"))
      .agg(count(col("_fa")).as("matching_frames"), min(col("_mh")).as("min_hamming"))
      .filter(col("matching_frames") >= 2)

    if (args.contains("--plans")) {
      def fmt(df: DataFrame) = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        "/tmp/cliprollup_old_plan.txt"), fmt(oldRollup))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        "/tmp/cliprollup_new_plan.txt"), fmt(newRollup))
      println("[cliprollup] plans written to /tmp/cliprollup_{old,new}_plan.txt")
      spark.stop(); return
    }

    // equivalence: symmetric difference must be empty
    val diff = oldRollup.exceptAll(newRollup).count() + newRollup.exceptAll(oldRollup).count()
    println(s"[cliprollup] result symmetric-difference rows: $diff " +
      s"(old=${oldRollup.count()}, new=${newRollup.count()})")
    require(diff == 0, "rollup shapes disagree!")

    // warmup both shapes
    noop(oldRollup); noop(newRollup)
    (1 to 4).foreach { i =>
      println(f"[cliprollup] old (distinct+countDistinct)  ${secs { noop(oldRollup) }}%6.2f s")
      println(f"[cliprollup] new (two-level agg)           ${secs { noop(newRollup) }}%6.2f s")
    }
    // full operator through the library path (current code = new shape)
    (1 to 3).foreach { i =>
      println(f"[cliprollup] nearDupPairsVideo (library)   ${secs {
        noop(Multimodal.nearDupPairsVideo(media, "doc_id", "clip", maxHamming = 3,
          minMatchingFrames = 2, maxBucketSize = guard))
      }}%6.2f s")
    }
    // broadcast vs shuffle join for the banded self-join: at sf0.1 the banded
    // frame table is under the broadcast threshold, so the self-join plans as
    // BHJ whose broadcast side REBUILDS the decode+window subtree in the
    // initial plan — does AQE stage reuse actually absorb that at runtime?
    (1 to 4).foreach { i =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      println(f"[cliprollup] operator, no-broadcast (SMJ/SHJ) ${secs {
        noop(Multimodal.nearDupPairsVideo(media, "doc_id", "clip", maxHamming = 3,
          minMatchingFrames = 2, maxBucketSize = guard))
      }}%6.2f s")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      println(f"[cliprollup] operator, default (BHJ)          ${secs {
        noop(Multimodal.nearDupPairsVideo(media, "doc_id", "clip", maxHamming = 3,
          minMatchingFrames = 2, maxBucketSize = guard))
      }}%6.2f s")
    }
    spark.stop()
  }
}
