package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime evidence for the splittable media fixture (round-15 verdict item 8):
  * run the video frame-hash kernel over the stored fixture and print, per
  * completed stage, its task count — the §6 claim is tasks == files == cores on
  * the media scan stage. `runMain graft.tools.ScratchMediaTasks [sfDir]`
  */
object ScratchMediaTasks {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Multimodal

    // fixture identical to videoClipFixture's p32 layout
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id").isNotNull)
    val fix = "/tmp/graft_cliprollup_vid" // shares ScratchClipRollup's fixture
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
    val files = media.inputFiles.length
    println(s"[mediatasks] fixture files=$files cores=$par " +
      s"(splittable layout: one file per core)")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        stages.add((ev.stageInfo.stageId, ev.stageInfo.numTasks,
          ev.stageInfo.taskMetrics.inputMetrics.recordsRead))
    })
    // the frame-hash kernel: scan stage reads the fixture; its task count is the
    // decode parallelism every media query gets
    spark.sparkContext.setJobDescription("media fixture scan: frame-hash kernel")
    Multimodal.videoFrameHashes(media, "doc_id", "clip")
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, tasks, recs) =>
      println(f"[mediatasks] stage $id%3d tasks=$tasks%3d inputRecords=$recs%7d")
    }
    val scanStage = stages.asScala.toSeq.filter(_._3 > 0).map(_._2).maxOption.getOrElse(0)
    println(s"[mediatasks] scan-stage tasks=$scanStage files=$files cores=$par " +
      (if (scanStage == files && files == par) "— tasks == files == cores OK"
       else "— MISMATCH"))
    spark.stop()
  }
}
