package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints physical plans for the round-7 sketch/selection/calibration operators
  * for the PLANS.md audit: `runMain graft.tools.ScratchSketchPlans [sfDir]`.
  */
object ScratchSketchPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n[plan] ================ $name ================")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")

    val scored = docs.filter(col("doc_id").isNotNull)
      .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
      .withColumn("w", graft.functions.TextFunctions.tokenCount(col("text")))
    show("selectTopByBudget (post-checkpoint fold)")(
      graft.operators.Sharding.selectTopByBudget(scored, "q", "w", "doc_id", 10000L))

    show("calibrationBins")(
      graft.operators.QualityClassifier.calibrationBins(
        scored.withColumn("label", col("w") >= 50), "q", "label"))

    show("approxDistinctRollup")(
      graft.Metrics.approxDistinctRollup(ev, "event_type", "user_id"))

    show("mergeSketches")(
      graft.Metrics.mergeSketches(
        graft.Metrics.approxDistinctRollup(ev, "event_type", "user_id")
          .select("hll_sketch")))

    val toks = docs.filter(col("doc_id").isNotNull)
      .select((col("doc_id") % 2 === 0).as("even"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
    show("thetaSketch two-side agg")(
      toks.agg(
        graft.functions.SketchFunctions.thetaSketch(when(col("even"), col("tk"))).as("a"),
        graft.functions.SketchFunctions.thetaSketch(when(!col("even"), col("tk"))).as("b")))

    spark.stop()
  }
}
