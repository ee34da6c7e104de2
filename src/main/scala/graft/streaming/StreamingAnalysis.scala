package graft.streaming

import graft.analyzers.{Analyzer, IncrementalAnalysisRunner}
import graft.core.MetricValue
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Structured-Streaming face of the engine. The reference has no stream processing; its
  * incremental batch analysis (per-partition states merged into history,
  * analyzers/incremental/runner.rs) maps naturally onto micro-batches: each batch is a
  * partition, `foreachBatch` folds its state into the store, and metrics stay current
  * without rescanning. Windowed quality metrics use native event-time windows +
  * watermarks (late data handled by Spark, not us).
  */
object StreamingAnalysis {

  /** Per-window data-quality aggregates with watermarked event time.
    * Emits one row per (window, metrics...) — completeness ratios and row counts for
    * the given columns, computed with the same conditional-count shapes as the batch
    * constraints (all partial-aggregated; streaming state is bounded by the watermark).
    */
  def windowedQuality(
      stream: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      columns: Seq[String]): DataFrame = {
    val aggs =
      count(lit(1)).as("row_count") +:
        columns.flatMap(c => Seq(
          count(col(c)).as(s"non_null_$c"),
          (count(col(c)).cast("double") / count(lit(1)).cast("double")).as(s"completeness_$c")))
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(aggs.head, aggs.drop(1): _*)
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("*")).drop("w")
  }

  /** Attach incremental analysis to a stream: every micro-batch is analyzed as a
    * partition (keyed by batch id) and merged into the cumulative state store; `onBatch`
    * receives the up-to-date metrics (e.g. to publish or alert on).
    */
  def incrementalSink(
      stream: DataFrame,
      runner: IncrementalAnalysisRunner,
      onBatch: (Long, Map[String, MetricValue]) => Unit = (_, _) => ()): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val metrics = runner.analyzePartition(batch, f"batch=$batchId%012d")
      onBatch(batchId, metrics)
    }

  /** Continuous constraint evaluation: run a (batchable) constraint set on each
    * micro-batch, emitting failures to the foreachBatch callback. For per-batch gating
    * (e.g. quarantine bad batches before they land).
    */
  def constraintSink(
      stream: DataFrame,
      constraints: Seq[graft.core.Constraint],
      onResult: (Long, Seq[graft.core.ConstraintResult]) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      onResult(batchId, graft.core.ValidationSuite.evaluateBatched(batch, constraints))
    }
}
