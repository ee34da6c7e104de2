package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums and token-budget shard packing — the "write the corpus as
  * training shards of ≤ N tokens each" step at the end of a data pipeline.
  *
  * The naive formulation (`sum over (order by k rows unbounded preceding)`) is a
  * single-task global window — the exact scale-killer the un-keyed monotonicity plan
  * avoids (see `MonotonicConstraint.globalViolationsPlan`), and the same two-phase
  * scan fixes it here: range-repartition on the order key so partition i holds
  * smaller keys than i+1, a per-partition running sum (parallel across partitions),
  * then one tiny pass over the per-partition totals (ONE row per shuffle partition)
  * computes each partition's exclusive offset, broadcast back and added. Wall-clock
  * is one shuffle plus map-side work regardless of row count.
  */
object Sharding {

  /** `df` plus `outCol` = the INCLUSIVE running total of `valueCol` in ascending
    * `orderCol` order, accumulated as BIGINT.
    *
    * Contracts (both documented, not checked — checking costs a scan):
    *  - `orderCol` must be a total order (unique values). Rows sharing an order key
    *    would accumulate in arbitrary tie order, and a tie straddling a partition
    *    boundary could change per-row totals between runs.
    *  - NULL order keys have no defined position — pre-filter them (they'd also sort
    *    differently across engines: Spark ASC is nulls-first, most SQL engines last).
    *
    * NULL values contribute nothing (SQL sum semantics) but keep their row: the
    * running total carries past them unchanged — except a leading all-NULL prefix,
    * whose rows surface a NULL total (sum over an empty window frame), matching the
    * SQL-window formulation exactly.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    // Eager once (localCheckpoint): the ranged frame feeds BOTH the per-partition
    // window pass and the totals rollup — without it the full upstream plan (often a
    // parquet scan + projection) executes twice. Data-scale output rules out the
    // cache/collect/unpersist shape the one-row constraint plans use.
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val v = col(valueCol).cast("long")
    val wLocal = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Un-partitioned window is BOUNDED by construction: its input is the per-partition
    // totals frame — exactly ONE row per shuffle partition — so Spark's "No Partition
    // Defined" warning for it is benign (same invariant as the monotonicity fold).
    val wOffsets = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("_pid"))
      .agg(sum(v).as("_ptot"))
      .withColumn("_offset", coalesce(sum(col("_ptot")).over(wOffsets), lit(0L)))
      .select(col("_pid"), col("_offset"))
    ranged
      .withColumn("_local", sum(v).over(wLocal))
      .join(broadcast(offsets), Seq("_pid"), "left")
      // _local is NULL only while the window frame has seen no non-NULL value (a
      // leading NULL-value prefix) — propagate the NULL, don't invent a 0 total.
      .withColumn(outCol, col("_local") + col("_offset"))
      .drop("_pid", "_local", "_offset")
  }

  /** Assigns each row to a training shard by packing rows in ascending `orderCol`
    * order until each shard holds ~`budget` of `valueCol` (token counts, byte sizes):
    * `shardCol` = exclusive-running-total DIV budget — all-integer arithmetic, so
    * bit-identical across engines and exact at any corpus size.
    *
    * Semantics: rows are never split, so a shard may EXCEED the budget by at most one
    * row's value (the straddling row belongs to the shard its first token falls in),
    * and a single row larger than the whole budget makes shard ids monotone but not
    * dense (it covers several budget windows). Rows with a NULL `valueCol` inherit
    * the current shard (they carry no weight). Downstream, `write.partitionBy` on
    * `shardCol` (or `repartition(shardCol)` first for one file per shard) turns the
    * assignment into physical shard files.
    */
  def packIntoShards(df: DataFrame, orderCol: String, valueCol: String,
      budget: Long, shardCol: String = "shard_id"): DataFrame = {
    require(budget > 0, s"shard budget must be positive, got $budget")
    val v = coalesce(col(valueCol).cast("long"), lit(0L))
    withRunningTotal(df, orderCol, valueCol, "_rt_incl")
      .withColumn("_rt_excl", coalesce(col("_rt_incl"), lit(0L)) - v)
      // Integral DIV, not `/`: double division silently loses exactness past 2^53 —
      // a corpus only needs ~10^16 accumulated tokens/bytes to hit it. Values are
      // assumed NON-NEGATIVE (weights are token/byte counts); on non-negatives
      // truncating DIV == floor in every engine.
      .withColumn(shardCol, expr(s"_rt_excl DIV ${budget}L"))
      .drop("_rt_incl", "_rt_excl")
  }
}
