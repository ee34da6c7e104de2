package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed prefix sums and token-budget shard packing — the "write the corpus as
  * training shards of ≤ N tokens each" step at the end of a data pipeline.
  *
  * The naive formulation (`sum over (order by k rows unbounded preceding)`) is a
  * single-task global window — the exact scale-killer the un-keyed monotonicity plan
  * avoids — and a windowed two-phase variant still pays a SECOND data-scale exchange
  * (a `Window.partitionBy(pid)` cannot prove it matches the range partitioning, so
  * Spark re-shuffles by pid). This implementation is genuinely ONE data shuffle:
  * range-repartition + in-partition sort (materialized once), then two streaming
  * `mapPartitions` passes over the materialized partitions — a tiny one emitting a
  * (pid, total, nonNullCount) summary row per partition (collected: ≤ one row per
  * shuffle partition, bounded regardless of data size), and the real pass folding the
  * running total with each partition's broadcast offset. Prefix summation is the
  * canonical genuinely-sequential-per-partition computation, which is exactly what
  * `mapPartitions` is for; the object-serialization boundary it introduces is the
  * price of removing a full-corpus exchange.
  */
object Sharding {

  /** `df` plus `outCol` = the INCLUSIVE running total of `valueCol` in ascending
    * `orderCol` order, accumulated as BIGINT.
    *
    * Contracts (documented, not checked — checking costs a scan):
    *  - `orderCol` must be a total order (unique values). Rows sharing an order key
    *    would accumulate in arbitrary tie order, and a tie straddling a partition
    *    boundary could change per-row totals between runs.
    *  - NULL order keys have no defined position — pre-filter them (they'd also sort
    *    differently across engines: Spark ASC is nulls-first, most SQL engines last).
    *
    * NULL values contribute nothing (SQL sum semantics) but keep their row: the
    * running total carries past them unchanged. Rows in the GLOBAL leading all-NULL
    * prefix (no non-NULL value seen anywhere before them, partition boundaries
    * irrelevant) surface a NULL total — exactly what the naive global window's
    * `sum(...) over (rows unbounded preceding)` returns for them.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    require(!df.columns.contains("_rt_v"),
      "withRunningTotal uses an internal _rt_v column; input already has one — rename it")
    require(!df.columns.contains(outCol), s"input already has a '$outCol' column")
    val spark = df.sparkSession
    // Eager once (localCheckpoint): the materialized, range-partitioned, sorted
    // partitions feed BOTH passes below at their original partition ids, and the
    // checkpoint pins the row order the folds depend on. The ONLY data-scale
    // exchange in the whole operator is this range repartition.
    val ranged = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .localCheckpoint(true)
    val withV = ranged.withColumn("_rt_v", col(valueCol).cast("long"))
    val vIdx = withV.columns.indexOf("_rt_v")
    // Pass 1 (cheap, projection of one column): per-partition totals. One output row
    // per shuffle partition — the collect is bounded by the partition count, never by
    // the data.
    val stats = withV.select(col("_rt_v"))
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var total = 0L
        var nonNull = 0L
        it.foreach { r => if (!r.isNullAt(0)) { total += r.getLong(0); nonNull += 1L } }
        Iterator.single((pid, total, nonNull))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong))
      .collect()
    // Exclusive prefix offsets + how many non-NULL values precede each partition
    // (the latter decides NULL-vs-0 for the global leading all-NULL prefix).
    val offsets: Map[Int, (Long, Long)] = {
      var acc = 0L
      var seen = 0L
      stats.sortBy(_._1).map { case (pid, total, nonNull) =>
        val entry = pid -> ((acc, seen))
        acc += total
        seen += nonNull
        entry
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = withV.schema.add(outCol, LongType, nullable = true)
    // Pass 2: the streaming fold. Partition ids are stable (narrow projection over
    // the checkpointed partitions), so each task picks up exactly its offset.
    withV.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val (offset, seenBefore) = bc.value.getOrElse(pid, (0L, 0L))
      var acc = offset
      var seen = seenBefore
      it.map { r =>
        if (!r.isNullAt(vIdx)) { acc += r.getLong(vIdx); seen += 1L }
        val out: Any = if (seen > 0L) acc else null
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
      .drop("_rt_v")
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
    * the current shard (they carry no weight); a global leading all-NULL prefix lands
    * in shard 0. Downstream, `write.partitionBy` on `shardCol` (or
    * `repartition(shardCol)` first for one file per shard) turns the assignment into
    * physical shard files.
    */
  /** Pack and WRITE: `path/shard_id=N/` directories with exactly ONE file per shard
    * (each shard's rows hash to one task via `repartition(shardCol)` before the
    * partitioned write) — the physical training-shard layout downstream loaders
    * expect, ~`budget` weight per file.
    */
  def writeShards(df: DataFrame, orderCol: String, valueCol: String,
      budget: Long, path: String, shardCol: String = "shard_id"): Unit =
    packIntoShards(df, orderCol, valueCol, budget, shardCol)
      .repartition(col(shardCol))
      .write.partitionBy(shardCol).mode("overwrite").parquet(path)

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
