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

  /** Weights are token/byte COUNTS by contract: an integral column, enforced. A
    * double weight would silently truncate (2.9 → 2 tokens), and a fractional
    * negative in (-1, 0) would truncate to 0 and slip past the fail-loud
    * negative-weight guard — cast deliberately at the call site if a non-integral
    * weight is really intended.
    */
  private def requireIntegralWeight(df: DataFrame, weightCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val t = df.schema(weightCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$op: weight column '$weightCol' must be integral (a count), got $t — " +
        "cast explicitly first if truncation is really intended")
  }

  /** Group keys must have driver-side VALUE equality for the bounded-summary
    * folds. Top-level binary is normalized by [[groupKeyOf]]; binary NESTED inside
    * array/struct/map keys still compares by reference one level down (Seq and Row
    * equality delegate to the element arrays' identity), which would make every
    * row its own group — fail loud instead of silently ignoring the quota.
    */
  private def requireHashableGroupKey(df: DataFrame, groupCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    def nestsBinary(dt: DataType): Boolean = dt match {
      case BinaryType => true
      case ArrayType(e, _) => nestsBinary(e)
      case MapType(kt, vt, _) => nestsBinary(kt) || nestsBinary(vt)
      case StructType(fs) => fs.exists(f => nestsBinary(f.dataType))
      case _ => false
    }
    val dt = df.schema(groupCol).dataType
    require(dt == BinaryType || !nestsBinary(dt),
      s"$op: group key type $dt nests binary values, whose driver-side equality is by " +
        "reference — the fold would treat every row as its own group; hash the key " +
        "first (e.g. xxhash64)")
  }

  /** Driver-side group key for the bounded-summary folds: Row.get hands back
    * BinaryType as `Array[Byte]`, which only has REFERENCE equality — hashing it
    * raw would make every row its own "group" (spuriously tripping maxGroups, and
    * silently resetting per-group accumulators). Wrap byte arrays in an ArraySeq
    * (content equality); everything else external-typed compares by value already.
    */
  private def groupKeyOf(r: Row, idx: Int): Option[Any] =
    if (r.isNullAt(idx)) None
    else r.get(idx) match {
      case b: Array[Byte] => Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(b))
      case v => Some(v)
    }

  /** Pass 1 of the per-group fold shared by [[interleaveBySource]] (weight 1 per
    * row = ranks) and [[selectTopByBudgetByGroup]] (real weights): one summed
    * weight per (partition, group). The cardinality guard fires IN THE TASK — any
    * single partition over `maxGroups` kills the job there, before its stats rows
    * can OOM the driver; the exact global check runs on the collected result.
    * Negative weights fail loud (both callers' weights are counts by contract).
    */
  private def perPartitionGroupSums(grouped: DataFrame, maxGroups: Int,
      opName: String): Array[(Int, Option[Any], Long)] =
    grouped.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val m = scala.collection.mutable.HashMap.empty[Option[Any], Long]
      it.foreach { r =>
        val k = groupKeyOf(r, 0)
        val w = if (r.isNullAt(1)) 0L else r.getLong(1)
        if (w < 0L) throw new IllegalArgumentException(
          s"$opName: negative weight $w in partition $pid — counts must be non-negative")
        m.update(k, m.getOrElse(k, 0L) + w)
        if (m.size > maxGroups) throw new IllegalArgumentException(
          s"$opName: partition $pid alone saw > $maxGroups distinct groups; this " +
            "operator is for mixture-component granularity — bucket the group key first")
      }
      m.iterator.map { case (k, w) => (pid, k, w) }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.kryo[Option[Any]], Encoders.scalaLong))
      .collect()

  /** Exclusive per-group prefix offsets per partition: weight of group g in
    * partitions before pid. Driver state ≤ partitions × groups.
    */
  private def exclusiveGroupOffsets(
      stats: Array[(Int, Option[Any], Long)]): Map[Int, Map[Option[Any], Long]] = {
    val acc = scala.collection.mutable.HashMap.empty[Option[Any], Long]
    stats.groupBy(_._1).toSeq.sortBy(_._1).map { case (pid, rows) =>
      val snapshot = acc.toMap
      rows.foreach { case (_, k, w) => acc.update(k, acc.getOrElse(k, 0L) + w) }
      pid -> snapshot
    }.toMap
  }

  /** `df` plus `outCol` = the INCLUSIVE running total of `valueCol` in ascending
    * `orderCol` order, accumulated as BIGINT.
    *
    * Contracts (documented, not checked — checking costs a scan):
    *  - `orderCol` must be a total order (unique values). Rows sharing an order key
    *    would accumulate in arbitrary tie order, and a tie straddling a partition
    *    boundary could change per-row totals between runs.
    *  - NULL order keys have no defined position — pre-filter them (they'd also sort
    *    differently across engines: Spark ASC is nulls-first, most SQL engines last).
    *  - `valueCol` must be an INTEGRAL type (enforced, fail-fast): weights are
    *    token/byte counts, and a double would silently truncate per row.
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
    // Guards the whole prefix-sum family (packIntoShards/writeShards ride this).
    requireIntegralWeight(df, valueCol, "withRunningTotal")
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

  /** Quality-ranked selection under a global token budget: the "take the best
    * documents until we have N tokens" data-mixing step. Returns the MAXIMAL PREFIX
    * of rows in (`scoreCol` DESC, `tieCol` ASC) order whose inclusive cumulative
    * `weightCol` stays ≤ `budget`, plus `outCol` = that cumulative total — so the
    * caller can read the realized token count and the score threshold straight off
    * the result. Because weights are non-negative, "maximal prefix" and
    * "rows with cumulative ≤ budget" are the same set (the cumulative sum is
    * monotone), which is what makes the semantics exactly SQL-expressible.
    *
    * Eligibility: rows whose score casts to a FINITE double compete; NULL / NaN /
    * ±Inf scores are excluded entirely (no quality signal ⇒ not in the ranking —
    * the caller decides their fate separately). NULL weights count 0 tokens but
    * keep their rank; negative weights fail loud IN THE TASK (a token count can
    * never be negative — silently absorbing one would corrupt every cumulative
    * after it).
    *
    * Contracts (as [[withRunningTotal]]): `tieCol` must be unique and non-NULL —
    * it is what makes "score DESC" a total order, so the selected set is
    * bit-identical across runs and engines.
    *
    * Shape: the [[withRunningTotal]] two-pass fold — ONE data-scale exchange
    * (range-repartition on (score DESC, tie) + in-partition sort, materialized
    * once), a bounded per-partition weight-sum collect, then a streaming fold that
    * stops CONSUMING at the budget boundary. Partitions whose exclusive offset
    * already exceeds the budget emit nothing without reading a row — at 100 TB
    * with a 1% budget, ~99% of tasks are no-ops. The naive formulation
    * (`sum over (ORDER BY score DESC)`) is a single-task global window.
    */
  def selectTopByBudget(df: DataFrame, scoreCol: String, weightCol: String,
      tieCol: String, budget: Long, outCol: String = "cum_weight"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(!df.columns.contains(outCol), s"input already has a '$outCol' column")
    Seq("_sel_s", "_sel_w").foreach(r => require(!df.columns.contains(r),
      s"input already has a $r column (reserved internal name)"))
    requireIntegralWeight(df, weightCol, "selectTopByBudget")
    val spark = df.sparkSession
    val ranged = df
      .withColumn("_sel_s", col(scoreCol).try_cast("double"))
      .withColumn("_sel_w", col(weightCol).cast("long"))
      .filter(col("_sel_s").between(-Double.MaxValue, Double.MaxValue))
      .repartitionByRange(col("_sel_s").desc, col(tieCol))
      .sortWithinPartitions(col("_sel_s").desc, col(tieCol))
      .localCheckpoint(true)
    val wIdx = ranged.columns.indexOf("_sel_w")
    val stats = ranged.select(col("_sel_w"))
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var total = 0L
        it.foreach { r =>
          if (!r.isNullAt(0)) {
            val w = r.getLong(0)
            if (w < 0L) throw new IllegalArgumentException(
              s"selectTopByBudget: negative weight $w in partition $pid — " +
                "token/byte counts must be non-negative")
            total += w
          }
        }
        Iterator.single((pid, total))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .collect()
    val offsets: Map[Int, Long] = {
      var acc = 0L
      stats.sortBy(_._1).map { case (pid, total) =>
        val e = pid -> acc; acc += total; e
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = ranged.schema.add(outCol, LongType, nullable = false)
    ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val offset = bc.value.getOrElse(pid, 0L)
      // Strictly past the budget before this partition even starts: nothing here
      // can be selected (weights ≥ 0 ⇒ cumulative never decreases) — emit nothing
      // WITHOUT consuming the input. offset == budget still processes: zero-weight
      // rows at the boundary hold the cumulative at exactly `budget` and belong in.
      if (offset > budget) Iterator.empty
      else {
        var acc = offset
        it.map { r =>
          val w = if (r.isNullAt(wIdx)) 0L else r.getLong(wIdx)
          acc += w
          if (acc > budget) null else Row.fromSeq(r.toSeq :+ acc)
        }.takeWhile(_ != null) // monotone cumulative: first violation ends the prefix
      }
    }(Encoders.row(outSchema))
      .drop("_sel_s", "_sel_w")
  }

  /** Per-group [[selectTopByBudget]]: each `groupCol` stratum independently keeps its
    * best rows up to `budget` weight — the per-source token QUOTA that actually
    * builds a training mixture ("2B tokens of code, 2B of web, best-first"), where
    * the global form can't stop one huge source from eating the whole budget.
    * Semantics per group are identical to the global form (maximal prefix in
    * (score DESC, tie) order, cumulative ≤ budget, non-finite scores ineligible,
    * NULL weights count 0, negative weights fail in-task); NULL group is a real
    * stratum with its own quota — the caller decides unattributed rows' fate
    * up front, not the operator silently.
    *
    * Shape: ONE data-scale exchange — range-repartition on (group, score DESC, tie)
    * + in-partition sort, materialized once — then the [[interleaveBySource]]
    * bounded-summary fold: pass 1 collects per-(partition, group) weight sums
    * (driver state ≤ partitions × groups, `maxGroups` fails loud IN THE TASK),
    * pass 2 streams each partition with per-group accumulators. Groups are mixture
    * components (10s–1000s); a data-scale-distinct group key belongs to
    * [[selectTopByBudget]] run per group, not here. Unlike the global form,
    * partitions can't be skipped wholesale (several groups can meet inside one),
    * but rows of already-exhausted groups drop with one map lookup each.
    */
  def selectTopByBudgetByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      weightCol: String, tieCol: String, budget: Long, outCol: String = "cum_weight",
      maxGroups: Int = 100000): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(!df.columns.contains(outCol), s"input already has a '$outCol' column")
    Seq("_sel_s", "_sel_w").foreach(r => require(!df.columns.contains(r),
      s"input already has a $r column (reserved internal name)"))
    requireIntegralWeight(df, weightCol, "selectTopByBudgetByGroup")
    requireHashableGroupKey(df, groupCol, "selectTopByBudgetByGroup")
    val spark = df.sparkSession
    val ranged = df
      .withColumn("_sel_s", col(scoreCol).try_cast("double"))
      .withColumn("_sel_w", col(weightCol).cast("long"))
      .filter(col("_sel_s").between(-Double.MaxValue, Double.MaxValue))
      .repartitionByRange(col(groupCol), col("_sel_s").desc, col(tieCol))
      .sortWithinPartitions(col(groupCol), col("_sel_s").desc, col(tieCol))
      .localCheckpoint(true)
    val gIdx = ranged.columns.indexOf(groupCol)
    require(gIdx >= 0, s"no column '$groupCol' in ${ranged.columns.mkString(",")}")
    val wIdx = ranged.columns.indexOf("_sel_w")
    val stats = perPartitionGroupSums(ranged.select(col(groupCol), col("_sel_w")),
      maxGroups, "selectTopByBudgetByGroup")
    val nGroups = stats.map(_._2).distinct.length
    require(nGroups <= maxGroups,
      s"selectTopByBudgetByGroup saw $nGroups distinct groups (> maxGroups=$maxGroups)")
    // Exclusive per-group offsets per partition (range partitioning ⇒ a group's rows
    // are contiguous across partition ids, but the fold doesn't need that — only
    // "weight of this group in partitions before pid").
    val bc = spark.sparkContext.broadcast(exclusiveGroupOffsets(stats))
    val outSchema = ranged.schema.add(outCol, LongType, nullable = false)
    ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val base = bc.value.getOrElse(pid, Map.empty[Option[Any], Long])
      val local = scala.collection.mutable.HashMap.empty[Option[Any], Long]
      it.flatMap { r =>
        val k = groupKeyOf(r, gIdx)
        val acc = local.getOrElse(k, base.getOrElse(k, 0L))
        if (acc > budget) None // group already exhausted: one lookup, no arithmetic
        else {
          val w = if (r.isNullAt(wIdx)) 0L else r.getLong(wIdx)
          val cum = acc + w
          local.update(k, cum)
          if (cum > budget) None else Some(Row.fromSeq(r.toSeq :+ cum))
        }
      }
    }(Encoders.row(outSchema))
      .drop("_sel_s", "_sel_w")
  }

  /** Round-robin source interleaving for the final training stream: adds `rankCol` =
    * the row's 1-based rank WITHIN its source (ascending `orderCol`), so ordering the
    * output by `(rankCol, sourceCol)` yields the canonical interleave — first row of
    * every source, then second of every source, … — the deterministic "mix the
    * sources evenly through the stream" ordering (sources that run out simply stop
    * appearing; no RNG, reruns are bit-identical).
    *
    * The naive `row_number().over(Window.partitionBy(source))` sorts EVERYTHING of
    * one source in a single task — the hot source at 50% of a 100 TB corpus is one
    * task. This is instead the [[withRunningTotal]] two-pass shape: ONE data-scale
    * exchange (range-repartition by `orderCol` + in-partition sort, materialized
    * once), a bounded summary pass collecting per-(partition, source) row counts,
    * then a streaming per-partition fold adding each partition's per-source offsets.
    * The driver state is `partitions × distinct sources` — sources are mixture
    * components (10s–1000s), enforced by `maxSources` (fail loud, don't OOM the
    * driver silently).
    *
    * Contracts (as [[withRunningTotal]]): `orderCol` must totally order rows (ties
    * straddling a partition boundary would make ranks run-dependent) and must be
    * non-NULL; NULL sources form a real source group (ranked like any other — the
    * caller decides whether unattributed rows belong in the stream).
    */
  def interleaveBySource(df: DataFrame, sourceCol: String, orderCol: String,
      rankCol: String = "rr_rank", maxSources: Int = 100000): DataFrame = {
    require(!df.columns.contains(rankCol), s"input already has a '$rankCol' column")
    requireHashableGroupKey(df, sourceCol, "interleaveBySource")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .localCheckpoint(true)
    val srcIdx = ranged.columns.indexOf(sourceCol)
    require(srcIdx >= 0, s"no column '$sourceCol' in ${ranged.columns.mkString(",")}")
    // Pass 1: per-(partition, source) ROW counts — the shared bounded-summary fold
    // with weight 1 per row (see [[perPartitionGroupSums]] for the in-task guard
    // rationale); driver state ≤ partitions × maxSources, exact global check below.
    val stats = perPartitionGroupSums(
      ranged.select(col(sourceCol), lit(1L)), maxSources, "interleaveBySource")
    val nSources = stats.map(_._2).distinct.length
    require(nSources <= maxSources,
      s"interleaveBySource saw $nSources distinct sources (> maxSources=$maxSources); " +
        "this operator is for mixture-component granularity — bucket the source key first")
    val bc = spark.sparkContext.broadcast(exclusiveGroupOffsets(stats))
    val outSchema = ranged.schema.add(rankCol, LongType, nullable = false)
    ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val local = scala.collection.mutable.HashMap.empty[Option[Any], Long]
      val base = bc.value.getOrElse(pid, Map.empty[Option[Any], Long])
      it.map { r =>
        val k = groupKeyOf(r, srcIdx)
        val n = local.getOrElse(k, base.getOrElse(k, 0L)) + 1L
        local.update(k, n)
        Row.fromSeq(r.toSeq :+ n)
      }
    }(Encoders.row(outSchema))
  }
}
