package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal constraints (reference: constraints/temporal_ordering.rs).
  * Range / business-hours / ordering checks are conditional counts — batchable into the
  * shared scan. Gap analysis needs LAG over a partitioned window ⇒ own job.
  */

/** All values of `tsColumn` inside [from, to] (ISO-8601 literals). */
final case class DateRangeConstraint(tsColumn: String, from: String, to: String)
    extends Constraint {
  val name = s"DateRange($tsColumn in [$from, $to])"
  // The bounds travel as extra aggregates so an UNPARSEABLE literal is reported as a
  // configuration error with a clear message. try_to_timestamp, not to_timestamp:
  // under ANSI mode (Spark 4 default) a malformed literal THROWS a raw cast exception
  // out of the shared scan; try_ yields NULL in both modes so the config-error branch
  // below reports it uniformly — and without the check, every row's predicate is NULL
  // and a typo'd bound masquerades as "all N values out of range".
  private def lo = try_to_timestamp(lit(from))
  private def hi = try_to_timestamp(lit(to))
  val aggregates: Seq[Column] = Seq(
    count(col(tsColumn)),
    sum(when(col(tsColumn) >= lo && col(tsColumn) <= hi, 1L).otherwise(0L)),
    first(lo), first(hi),
    count(lit(1)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    // Bound check BEFORE the all-null skip: a typo'd bound is a configuration error
    // regardless of whether the column has data yet — the old order reported it as a
    // benign skip on an all-null column until data showed up. Only a genuinely
    // zero-ROW table skips first (first() over zero rows is NULL even for a valid
    // bound, so the bound is unobservable there).
    val totalRows = Num.toLong(values(4)).getOrElse(0L)
    if (totalRows == 0L) return skipped("no rows")
    if (values(2) == null || values(3) == null)
      return failure(None, s"unparseable range bound: [$from, $to] — fix the check definition")
    val nonNull = Num.toLong(values(0)).getOrElse(0L)
    if (nonNull == 0L) return skipped("no non-null timestamps")
    val in = Num.toLong(values(1)).getOrElse(0L)
    if (in == nonNull) success(MetricValue.DoubleMetric(1.0))
    else failure(Some(MetricValue.DoubleMetric(in.toDouble / nonNull)),
      s"${nonNull - in} value(s) outside [$from, $to]")
  }
}

/** Fraction of timestamps inside business hours / business days
  * (reference: temporal_ordering.rs:376-401 — HH:MM compare + EXTRACT(DOW)).
  */
final case class BusinessHoursConstraint(
    tsColumn: String,
    start: String = "09:00", end: String = "17:00",
    businessDaysOnly: Boolean = true,
    assertion: Assertion = Assertion.GreaterThanOrEqual(1.0)) extends Constraint {
  // Minute granularity like the reference's HH:MM string compare
  // (temporal_ordering.rs:392-401): "09:30".."17:30" is a valid window. Bare "9"
  // still means 09:00 for the common whole-hour case.
  private val startMin = BusinessHoursConstraint.minuteOfDayOf(start)
  private val endMin = BusinessHoursConstraint.minuteOfDayOf(end)
  require(startMin != endMin,
    s"start == end ($start) matches no timestamps")
  val name = s"BusinessHours($tsColumn $start-$end) ${assertion.describe}"
  private def minuteOfDay = hour(col(tsColumn)) * 60 + minute(col(tsColumn))
  // start > end = an OVERNIGHT window (e.g. 22:00-06:00, a night shift):
  // minute >= start OR minute < end. The naive AND would silently match nothing
  // and always fail.
  private val inHours =
    if (startMin < endMin) minuteOfDay >= startMin && minuteOfDay < endMin
    else minuteOfDay >= startMin || minuteOfDay < endMin
  // Spark dayofweek: 1=Sunday..7=Saturday; business days are 2..6.
  private val inDays = dayofweek(col(tsColumn)).between(2, 6)
  private val pred = if (businessDaysOnly) inHours && inDays else inHours
  val aggregates: Seq[Column] = Seq(
    count(col(tsColumn)),
    sum(when(pred, 1L).otherwise(0L)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val nonNull = Num.toLong(values(0)).getOrElse(0L)
    if (nonNull == 0L) return skipped("no non-null timestamps")
    assertOn(Num.toLong(values(1)).getOrElse(0L).toDouble / nonNull.toDouble, assertion)
  }
}

object BusinessHoursConstraint {
  private val Hhmm = "^(\\d{1,2})(?::([0-5]\\d))?$".r

  /** Parse an "HH:MM" (or bare "HH") bound to minutes past midnight. "24:00" is the
    * end-of-day sentinel (1440), valid only as an end bound's exclusive limit — the
    * range check below allows it and the window arithmetic treats it as > every
    * in-day minute, exactly like the old endHour=24.
    */
  private[constraints] def minuteOfDayOf(bound: String): Int = bound match {
    case Hhmm(h, m) =>
      val mins = h.toInt * 60 + Option(m).map(_.toInt).getOrElse(0)
      require(mins >= 0 && mins <= 24 * 60,
        s"business-hours bound out of range: '$bound'")
      mins
    case other =>
      throw new IllegalArgumentException(
        s"business-hours bound must be 'HH:MM' or 'HH', got '$other'")
  }

  /** Whole-hour convenience constructor (the pre-minute-granularity surface). */
  def apply(tsColumn: String, startHour: Int, endHour: Int, businessDaysOnly: Boolean,
      assertion: Assertion): BusinessHoursConstraint = {
    require(startHour >= 0 && startHour <= 24 && endHour >= 0 && endHour <= 24,
      s"hours must be in [0,24], got $startHour..$endHour")
    BusinessHoursConstraint(tsColumn, f"$startHour%02d:00", f"$endHour%02d:00",
      businessDaysOnly, assertion)
  }
}

/** Column-pair ordering: `before` <= `after` on every row where both present
  * (reference: temporal_ordering.rs BeforeAfter).
  */
final case class BeforeAfterConstraint(before: String, after: String, strict: Boolean = false)
    extends Constraint {
  val name = s"BeforeAfter($before ${if (strict) "<" else "<="} $after)"
  private val both = col(before).isNotNull && col(after).isNotNull
  private val ok = if (strict) col(before) < col(after) else col(before) <= col(after)
  val aggregates: Seq[Column] = Seq(
    sum(when(both, 1L).otherwise(0L)),
    sum(when(both && ok, 1L).otherwise(0L)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val total = Num.toLong(values(0)).getOrElse(0L)
    if (total == 0L) return skipped("no comparable rows")
    val good = Num.toLong(values(1)).getOrElse(0L)
    if (good == total) success(MetricValue.DoubleMetric(1.0))
    else failure(Some(MetricValue.DoubleMetric(good.toDouble / total)),
      s"${total - good} row(s) violate $before ${if (strict) "<" else "<="} $after")
  }
}

/** Max inter-event gap per partition key via LAG window
  * (reference: temporal_ordering.rs:465-478 — EXTRACT(EPOCH FROM ts - LAG(ts))).
  * The window shuffles once on the partition key; gap counting is then map-local.
  */
final case class MaxTimeGapConstraint(
    tsColumn: String,
    partitionBy: Seq[String],
    maxGapSeconds: Long) extends MultiJobConstraint {
  val name = s"MaxTimeGap($tsColumn by ${partitionBy.mkString(",")}) <= ${maxGapSeconds}s"
  // Gaps in FRACTIONAL seconds. Numeric columns (epoch seconds) cast straight to
  // double — routing them through TIMESTAMP would silently truncate to microsecond
  // precision. Everything else (timestamp/date/string) coerces through TIMESTAMP: a
  // direct numeric cast rejects DATE at analysis. try_cast, not cast: under ANSI mode
  // (Spark 4 default) a plain cast THROWS on the first malformed string — unparseable
  // rows must instead drop out like the old unix_timestamp path dropped them
  // (null → filtered).
  private def epochSeconds(df: DataFrame): Column =
    df.schema(tsColumn).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(tsColumn).cast("double")
      case _ => col(tsColumn).try_cast("timestamp").cast("double")
    }
  // Only FINITE epochs participate (same rule as Metrics.numericHistogram): a NaN from
  // a numeric epoch column ranks above every real double in Spark SQL (every NaN gap
  // "violates") but compares false to everything in the JVM driver fold (real gaps
  // next to it silently vanish) — the keyed and global paths would return OPPOSITE
  // verdicts on the same data. between(±MaxValue) drops NULL, NaN, and ±Inf in one
  // predicate, identically in both engines.
  private def finiteTs(c: Column): Column = c.between(-Double.MaxValue, Double.MaxValue)

  override def evaluate(df: DataFrame): ConstraintResult = {
    val result =
      if (partitionBy.isEmpty) globalGaps(df)
      else {
        val gaps0 = df.withColumn("_ts", epochSeconds(df)).filter(finiteTs(col("_ts")))
        val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col("_ts"))
        val gaps = gaps0
          .withColumn("_prev", lag(col("_ts"), 1).over(w))
          .withColumn("_gap", col("_ts") - col("_prev"))
        val row = gaps.agg(
          max(col("_gap")),
          sum(when(col("_gap") > maxGapSeconds, 1L).otherwise(0L))).head()
        if (row.isNullAt(0)) None
        else Some((Num.toDouble(row.get(0)).getOrElse(0.0), Num.toLong(row.get(1)).getOrElse(0L)))
      }
    result match {
      case None => skipped("fewer than 2 timestamps")
      case Some((maxGap, violations)) =>
        if (violations == 0L) success(MetricValue.DoubleMetric(maxGap))
        else failure(Some(MetricValue.DoubleMetric(maxGap)),
          f"$violations gap(s) exceed ${maxGapSeconds}s (max observed $maxGap%.3fs)")
    }
  }

  /** Global (un-keyed) gap analysis WITHOUT the single-task global window: range-
    * repartition on the timestamp, sort within partitions, scan each partition once
    * for (first, last, maxGap, violations), then fold the partition-boundary gaps
    * driver-side — range partition i holds smaller values than i+1, so the only
    * cross-partition gaps are last(i) → first(i+1). Work per task is its range's
    * rows; the driver sees one tiny tuple per partition.
    */
  private def globalGaps(df: DataFrame): Option[(Double, Long)] = {
    val limit = maxGapSeconds
    // repartitionByRange computes its bounds with a SAMPLING JOB over the input, then
    // the shuffle job reads it again — uncached, that is two full scans (two parquet
    // decodes) of the projection. Cache the single-column projection so the sample
    // pass populates executor storage (~8 bytes/row, MEMORY_AND_DISK so it spills,
    // never OOMs) and the shuffle reads it back; unpersist as soon as the summaries
    // are collected.
    val projected = df.select(epochSeconds(df).as("t")).filter(finiteTs(col("t"))).cache()
    val stats = try {
      projected
        .repartitionByRange(col("t"))
        .sortWithinPartitions("t")
        .rdd.mapPartitionsWithIndex { (idx, it) =>
          var first = 0.0; var last = 0.0; var maxGap = Double.NegativeInfinity
          var viol = 0L; var n = 0L
          while (it.hasNext) {
            val t = it.next().getDouble(0)
            if (n > 0) {
              val g = t - last
              if (g > maxGap) maxGap = g
              if (g > limit) viol += 1
            } else first = t
            last = t; n += 1
          }
          if (n == 0) Iterator.empty else Iterator((idx, first, last, maxGap, viol, n))
        }.collect().sortBy(_._1)
    } finally projected.unpersist(blocking = false)
    val total = stats.map(_._6).sum
    if (total < 2) return None
    var maxGap = stats.map(_._4).max // NegativeInfinity for single-row partitions
    var violations = stats.map(_._5).sum
    stats.sliding(2).foreach {
      case Array(a, b) =>
        val g = b._2 - a._3 // next partition's first minus this partition's last
        if (g > maxGap) maxGap = g
        if (g > limit) violations += 1
      case _ => ()
    }
    Some((maxGap, violations))
  }
}

/** Monotonically non-decreasing timestamps within each partition (ordering by an
  * explicit sequence column), via LAG.
  */
final case class MonotonicConstraint(
    valueColumn: String,
    orderColumn: String,
    partitionBy: Seq[String] = Nil,
    strict: Boolean = false) extends MultiJobConstraint {
  val name = s"Monotonic($valueColumn by $orderColumn)"
  override def evaluate(df: DataFrame): ConstraintResult = {
    // NULL order keys sort first (asc nulls-first) and would anchor the sequence,
    // flagging spurious violations against rows that have no position in the order.
    val input = df.filter(col(valueColumn).isNotNull && col(orderColumn).isNotNull)
    val (total, violations) =
      if (partitionBy.isEmpty) globalViolations(input)
      else {
        // Tie-break on the VALUE column: rows sharing an order key would otherwise be
        // compared in physical shuffle order and the verdict could flip between runs;
        // with the value tiebreak a tie-group is scanned ascending, deterministically.
        val w = Window.partitionBy(partitionBy.map(col): _*)
          .orderBy(col(orderColumn), col(valueColumn))
        val prev = lag(col(valueColumn), 1).over(w)
        val bad = if (strict) col(valueColumn) <= prev else col(valueColumn) < prev
        val row = input
          .withColumn("_viol", when(prev.isNotNull && bad, 1L).otherwise(0L))
          .agg(count(lit(1)), coalesce(sum(col("_viol")), lit(0L))).head()
        (row.getLong(0), row.getLong(1))
      }
    if (total == 0L) return skipped("no non-null values")
    if (violations == 0L) success(MetricValue.LongMetric(0L))
    else failure(Some(MetricValue.LongMetric(violations)), s"$violations non-monotonic step(s)")
  }

  /** Un-keyed monotonicity WITHOUT the single-task global window (same strategy as
    * [[MaxTimeGapConstraint]].globalGaps): range-repartition on (order, value) so
    * partition i holds smaller tuples than i+1, LAG inside each physical partition via
    * a `spark_partition_id()`-keyed window (parallel across partitions), then fold the
    * partition BOUNDARIES — the only cross-partition steps are last(i) → first(i+1) —
    * over the per-partition summary frame, which has one row per shuffle partition.
    * The final un-keyed window/sort only ever sees that tiny summary, never the data.
    */
  private def globalViolations(input: DataFrame): (Long, Long) = {
    val row = globalViolationsDf(input).head()
    (row.getLong(0), row.getLong(1))
  }

  /** The un-keyed plan as a one-row (total, violations) frame — exposed so the oracle
    * harness can gate the DISTRIBUTED plan itself, not a re-derivation of it. Caller
    * filters out null order/value rows (evaluate does).
    */
  private[graft] def globalViolationsDf(input: DataFrame): DataFrame = {
    // Eager at call time: repartitionByRange's bound-sampling job and the shuffle job
    // would each re-read the source — two full parquet decodes of the projection.
    // cache() (not localCheckpoint: lineage stays recomputable, so a lost executor
    // re-derives its blocks instead of failing the job — the same trade globalGaps
    // makes) shares one materialization between the passes, the plan executes HERE,
    // and the cache is released deterministically before returning. The one-row
    // result comes back as a local frame — callers (evaluate, the oracle harness)
    // consume values, and those values are the distributed plan's own output.
    val projected = input
      .select(col(orderColumn).as("_o"), col(valueColumn).as("_v"))
      .cache()
    try {
      val row = globalViolationsPlan(projected).head()
      val spark = input.sparkSession
      import spark.implicits._
      Seq((row.getLong(0), row.getLong(1))).toDF("total", "violations")
    } finally projected.unpersist(blocking = false)
  }

  /** The distributed plan over a pre-projected (_o, _v) frame — exposed (lazily) so
    * the plan-shape regression test can inspect the exact plan [[globalViolationsDf]]
    * executes.
    */
  private[graft] def globalViolationsPlan(projected: DataFrame): DataFrame = {
    val ranged = projected
      .repartitionByRange(col("_o"), col("_v"))
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy(col("_pid")).orderBy(col("_o"), col("_v"))
    val prev = lag(col("_v"), 1).over(w)
    val bad = if (strict) col("_v") <= prev else col("_v") < prev
    // min/max of struct(_o,_v) compare lexicographically — exactly the window's sort
    // order — so they are the partition's first/last tuples in scan order.
    val perPartition = ranged
      .withColumn("_viol", when(prev.isNotNull && bad, 1L).otherwise(0L))
      .groupBy(col("_pid"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col("_viol")).as("_inner"),
        min(struct(col("_o"), col("_v"))).as("_first"),
        max(struct(col("_o"), col("_v"))).as("_last"))
    // Un-partitioned window is BOUNDED by construction: its input is the per-partition
    // summary frame — exactly ONE row per shuffle partition (dozens, not data-scale) —
    // so the "No Partition Defined" warning Spark logs for it is benign. Re-audit only
    // if this window's input stops being the groupBy(_pid) rollup above.
    val wb = Window.orderBy(col("_pid"))
    val prevLast = lag(col("_last._v"), 1).over(wb)
    val bBad = if (strict) col("_first._v") <= prevLast else col("_first._v") < prevLast
    perPartition
      .withColumn("_bviol", when(prevLast.isNotNull && bBad, 1L).otherwise(0L))
      .agg(
        coalesce(sum(col("_n")), lit(0L)).as("total"),
        coalesce(sum(col("_inner")) + sum(col("_bviol")), lit(0L)).as("violations"))
  }
}
