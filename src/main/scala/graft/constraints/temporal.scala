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
  // The bounds travel as extra aggregates so an UNPARSEABLE literal (to_timestamp →
  // NULL) is reported as a configuration error — without the check every row's
  // predicate is NULL and a typo'd bound masquerades as "all N values out of range".
  val aggregates: Seq[Column] = Seq(
    count(col(tsColumn)),
    sum(when(col(tsColumn) >= to_timestamp(lit(from)) &&
             col(tsColumn) <= to_timestamp(lit(to)), 1L).otherwise(0L)),
    first(to_timestamp(lit(from))), first(to_timestamp(lit(to))))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val nonNull = Num.toLong(values(0)).getOrElse(0L)
    if (nonNull == 0L) return skipped("no non-null timestamps")
    if (values(2) == null || values(3) == null)
      return failure(None, s"unparseable range bound: [$from, $to] — fix the check definition")
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
    startHour: Int = 9, endHour: Int = 17,
    businessDaysOnly: Boolean = true,
    assertion: Assertion = Assertion.GreaterThanOrEqual(1.0)) extends Constraint {
  require(startHour >= 0 && startHour <= 24 && endHour >= 0 && endHour <= 24,
    s"hours must be in [0,24], got $startHour..$endHour")
  require(startHour != endHour,
    s"startHour == endHour ($startHour) matches no timestamps")
  val name = s"BusinessHours($tsColumn ${startHour}h-${endHour}h) ${assertion.describe}"
  // start > end = an OVERNIGHT window (e.g. 22h-6h, a night shift): hour >= start OR
  // hour < end. The naive AND would silently match nothing and always fail.
  private val inHours =
    if (startHour < endHour) hour(col(tsColumn)) >= startHour && hour(col(tsColumn)) < endHour
    else hour(col(tsColumn)) >= startHour || hour(col(tsColumn)) < endHour
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
      s"${total - good} row(s) violate $before <= $after")
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
  override def evaluate(df: DataFrame): ConstraintResult = {
    // Gaps in FRACTIONAL seconds: unix_timestamp truncates to whole seconds, so a
    // 1.9 s gap would pass a 1 s limit.
    val result =
      if (partitionBy.isEmpty) globalGaps(df)
      else {
        val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(tsColumn))
        val gaps = df.filter(col(tsColumn).isNotNull)
          .withColumn("_prev", lag(col(tsColumn), 1).over(w))
          .withColumn("_gap", col(tsColumn).cast("double") - col("_prev").cast("double"))
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
    val stats = df.filter(col(tsColumn).isNotNull)
      .select(col(tsColumn).cast("double").as("t"))
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
    // Tie-break on the VALUE column: rows sharing an order key would otherwise be
    // compared in physical shuffle order and the verdict could flip between runs;
    // with the value tiebreak a tie-group is scanned ascending, deterministically.
    val w =
      if (partitionBy.isEmpty) Window.orderBy(col(orderColumn), col(valueColumn))
      else Window.partitionBy(partitionBy.map(col): _*)
        .orderBy(col(orderColumn), col(valueColumn))
    val prev = lag(col(valueColumn), 1).over(w)
    val bad = if (strict) col(valueColumn) <= prev else col(valueColumn) < prev
    // NULL order keys sort first (asc nulls-first) and would anchor the sequence,
    // flagging spurious violations against rows that have no position in the order.
    val row = df.filter(col(valueColumn).isNotNull && col(orderColumn).isNotNull)
      .withColumn("_viol", when(prev.isNotNull && bad, 1L).otherwise(0L))
      .agg(count(lit(1)), coalesce(sum(col("_viol")), lit(0L))).head()
    if (row.getLong(0) == 0L) return skipped("no non-null values")
    val violations = row.getLong(1)
    if (violations == 0L) success(MetricValue.LongMetric(0L))
    else failure(Some(MetricValue.LongMetric(violations)), s"$violations non-monotonic step(s)")
  }
}
