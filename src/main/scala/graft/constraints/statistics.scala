package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistic selector (reference: constraints/statistics.rs:44-75). All are native Spark
  * aggregate functions — codegen'd, partial-aggregated map-side, one scan when batched.
  */
sealed trait Stat { def column(c: String): Column; def describe: String }
object Stat {
  case object Min      extends Stat { def column(c: String) = min(col(c));          val describe = "min" }
  case object Max      extends Stat { def column(c: String) = max(col(c));          val describe = "max" }
  case object Mean     extends Stat { def column(c: String) = avg(col(c));          val describe = "mean" }
  case object Sum      extends Stat { def column(c: String) = sum(col(c));          val describe = "sum" }
  case object StdDev   extends Stat { def column(c: String) = stddev_samp(col(c));  val describe = "stddev" }
  case object Variance extends Stat { def column(c: String) = var_samp(col(c));     val describe = "variance" }
  case object Median   extends Stat { def column(c: String) = percentile_approx(col(c), lit(0.5), lit(10000)); val describe = "median" }
  final case class Percentile(p: Double) extends Stat {
    def column(c: String) = percentile_approx(col(c), lit(p), lit(10000))
    val describe = s"p$p"
  }
  /** Exact percentile — O(n log n) sort-based; prefer [[Percentile]] at scale. */
  final case class ExactPercentile(p: Double) extends Stat {
    def column(c: String) = expr(s"percentile(${graft.core.SqlIdent(c)}, $p)")
    val describe = s"exact_p$p"
  }
}

/** Single-statistic constraint (reference: constraints/statistics.rs:263). */
final case class StatisticConstraint(column: String, stat: Stat, assertion: Assertion)
    extends Constraint {
  val name = s"${stat.describe}($column) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(stat.column(column))
  // NULL means genuinely undefined (empty/all-null input) → Skip. A NON-NULL value
  // that isn't numeric (min/max of a date/timestamp/string column) is a configuration
  // error and must FAIL loud — skipping would vacuously pass the check with a message
  // claiming the data was empty when it wasn't.
  def fromAggregates(values: Seq[Any]): ConstraintResult = values.head match {
    case null => skipped("statistic undefined on empty/all-null input")
    case v => Num.toDouble(v) match {
      case Some(d) => assertOn(d, assertion)
      case None => failure(None,
        s"${stat.describe}($column) is not numeric (got ${v.getClass.getSimpleName}); " +
          "statistic assertions need a numeric column")
    }
  }
}

/** Several statistics of one column verified from ONE shared scan
  * (reference: constraints/statistics.rs:433-460).
  */
final case class MultiStatisticConstraint(column: String, stats: Seq[(Stat, Assertion)])
    extends Constraint {
  val name = s"MultiStatistic($column)[${stats.map(_._1.describe).mkString(",")}]"
  val aggregates: Seq[Column] = stats.map(_._1.column(column))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val outcomes = stats.zip(values).map { case ((st, a), v) =>
      val d = Num.toDouble(v)
      (st.describe, d, d.map(a(_)))
    }
    val metric = MetricValue.MapMetric(outcomes.collect {
      case (n, Some(d), _) => n -> MetricValue.DoubleMetric(d)
    }.toMap)
    // Severity order: a CONCRETE failure of a defined statistic always surfaces, even
    // when a sibling statistic is undefined (skipping the whole constraint would mask
    // it); with no failures, any undefined statistic downgrades to Skipped (an
    // undefined value must never read as a passing assertion).
    val failed = outcomes.filter(_._3.contains(false))
    // Same non-numeric rule as StatisticConstraint: a non-null value Num.toDouble
    // can't read is a config error (wrong column type), not an empty-input skip.
    val nonNumeric = stats.map(_._1).zip(values).collect {
      case (st, v) if v != null && Num.toDouble(v).isEmpty => st.describe
    }
    if (failed.nonEmpty)
      failure(Some(metric), failed.map(f => s"${f._1}=${f._2.orNull}").mkString("failed: ", ", ", ""))
    else if (nonNumeric.nonEmpty)
      failure(Some(metric),
        s"non-numeric statistic value(s) for $column: ${nonNumeric.mkString(", ")} — " +
          "statistic assertions need a numeric column")
    else if (outcomes.exists(_._2.isEmpty))
      skipped("statistic undefined (no non-null values)")
    else success(metric)
  }
}

/** Pearson correlation between two numeric columns via native `corr`
  * (reference: constraints/correlation.rs:264-286).
  */
final case class CorrelationConstraint(c1: String, c2: String, assertion: Assertion)
    extends Constraint {
  val name = s"Correlation($c1,$c2) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(corr(col(c1), col(c2)))
  // NaN (zero variance / non-finite input) deliberately follows the engine-wide
  // "NaN fails every assertion" rule rather than skipping: the NaN metric surfaces to
  // the caller, and DuckDB's corr returns the same NaN — skipping here would hide a
  // constant-column finding AND break engine-vs-oracle metric parity.
  def fromAggregates(values: Seq[Any]): ConstraintResult =
    Num.toDouble(values.head) match {
      case None    => skipped("correlation undefined")
      case Some(v) => assertOn(v, assertion)
    }
}

/** Sample covariance via native `covar_samp` (reference: constraints/correlation.rs:264-286). */
final case class CovarianceConstraint(c1: String, c2: String, assertion: Assertion)
    extends Constraint {
  val name = s"Covariance($c1,$c2) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(covar_samp(col(c1), col(c2)))
  def fromAggregates(values: Seq[Any]): ConstraintResult =
    Num.toDouble(values.head) match {
      case None    => skipped("covariance undefined")
      case Some(v) => assertOn(v, assertion) // NaN fails, by the same rule as corr
    }
}

/** Approximate distinct count via HLL++ (reference: constraints/approx_count_distinct.rs:63-64).
  * Unlike the reference's non-mergeable state (advanced/approx_count_distinct.rs:78-79),
  * Spark's `approx_count_distinct` is a true mergeable sketch — partial-aggregated.
  */
final case class ApproxCountDistinctConstraint(column: String, assertion: Assertion, rsd: Double = 0.05)
    extends Constraint {
  val name = s"ApproxCountDistinct($column) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(approx_count_distinct(col(column), rsd))
  def fromAggregates(values: Seq[Any]): ConstraintResult =
    Num.toDouble(values.head) match {
      // approx_count_distinct returns 0 (not NULL) on empty/all-null input — treat it
      // as the same Skipped the rest of the family reports, not a passing assertion.
      case None                 => skipped("empty input")
      case Some(v) if v == 0.0  => skipped("no non-null values")
      case Some(v)              => assertOn(v, assertion)
    }
}

/** Quantile constraint (reference: constraints/quantile.rs:228-241,344-346).
  * `Approximate` uses the mergeable `percentile_approx` sketch (one shared-scan
  * aggregate, batchable); `Exact` runs [[graft.operators.Quantiles.exactQuantiles]] —
  * a multi-pass sketch-bracketed rank selection that stays exact AND distributed
  * (Spark's own `percentile` merges the whole value→count map in one task), so it
  * cannot share the suite's single scan and runs as its own job.
  */
sealed trait QuantileMethod
object QuantileMethod {
  case object Exact       extends QuantileMethod
  case object Approximate extends QuantileMethod
}
final case class QuantileConstraint(
    column: String, q: Double, assertion: Assertion,
    method: QuantileMethod = QuantileMethod.Approximate,
    accuracy: Int = 10000) extends Constraint {
  require(q >= 0 && q <= 1, "quantile must be in [0,1]")
  val name = s"Quantile($column, $q) ${assertion.describe}"
  val aggregates: Seq[Column] = method match {
    case QuantileMethod.Exact       => Nil // own multi-pass job, see evaluate
    case QuantileMethod.Approximate => Seq(percentile_approx(col(column), lit(q), lit(accuracy)))
  }
  def fromAggregates(values: Seq[Any]): ConstraintResult =
    Num.toDouble(values.head) match {
      case None    => skipped("quantile undefined on empty input")
      case Some(v) => assertOn(v, assertion)
    }
  override def evaluate(df: DataFrame): ConstraintResult = method match {
    case QuantileMethod.Approximate => super.evaluate(df)
    case QuantileMethod.Exact =>
      graft.operators.Quantiles.exactQuantile(df, column, q, accuracy) match {
        case None    => skipped("quantile undefined on empty input")
        case Some(v) => assertOn(v, assertion)
      }
  }
}

/** Multiple quantiles of one column in one scan. */
final case class MultiQuantileConstraint(column: String, qs: Seq[(Double, Assertion)],
    method: QuantileMethod = QuantileMethod.Approximate) extends Constraint {
  require(qs.forall { case (q, _) => q >= 0 && q <= 1 },
    "quantiles must be in [0,1]") // fail at construction, not inside the shared batched scan
  val name = s"MultiQuantile($column)[${qs.map(_._1).mkString(",")}]"
  val aggregates: Seq[Column] = method match {
    case QuantileMethod.Exact       => Nil // own multi-pass distributed job, see evaluate
    case QuantileMethod.Approximate =>
      qs.map { case (q, _) => percentile_approx(col(column), lit(q), lit(10000)) }
  }
  override def evaluate(df: DataFrame): ConstraintResult = method match {
    case QuantileMethod.Approximate => super.evaluate(df)
    case QuantileMethod.Exact =>
      // All quantiles in one operator call: the bracket passes share scans.
      graft.operators.Quantiles.exactQuantiles(df, column, qs.map(_._1)) match {
        case None     => fromValues(qs.map(_ => null))
        case Some(vs) => fromValues(vs)
      }
  }
  def fromAggregates(values: Seq[Any]): ConstraintResult = fromValues(values)
  private def fromValues(values: Seq[Any]): ConstraintResult = {
    val outcomes = qs.zip(values).map { case ((q, a), v) =>
      val d = Num.toDouble(v)
      (q, d, d.map(a(_)))
    }
    val metric = MetricValue.VectorMetric(outcomes.flatMap(_._2))
    // Same severity order as MultiStatisticConstraint: concrete failures first, then
    // undefined-⇒-Skipped (an undefined quantile — empty/all-null input — previously
    // read as PASSING via Option.forall).
    val failed = outcomes.filter(_._3.contains(false))
    if (failed.nonEmpty)
      failure(Some(metric), s"quantiles failing: ${failed.map(_._1).mkString(",")}")
    else if (outcomes.exists(_._2.isEmpty))
      skipped("quantile undefined on empty input")
    else success(metric)
  }
}
