package graft.core

import graft.constraints._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Fluent check builder mirroring the reference's surface
  * (term-guard/src/core/check.rs:172-2330) in idiomatic Scala.
  *
  * {{{
  * val check = CheckBuilder("orders are sane", Level.Error)
  *   .hasSize(Assertion.GreaterThan(0))
  *   .isComplete("o_orderkey")
  *   .isUnique("o_orderkey")
  *   .isContainedIn("o_orderstatus", Seq("O", "F", "P"))
  *   .hasMean("o_totalprice", Assertion.Between(0, 1e6))
  *   .build()
  * }}}
  */
final class CheckBuilder(val description: String, val level: Level = Level.Error) {
  // Plain class, NOT a case class: case-class copy()/equals would ignore the mutable
  // constraint buffer (a copy would silently build an EMPTY check that passes
  // vacuously).
  private val cs = scala.collection.mutable.ArrayBuffer.empty[Constraint]
  private def add(c: Constraint): CheckBuilder = { cs += c; this }

  // --- size / schema ---
  def hasSize(a: Assertion): CheckBuilder = add(SizeConstraint(a))
  def hasColumnCount(a: Assertion): CheckBuilder = add(ColumnCountConstraint(a))
  def containsColumn(c: String): CheckBuilder = add(ContainsColumnConstraint(c))

  // --- completeness ---
  def isComplete(c: String): CheckBuilder = add(CompletenessConstraint.complete(c))
  def hasCompleteness(c: String, a: Assertion): CheckBuilder = add(CompletenessConstraint(c, a))
  def areComplete(cols: Seq[String], threshold: Double = 1.0): CheckBuilder =
    add(MultiColumnCompletenessConstraint(cols, threshold, LogicalOp.All))
  def anyComplete(cols: Seq[String], threshold: Double = 1.0): CheckBuilder =
    add(MultiColumnCompletenessConstraint(cols, threshold, LogicalOp.Any))
  def atLeastComplete(n: Int, cols: Seq[String], threshold: Double = 1.0): CheckBuilder =
    add(MultiColumnCompletenessConstraint(cols, threshold, LogicalOp.AtLeast(n)))
  def atMostComplete(n: Int, cols: Seq[String], threshold: Double = 1.0): CheckBuilder =
    add(MultiColumnCompletenessConstraint(cols, threshold, LogicalOp.AtMost(n)))
  def exactlyComplete(n: Int, cols: Seq[String], threshold: Double = 1.0): CheckBuilder =
    add(MultiColumnCompletenessConstraint(cols, threshold, LogicalOp.Exactly(n)))
  def groupedCompleteness(c: String, groups: Seq[String], threshold: Double): CheckBuilder =
    add(GroupedCompletenessConstraint(c, groups, threshold))

  // --- uniqueness ---
  def isUnique(cols: String*): CheckBuilder = add(UniquenessConstraint(cols))
  def hasUniqueness(cols: Seq[String], a: Assertion, mode: NullMode = NullMode.Exclude): CheckBuilder =
    add(UniquenessConstraint(cols, a, mode))
  def hasDistinctness(cols: Seq[String], a: Assertion): CheckBuilder = add(DistinctnessConstraint(cols, a))
  def hasUniqueValueRatio(cols: Seq[String], a: Assertion): CheckBuilder = add(UniqueValueRatioConstraint(cols, a))
  def isPrimaryKey(cols: String*): CheckBuilder = add(PrimaryKeyConstraint(cols))
  def hasApproxCountDistinct(c: String, a: Assertion, rsd: Double = 0.05): CheckBuilder =
    add(ApproxCountDistinctConstraint(c, a, rsd))

  // --- statistics ---
  def hasMin(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.Min, a))
  def hasMax(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.Max, a))
  def hasMean(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.Mean, a))
  def hasSum(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.Sum, a))
  def hasStandardDeviation(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.StdDev, a))
  def hasVariance(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.Variance, a))
  def hasMedian(c: String, a: Assertion): CheckBuilder = add(StatisticConstraint(c, Stat.Median, a))
  def hasQuantile(c: String, q: Double, a: Assertion,
      method: QuantileMethod = QuantileMethod.Approximate): CheckBuilder =
    add(QuantileConstraint(c, q, a, method))
  /** Multi-quantile in one scan (reference: constraints/quantile.rs:344-346). */
  def hasQuantiles(c: String, qs: Seq[(Double, Assertion)],
      method: QuantileMethod = QuantileMethod.Approximate): CheckBuilder =
    add(MultiQuantileConstraint(c, qs, method))
  def hasStatistics(c: String, stats: (Stat, Assertion)*): CheckBuilder =
    add(MultiStatisticConstraint(c, stats))
  def hasCorrelation(c1: String, c2: String, a: Assertion): CheckBuilder = add(CorrelationConstraint(c1, c2, a))
  def hasCovariance(c1: String, c2: String, a: Assertion): CheckBuilder = add(CovarianceConstraint(c1, c2, a))
  def hasEntropy(c: String, a: Assertion): CheckBuilder = add(EntropyConstraint(c, a))
  def hasMutualInformation(c1: String, c2: String, a: Assertion): CheckBuilder =
    add(MutualInformationConstraint(c1, c2, a))
  def hasHistogramSatisfying(c: String, desc: String)(f: Histogram => Boolean): CheckBuilder =
    add(HistogramConstraint(c, f, description = desc))

  // --- content ---
  def isContainedIn(c: String, allowed: Seq[Any]): CheckBuilder =
    add(ComplianceConstraint.containedIn(c, allowed))
  def isContainedIn(c: String, allowed: Seq[Any], a: Assertion): CheckBuilder =
    add(ComplianceConstraint.containedIn(c, allowed, a))
  def satisfies(predicateSql: String, label: String,
      a: Assertion = Assertion.GreaterThanOrEqual(1.0)): CheckBuilder =
    add(ComplianceConstraint.satisfies(predicateSql, label, a))
  def satisfiesColumn(predicate: Column, label: String, a: Assertion): CheckBuilder =
    add(ComplianceConstraint(label, predicate, a))
  def hasPattern(c: String, regex: String, a: Assertion = Assertion.GreaterThanOrEqual(1.0)): CheckBuilder =
    add(PatternConstraint(c, regex, a))
  def hasFormat(c: String, f: FormatType, a: Assertion = Assertion.GreaterThanOrEqual(1.0)): CheckBuilder =
    add(FormatConstraint(c, f, a))
  def detectsFormat(c: String, f: FormatType, a: Assertion): CheckBuilder =
    add(FormatConstraint(c, f, a, detect = true))
  def hasMinLength(c: String, a: Assertion): CheckBuilder = add(LengthConstraint(c, a, Stat.Min))
  def hasMaxLength(c: String, a: Assertion): CheckBuilder = add(LengthConstraint(c, a, Stat.Max))
  def hasDataType(c: String, expected: String, threshold: Double = 1.0): CheckBuilder =
    add(TypeConsistencyConstraint(c, threshold, Some(expected)))
  def hasConsistentType(c: String, threshold: Double = 0.95): CheckBuilder =
    add(TypeConsistencyConstraint(c, threshold))
  /** At least `a` fraction of non-null docs must have duplicate char-n-gram fraction
    * <= maxFraction (Gopher-style repetition quality gate; batches into the shared scan).
    */
  def hasLowRepetition(c: String, n: Int, maxFraction: Double,
      a: Assertion = Assertion.GreaterThanOrEqual(1.0)): CheckBuilder =
    add(ComplianceConstraint(s"dup $n-gram fraction of $c <= $maxFraction",
      graft.functions.TextFunctions.dupNgramFraction(col(c), n) <= maxFraction, a,
      ignoreNulls = Some(col(c))))
  /** Fraction of validated docs sharing any word n-gram with `corpus` must satisfy `a`
    * (default: zero contaminated docs) — GPT-3-style eval-set decontamination.
    */
  def isDecontaminatedAgainst(corpus: DataFrame, corpusTextCol: String,
      idCol: String, textCol: String, ngramWords: Int = 8,
      a: Assertion = Assertion.Equals(0.0)): CheckBuilder =
    add(DecontaminationConstraint(corpus, corpusTextCol, idCol, textCol, ngramWords, a))
  /** At least `a` fraction of non-null docs must carry NO PII (default: all clean) —
    * the scrub-before-training gate, batched into the shared scan.
    */
  def hasNoPii(c: String,
      patterns: Seq[graft.operators.PiiPattern] = graft.operators.Pii.Defaults,
      a: Assertion = Assertion.GreaterThanOrEqual(1.0)): CheckBuilder =
    add(ComplianceConstraint(s"no PII in $c",
      !graft.operators.Pii.containsPii(col(c), patterns), a, ignoreNulls = Some(col(c))))
  /** PSI of `c`'s distribution against the pinned `ref` dataset must satisfy `a`
    * (default: below 0.25, the "significant drift" convention).
    */
  def hasStableDistribution(ref: DataFrame, c: String,
      a: Assertion = Assertion.LessThan(0.25)): CheckBuilder =
    add(DistributionStabilityConstraint(ref, c, a))

  // --- relational ---
  def hasForeignKey(parent: DataFrame, keys: (String, String)*): CheckBuilder =
    add(ForeignKeyConstraint(parent, keys))
  def hasJoinCoverage(right: DataFrame, keys: Seq[(String, String)], mode: CoverageMode, a: Assertion): CheckBuilder =
    add(JoinCoverageConstraint(right, keys, mode, a))
  def hasMatchingSum(other: DataFrame, leftExpr: Column, rightExpr: Column,
      tolerance: Double = 1e-9, groupKeys: Seq[(String, String)] = Nil): CheckBuilder =
    add(CrossTableSumConstraint(other, leftExpr, rightExpr, tolerance, groupKeys))

  // --- temporal ---
  def isInDateRange(ts: String, from: String, to: String): CheckBuilder = add(DateRangeConstraint(ts, from, to))
  def isInBusinessHours(ts: String, start: String = "09:00", end: String = "17:00",
      businessDaysOnly: Boolean = true, a: Assertion = Assertion.GreaterThanOrEqual(1.0)): CheckBuilder =
    add(BusinessHoursConstraint(ts, start, end, businessDaysOnly, a))
  /** Whole-hour Int surface, matching the constraint companion's compat constructor. */
  def isInBusinessHours(ts: String, startHour: Int, endHour: Int,
      businessDaysOnly: Boolean, a: Assertion): CheckBuilder =
    add(BusinessHoursConstraint(ts, startHour, endHour, businessDaysOnly, a))
  def isBefore(before: String, after: String, strict: Boolean = false): CheckBuilder =
    add(BeforeAfterConstraint(before, after, strict))
  def hasMaxTimeGap(ts: String, partitionBy: Seq[String], maxGapSeconds: Long): CheckBuilder =
    add(MaxTimeGapConstraint(ts, partitionBy, maxGapSeconds))
  def isMonotonic(value: String, order: String, partitionBy: Seq[String] = Nil): CheckBuilder =
    add(MonotonicConstraint(value, order, partitionBy))

  // --- escape hatch ---
  def withConstraint(c: Constraint): CheckBuilder = add(c)

  def build(): Check = Check(description, level, cs.toVector)
}

object CheckBuilder {
  def apply(description: String, level: Level = Level.Error): CheckBuilder =
    new CheckBuilder(description, level)
}
