package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared groupBy-count machinery for distribution-shaped metrics. All are two-phase:
  * a map-side-combined `groupBy(col).count()` (shuffle on the value — bounded by
  * cardinality, not row count), then a tiny aggregation over the counts.
  * High-cardinality columns are guarded by `maxBuckets` top-N truncation with a
  * true-total correction (reference: analyzers/advanced/entropy.rs:204-330).
  */
object Distribution {
  /** value→count plus true totals, truncated to top `maxBuckets` by frequency.
    * ONE input scan: totals are derived from the grouped counts (both consumers share
    * the groupBy's exchange) — the previous input-level agg was a full second table
    * pass. distinctCount is counted over the SAME string rendering as the buckets, so
    * `buckets.size` can never disagree with it (a raw countDistinct normalizes
    * 0.0/-0.0 into one value while the string-keyed buckets split them).
    */
  def counts(df: DataFrame, column: String, maxBuckets: Int): (Seq[(String, Long)], Long, Long, Long) = {
    // persist the grouped frame: the totals agg and the top-N are two separate
    // ACTIONS (independent query executions), and exchange reuse only applies within
    // one plan — without the persist each consumer re-scans and re-shuffles the full
    // input. The cached frame is one row per distinct value (already reduced), far
    // smaller than the input it replaces a second pass over.
    val grouped = df.groupBy(col(column).cast("string").as("value")).count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val t = grouped.agg(
        coalesce(sum(col("count")), lit(0L)),
        coalesce(sum(when(col("value").isNotNull, col("count"))), lit(0L)),
        count(col("value"))).head()
      val (total, nonNull, distinct) = (t.getLong(0), t.getLong(1), t.getLong(2))
      val top = grouped.filter(col("value").isNotNull)
        .orderBy(col("count").desc, col("value"))
        .limit(maxBuckets)
        .collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      (top, total, nonNull, distinct)
    } finally grouped.unpersist(blocking = false)
  }
}

/** Histogram constraint: value distribution checked by a user assertion closure
  * (reference: constraints/histogram.rs:130,214-240 — `HistogramAssertion`).
  */
final case class HistogramConstraint(
    column: String,
    assertion: Histogram => Boolean,
    maxBuckets: Int = 1000,
    description: String = "histogram assertion") extends MultiJobConstraint {
  val name = s"Histogram($column) $description"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val (top, total, nonNull, distinct) = Distribution.counts(df, column, maxBuckets)
    if (total == 0L) return skipped("empty input")
    if (nonNull == 0L) return skipped("no non-null values")
    // Bucket ratios over the NON-NULL count — the reference divides by
    // (total_cnt - null_cnt) (histogram.rs ratio), and Metrics.histogram agrees.
    val hist = Histogram(
      buckets = top.map { case (v, c) => v -> HistogramBucket(c, c.toDouble / nonNull) }.toMap,
      total = total, distinctCount = distinct, nullCount = total - nonNull)
    val metric = MetricValue.HistogramMetric(hist)
    if (assertion(hist)) success(metric)
    else failure(Some(metric), s"histogram does not satisfy: $description")
  }
}

/** Shannon entropy −Σ p·ln p over the value distribution, with the reference's top-N
  * truncation + unobserved-mass correction (entropy.rs:230-330): probabilities use the
  * TRUE non-null total, so truncated tail mass lowers the (partial) entropy rather than
  * skewing the observed buckets.
  */
final case class EntropyConstraint(column: String, assertion: Assertion)
    extends MultiJobConstraint {
  val name = s"Entropy($column) ${assertion.describe}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val filtered = df.filter(col(column).isNotNull)
    // Single distributed pass: groupBy counts, then entropy terms aggregated in one
    // agg. EXACT at any cardinality — the reference's top-N truncation + true-total
    // correction (entropy.rs:204-330) exists because it collects per-value counts to
    // the driver; nothing is collected here, so no truncation is needed and none is
    // offered.
    val row = filtered.groupBy(col(column)).count()
      .agg(sum(col("count")), sum(col("count") * log(col("count")))).head()
    if (row.isNullAt(0)) return skipped("no non-null values")
    val n = row.getLong(0).toDouble
    val sumClogC = row.getDouble(1)
    // −Σ (c/n)·ln(c/n) = ln(n) − (Σ c·ln c)/n — exact, no per-bucket collect.
    val entropy = math.log(n) - sumClogC / n
    assertOn(entropy, assertion)
  }
}

/** Mutual information over the joint distribution of two columns
  * (reference: analyzers/advanced/mutual_information.rs:143-290). Numeric columns can be
  * pre-binned by the caller (see [[MutualInformationConstraint.binned]]).
  * Computed in three distributed aggs (joint + two marginals via rollup-free groupBys);
  * the MI sum itself runs as one agg over the joint counts joined to marginals.
  */
final case class MutualInformationConstraint(
    c1: String, c2: String, assertion: Assertion) extends MultiJobConstraint {
  val name = s"MutualInformation($c1,$c2) ${assertion.describe}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val d = df.filter(col(c1).isNotNull && col(c2).isNotNull)
      .select(col(c1).cast("string").as("x"), col(c2).cast("string").as("y"))
    // ONE scan of the data: the joint distribution; marginals are re-aggregations of
    // the (cardinality-bounded) joint counts, not extra passes over the input.
    val joint = d.groupBy("x", "y").count().withColumnRenamed("count", "nxy")
    // Marginals as window sums OVER the joint counts (same shape as
    // Metrics.mutualInformation): no joins to broadcast — an unconditional
    // broadcast(marginal) would collect an unbounded-cardinality frame to the driver.
    // MI = Σ (nxy/n)·ln(n·nxy/(nx·ny)); n folded in at the end.
    import org.apache.spark.sql.expressions.Window
    val row = joint
      .withColumn("nx", sum(col("nxy")).over(Window.partitionBy("x")))
      .withColumn("ny", sum(col("nxy")).over(Window.partitionBy("y")))
      .agg(
        sum(col("nxy")),
        sum(col("nxy") * (log(col("nxy")) - log(col("nx")) - log(col("ny")))))
      .head()
    if (row.isNullAt(0)) return skipped("no joint observations")
    val n = row.getLong(0).toDouble
    val s = row.getDouble(1)
    val mi = s / n + math.log(n)
    assertOn(mi, assertion)
  }
}
object MutualInformationConstraint {
  /** Pre-bin a numeric column: FLOOR((x-min)/width) (reference: mutual_information.rs:238). */
  def binExpr(column: String, minV: Double, width: Double): Column =
    floor((col(column) - lit(minV)) / lit(width))
}

/** Completeness per group with worst-first ordering and max-group overflow guard
  * (reference: analyzers/basic/grouped_completeness.rs:110-140; GroupingConfig
  * analyzers/grouped.rs:17-60 — max 10k groups, TopK overflow strategy). The LIMIT
  * guard keeps driver memory bounded no matter the group cardinality.
  */
final case class GroupedCompletenessConstraint(
    column: String,
    groupColumns: Seq[String],
    threshold: Double,
    maxGroups: Int = 10000) extends MultiJobConstraint {
  // maxGroups <= 0 would take(0) groups and report an unconditional vacuous Success
  // with a fabricated worst = 1.0 — same guard class as MultiColumnCompleteness's
  // nonEmpty require.
  require(maxGroups > 0, s"maxGroups must be positive, got $maxGroups")
  val name = s"GroupedCompleteness($column by ${groupColumns.mkString(",")}) >= $threshold"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val grouped = df.groupBy(groupColumns.map(col): _*)
      .agg(count(lit(1)).as("total"), count(col(column)).as("non_null"))
      .withColumn("completeness", col("non_null") / col("total"))
      // Group-column tiebreak: ties AT the truncation boundary would otherwise retain
      // a shuffle-order-dependent subset, making the reported examples (and the
      // truncation flag's meaning) vary run to run.
      .orderBy(col("completeness").asc +: groupColumns.map(col(_).asc): _*)
      .limit(maxGroups + 1)
      .collect()
    if (grouped.isEmpty) return skipped("empty input")
    val truncated = grouped.length > maxGroups
    val rows = grouped.take(maxGroups)
    val failing = rows.filter(_.getAs[Double]("completeness") < threshold)
    val worst = rows.headOption.map(_.getAs[Double]("completeness")).getOrElse(1.0)
    val metric = MetricValue.DoubleMetric(worst)
    if (failing.isEmpty)
      success(metric, if (truncated) s"(truncated to $maxGroups groups)" else "")
    else {
      val examples = failing.take(5).map { r =>
        val key = groupColumns.map(g => s"$g=${r.getAs[Any](g)}").mkString(",")
        f"$key:${r.getAs[Double]("completeness")}%.4f"
      }.mkString("; ")
      // Worst-first ordering means a FULL page of failing rows implies more beyond
      // the truncation point — say so instead of undercounting.
      val n = if (truncated && failing.length == rows.length) s"at least ${failing.length}"
        else failing.length.toString
      failure(Some(metric), s"$n group(s) below $threshold: $examples")
    }
  }
}

/** Distribution drift as a first-class constraint: PSI of the validated dataset's
  * `column` distribution against a pinned reference dataset must satisfy the
  * assertion (default: below 0.25, the "significant drift" convention). Join-based —
  * runs its own jobs via [[graft.operators.Drift.psi]]: each side collapses to its
  * per-category counts first, so nothing data-scale moves twice. Complements the
  * time-series anomaly detectors (one statistic over time) with a whole-distribution
  * comparison against a fixed baseline.
  */
final case class DistributionStabilityConstraint(
    ref: DataFrame,
    column: String,
    assertion: Assertion = Assertion.LessThan(0.25),
    epsilon: Double = 1e-6) extends MultiJobConstraint {
  val name = s"DistributionStability($column PSI) ${assertion.describe}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val row = graft.operators.Drift.psi(ref, df, column, epsilon).head()
    // NULL PSI = one side had no rows: nothing to compare, not a drift verdict.
    if (row.isNullAt(0)) skipped("empty reference or current distribution")
    else assertOn(row.getDouble(0), assertion)
  }
}
