package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential integrity: child keys must exist in the parent
  * (reference: constraints/foreign_key.rs:151-201). Implemented as a LEFT ANTI join —
  * Spark plans it as a broadcast-hash anti join when the parent's key set is small, else
  * shuffled hash; no row-widening like the reference's LEFT JOIN + IS NULL count.
  */
final case class ForeignKeyConstraint(
    parent: DataFrame,
    keys: Seq[(String, String)], // (childCol, parentCol)
    ignoreNulls: Boolean = true,
    maxExamples: Int = 5) extends MultiJobConstraint {
  val name = s"ForeignKey(${keys.map { case (c, p) => s"$c->$p" }.mkString(",")})"
  override def evaluate(child: DataFrame): ConstraintResult = {
    val childKeys = keys.map(_._1)
    val base = if (ignoreNulls) child.na.drop(childKeys) else child
    val parentKeys = parent.select(keys.map { case (_, p) => col(p) }: _*).distinct()
    val cond = keys.map { case (c, p) => base(c) <=> parentKeys(p) }.reduce(_ && _)
    // Persist across the two actions (count + example sampling): uncached, the
    // failure path re-runs the anti-join — a second full scan of the child table —
    // and on a concurrently-appended source the two scans could even disagree
    // (N orphans reported with an empty example list). Same two-action pattern as
    // Distribution.counts.
    val orphanRows = base.join(parentKeys, cond, "left_anti")
      .select(childKeys.map(col): _*).persist()
    try {
      val orphans = orphanRows.count()
      if (orphans == 0L) success(MetricValue.LongMetric(0L))
      else {
        val examples = orphanRows.distinct()
          .limit(maxExamples).collect()
          .map(_.toSeq.mkString("(", ",", ")")).mkString(", ")
        failure(Some(MetricValue.LongMetric(orphans)),
          s"$orphans orphan row(s); examples: $examples")
      }
    } finally orphanRows.unpersist(blocking = false)
  }
}

/** Join coverage: fraction of rows on one (or both) side(s) with a match
  * (reference: constraints/join_coverage.rs:80-87,195-316). One scan of the probe side
  * per direction; joining against distinct keys avoids row multiplication.
  */
sealed trait CoverageMode
object CoverageMode {
  case object LeftCoverage  extends CoverageMode
  case object RightCoverage extends CoverageMode
  case object Bidirectional extends CoverageMode
}
final case class JoinCoverageConstraint(
    right: DataFrame,
    keys: Seq[(String, String)], // (leftCol, rightCol)
    mode: CoverageMode,
    assertion: Assertion) extends MultiJobConstraint {
  val name = s"JoinCoverage($mode) ${assertion.describe}"
  /** One scan of the (large) probe side `a`: left join against `b`'s distinct keys with
    * a match marker, then total and covered from the same aggregation (distinct keys
    * can't multiply probe rows).
    */
  private def coverage(a: DataFrame, b: DataFrame, ks: Seq[(String, String)]): Option[Double] = {
    // Same marker-collision guard as Metrics.joinCoverage: a probe-side "_matched"
    // makes the count ambiguous; a b-side KEY named "_matched" would be silently
    // REPLACED by the constant marker (degenerating the join condition).
    require(!a.columns.contains("_matched") && !ks.exists(_._2 == "_matched"),
      "join coverage reserves the column name _matched; rename the input column")
    val bKeys = b.select(ks.map { case (_, r) => col(r) }: _*).distinct()
      .withColumn("_matched", lit(1))
    // Plain equality: a NULL probe key must count as UNCOVERED (null-safe <=> would
    // match it against a NULL key row surviving b's distinct()).
    val cond = ks.map { case (l, r) => a(l) === bKeys(r) }.reduce(_ && _)
    val row = a.join(bKeys, cond, "left")
      .agg(count(lit(1)).as("total"), count(col("_matched")).as("covered")).head()
    if (row.getLong(0) == 0L) None
    else Some(row.getLong(1).toDouble / row.getLong(0))
  }
  override def evaluate(left: DataFrame): ConstraintResult = {
    val fwd = keys
    val rev = keys.map(_.swap)
    val value = mode match {
      case CoverageMode.LeftCoverage  => coverage(left, right, fwd)
      case CoverageMode.RightCoverage => coverage(right, left, rev)
      case CoverageMode.Bidirectional =>
        // One empty side must NOT skip the whole check: the non-empty side's coverage
        // against an empty table is a well-defined 0.0 that should be judged (a feed
        // delivering zero rows is a failure, not a skip). min over the DEFINED sides;
        // skip only when both are empty.
        (coverage(left, right, fwd), coverage(right, left, rev)) match {
          case (Some(l), Some(r)) => Some(math.min(l, r))
          case (l, r)             => l.orElse(r)
        }
    }
    value match {
      case None    => skipped("empty input")
      case Some(v) => assertOn(v, assertion)
    }
  }
}

/** Cross-table sum reconciliation (reference: constraints/cross_table_sum.rs:187-280).
  * Ungrouped: two scalar aggs compared with tolerance. Grouped: per-key sums on both
  * sides FULL OUTER joined on the group key, counting groups whose difference exceeds
  * the tolerance — one shuffle per side on the group key, then a key-partitioned join.
  */
final case class CrossTableSumConstraint(
    other: DataFrame,
    leftExpr: Column,
    rightExpr: Column,
    tolerance: Double = 1e-9,
    groupKeys: Seq[(String, String)] = Nil) extends MultiJobConstraint {
  val name = if (groupKeys.isEmpty) "CrossTableSum" else s"CrossTableSum by ${groupKeys.map(_._1).mkString(",")}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    if (groupKeys.isEmpty) {
      val lOpt = Num.toDouble(df.agg(sum(leftExpr)).head().get(0))
      val rOpt = Num.toDouble(other.agg(sum(rightExpr)).head().get(0))
      // Null sums (empty/all-null side) must SKIP, not coerce to 0.0 — coercing both
      // sides made total data loss reconcile as |0 - 0| = 0 and report Success.
      if (lOpt.isEmpty && rOpt.isEmpty) return skipped("no data to reconcile on either side")
      val l = lOpt.getOrElse(0.0)
      val r = rOpt.getOrElse(0.0)
      val diff = math.abs(l - r)
      if (diff <= tolerance) success(MetricValue.DoubleMetric(diff))
      else failure(Some(MetricValue.DoubleMetric(diff)), f"sums differ: $l vs $r (|Δ|=$diff%.6g > $tolerance)")
    } else {
      val lKeys = groupKeys.map(_._1)
      val rKeys = groupKeys.map(_._2)
      val ls = df.groupBy(lKeys.map(col): _*).agg(sum(leftExpr).as("l_sum"))
      val rs = other.groupBy(rKeys.map(col): _*).agg(sum(rightExpr).as("r_sum"))
      val cond = groupKeys.map { case (l, r) => ls(l) <=> rs(r) }.reduce(_ && _)
      val joined = ls.join(rs, cond, "full_outer")
      val violations = joined.filter(
        abs(coalesce(col("l_sum"), lit(0.0)).cast("double")
          .minus(coalesce(col("r_sum"), lit(0.0)).cast("double"))) > tolerance).count()
      if (violations == 0L) success(MetricValue.LongMetric(0L))
      else failure(Some(MetricValue.LongMetric(violations)), s"$violations group(s) exceed tolerance $tolerance")
    }
  }
}
