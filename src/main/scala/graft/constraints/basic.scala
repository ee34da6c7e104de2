package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-count constraint (reference: term-guard/src/constraints/size.rs:66). */
final case class SizeConstraint(assertion: Assertion) extends Constraint {
  val name = s"Size ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(count(lit(1)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val n = Num.toLong(values.head).getOrElse(0L)
    if (assertion(n.toDouble)) success(MetricValue.LongMetric(n))
    else failure(Some(MetricValue.LongMetric(n)), s"row count $n does not satisfy ${assertion.describe}")
  }
}

/** Non-null ratio constraint (reference: constraints/completeness.rs:158-163).
  * Empty table ⇒ Skipped (completeness.rs:170-201).
  */
final case class CompletenessConstraint(column: String, assertion: Assertion)
    extends Constraint {
  val name = s"Completeness($column) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(count(lit(1)), count(col(column)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val total = Num.toLong(values(0)).getOrElse(0L)
    val nonNull = Num.toLong(values(1)).getOrElse(0L)
    if (total == 0L) skipped("empty input")
    else assertOn(nonNull.toDouble / total.toDouble, assertion)
  }
}
object CompletenessConstraint {
  def complete(column: String): CompletenessConstraint =
    CompletenessConstraint(column, Assertion.GreaterThanOrEqual(1.0))
  def threshold(column: String, t: Double): CompletenessConstraint =
    CompletenessConstraint(column, Assertion.GreaterThanOrEqual(t))
}

/** Multi-column completeness combined with a logical operator
  * (reference: core/check.rs:2233-2303, core/logical.rs:32-113).
  * Each column contributes one conditional count; combination happens driver-side.
  */
final case class MultiColumnCompletenessConstraint(
    columns: Seq[String],
    threshold: Double,
    op: LogicalOp) extends Constraint {
  // An accidentally-empty dynamic column list would vacuously succeed (All.holds(0,0)
  // is true) — the check would report Success having verified nothing.
  require(columns.nonEmpty, "MultiColumnCompletenessConstraint needs at least one column")
  val name = s"${op.describe}Complete(${columns.mkString(",")}) >= $threshold"
  val aggregates: Seq[Column] = count(lit(1)) +: columns.map(c => count(col(c)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val total = Num.toLong(values.head).getOrElse(0L)
    if (total == 0L) return skipped("empty input")
    val ratios = values.drop(1).map(v => Num.toLong(v).getOrElse(0L).toDouble / total)
    val satisfied = ratios.count(_ >= threshold)
    val ok = op.holds(satisfied, columns.size)
    val metric = MetricValue.DoubleMetric(satisfied.toDouble)
    if (ok) success(metric)
    else failure(Some(metric),
      s"$satisfied of ${columns.size} columns meet completeness >= $threshold; requires ${op.describe}")
  }
}

/** Logical combinators over N per-column outcomes (reference: core/logical.rs:32-113). */
sealed trait LogicalOp {
  def holds(satisfied: Int, total: Int): Boolean
  def describe: String
}
object LogicalOp {
  case object All extends LogicalOp {
    def holds(s: Int, t: Int) = s == t;  val describe = "all"
  }
  case object Any extends LogicalOp {
    def holds(s: Int, t: Int) = s >= 1;  val describe = "any"
  }
  final case class AtLeast(n: Int) extends LogicalOp {
    def holds(s: Int, t: Int) = s >= n;  val describe = s"atLeast($n)"
  }
  final case class AtMost(n: Int) extends LogicalOp {
    def holds(s: Int, t: Int) = s <= n;  val describe = s"atMost($n)"
  }
  final case class Exactly(n: Int) extends LogicalOp {
    def holds(s: Int, t: Int) = s == n;  val describe = s"exactly($n)"
  }
}

/** Schema-arity constraint — no scan needed (reference: constraints/column_count.rs:51-66). */
final case class ColumnCountConstraint(assertion: Assertion) extends MultiJobConstraint {
  val name = s"ColumnCount ${assertion.describe}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val n = df.schema.fields.length
    if (assertion(n.toDouble)) success(MetricValue.LongMetric(n.toLong))
    else failure(Some(MetricValue.LongMetric(n.toLong)),
      s"column count $n does not satisfy ${assertion.describe}")
  }
}

/** Column-presence constraint (schema-only). */
final case class ContainsColumnConstraint(column: String) extends MultiJobConstraint {
  val name = s"ContainsColumn($column)"
  override def evaluate(df: DataFrame): ConstraintResult =
    if (df.columns.contains(column)) success(MetricValue.BooleanMetric(true))
    else failure(Some(MetricValue.BooleanMetric(false)), s"column $column not in schema")
}
