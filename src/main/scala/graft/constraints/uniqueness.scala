package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NULL treatment for uniqueness-style metrics (reference: constraints/uniqueness.rs:549-622). */
sealed trait NullMode
object NullMode {
  /** Rows with NULL key excluded from the distinct count (SQL default). */
  case object Exclude extends NullMode
  /** All NULLs collapse to one sentinel value (COALESCE-to-sentinel in the reference,
    * uniqueness.rs:643-647 — we use native coalesce instead of string concat).
    */
  case object IncludeAsOne extends NullMode
  /** Each NULL counts as its own distinct value. */
  case object EachDistinct extends NullMode
}

private[graft] object UniqueExprs {
  /** Distinct-count column under a NULL mode; multi-column keys use native
    * countDistinct (replacing the reference's VARCHAR-concat hack, uniqueness.rs:643-647).
    */
  def distinctCount(cols: Seq[String], mode: NullMode): Seq[Column] = mode match {
    case NullMode.Exclude =>
      Seq(countDistinct(col(cols.head), cols.drop(1).map(col): _*))
    // Single column: exact countDistinct + a has-null flag — no string cast, so
    // engine-native value equality applies (e.g. 0.0 == -0.0 for floats, which the
    // string form would split into two values).
    case NullMode.IncludeAsOne if cols.size == 1 =>
      // coalesce: max/sum over ZERO rows is NULL, which would null the whole
      // distinct-count sum downstream (count-style semantics want 0 on empty)
      Seq(countDistinct(col(cols.head)),
        coalesce(max(when(col(cols.head).isNull, 1L).otherwise(0L)), lit(0L)))
    // Multi column: countDistinct over a STRUCT of the key columns. Struct grouping
    // treats per-field NULLs as equal (all-null tuples collapse to one; (null, a) and
    // (null, b) stay DISTINCT) and normalizes -0.0/0.0 — the same semantics as
    // dropDuplicates, without the old string-concat sentinel's hazards (a value
    // literally equal to the sentinel merged with real NULLs; distinct invalid-UTF8
    // binary values conflated under the string cast). Observably identical to the
    // reference's COALESCE-composite on data without those pathologies.
    case NullMode.IncludeAsOne =>
      Seq(countDistinct(struct(cols.map(col): _*)))
    case NullMode.EachDistinct =>
      Seq(
        countDistinct(col(cols.head), cols.drop(1).map(col): _*),
        coalesce(sum(when(cols.map(c => col(c).isNull).reduce(_ || _), 1L).otherwise(0L)), lit(0L)))
  }
  def distinctOf(values: Seq[Any], mode: NullMode): Long = mode match {
    case NullMode.EachDistinct =>
      Num.toLong(values(0)).getOrElse(0L) + Num.toLong(values(1)).getOrElse(0L)
    case NullMode.IncludeAsOne if values.size == 2 => // single-column exact form
      Num.toLong(values(0)).getOrElse(0L) + Num.toLong(values(1)).getOrElse(0L)
    case _ => Num.toLong(values(0)).getOrElse(0L)
  }
}

/** Uniqueness = distinct(key) / total rows, compared to an assertion
  * (reference: constraints/uniqueness.rs:549-622).
  */
final case class UniquenessConstraint(
    columns: Seq[String],
    assertion: Assertion = Assertion.GreaterThanOrEqual(1.0),
    nullMode: NullMode = NullMode.Exclude) extends Constraint {
  require(columns.nonEmpty, "UniquenessConstraint needs at least one column")
  val name = s"Uniqueness(${columns.mkString(",")}) ${assertion.describe}"
  val aggregates: Seq[Column] =
    count(lit(1)) +: UniqueExprs.distinctCount(columns, nullMode)
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val total = Num.toLong(values.head).getOrElse(0L)
    if (total == 0L) return skipped("empty input")
    val distinct = UniqueExprs.distinctOf(values.drop(1), nullMode)
    assertOn(distinct.toDouble / total.toDouble, assertion)
  }
}

/** Distinctness = distinct(col) / count(col non-null)
  * (reference: analyzers/basic/distinctness.rs:113-114).
  */
final case class DistinctnessConstraint(columns: Seq[String], assertion: Assertion)
    extends Constraint {
  require(columns.nonEmpty, "DistinctnessConstraint needs at least one column")
  val name = s"Distinctness(${columns.mkString(",")}) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(
    count(when(columns.map(c => col(c).isNotNull).reduce(_ && _), 1L)),
    countDistinct(col(columns.head), columns.drop(1).map(col): _*))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val nonNull = Num.toLong(values(0)).getOrElse(0L)
    if (nonNull == 0L) return skipped("no non-null rows")
    val distinct = Num.toLong(values(1)).getOrElse(0L)
    assertOn(distinct.toDouble / nonNull.toDouble, assertion)
  }
}

/** Primary key: full uniqueness AND zero NULLs in key columns
  * (reference: constraints/uniqueness.rs:687-718).
  */
final case class PrimaryKeyConstraint(columns: Seq[String]) extends Constraint {
  require(columns.nonEmpty, "PrimaryKeyConstraint needs at least one column")
  val name = s"PrimaryKey(${columns.mkString(",")})"
  val aggregates: Seq[Column] = Seq(
    count(lit(1)),
    countDistinct(col(columns.head), columns.drop(1).map(col): _*),
    sum(when(columns.map(c => col(c).isNull).reduce(_ || _), 1L).otherwise(0L)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val total = Num.toLong(values(0)).getOrElse(0L)
    if (total == 0L) return skipped("empty input")
    val distinct = Num.toLong(values(1)).getOrElse(0L)
    val nulls = Num.toLong(values(2)).getOrElse(0L)
    if (nulls > 0)
      failure(Some(MetricValue.LongMetric(nulls)), s"$nulls rows with NULL key")
    else if (distinct != total)
      failure(Some(MetricValue.DoubleMetric(distinct.toDouble / total)),
        s"${total - distinct} duplicate key rows")
    else success(MetricValue.DoubleMetric(1.0))
  }
}

/** Ratio of key values appearing exactly once to distinct values
  * (reference: constraints/uniqueness.rs:661-684). groupBy shape ⇒ own job; the
  * aggregation is map-side-combined and the second pass runs over the (small) counts.
  */
final case class UniqueValueRatioConstraint(columns: Seq[String], assertion: Assertion)
    extends MultiJobConstraint {
  require(columns.nonEmpty, "UniqueValueRatioConstraint needs at least one column")
  val name = s"UniqueValueRatio(${columns.mkString(",")}) ${assertion.describe}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    val counts = df.na.drop(columns).groupBy(columns.map(col): _*).count()
    val row = counts.agg(
      sum(when(col("count") === 1L, 1L).otherwise(0L)),
      count(lit(1))).head()
    val uniques = Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val distinct = row.getLong(1)
    if (distinct == 0L) skipped("no non-null groups")
    else assertOn(uniques.toDouble / distinct.toDouble, assertion)
  }
}
