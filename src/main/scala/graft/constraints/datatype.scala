package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-level inferred data types (reference: analyzers/inference.rs:75-131,
  * analyzers/advanced/data_type.rs:129-150). Classification is a chained try_cast CASE —
  * a single codegen'd projection, aggregated as conditional counts in the shared scan.
  */
object InferredType extends Enumeration {
  val Null, Boolean, Integer, Fractional, Date, Timestamp, Text = Value

  /** CASE expression classifying one value; mirrors data_type.rs:129-150 but uses
    * Spark's ANSI try_cast.
    */
  def classifier(column: String): Column = {
    val c = col(column).cast("string")
    // NOTE: rlike instead of lower().isin(...) — first use of lower()/upper() in a JVM
    // pays a multi-second collation-init cost in Spark 4; Java-regex (?i) does not.
    //
    // Every branch classifies the STRING form `c` (Column.try_cast, no SQL-string
    // round-trip): try_cast on the RAW column gave wrong answers for non-string
    // inputs — a DOUBLE value 1.5 BIGINT-casts by truncation (everything "integer"),
    // a DATE column's cast to BIGINT fails ANALYSIS and sank the shared scan — and
    // mixing col() with backticked expr() split nested-name semantics between
    // branches. Value-level inference is defined on the value's text, which is also
    // exactly what the DuckDB oracle models.
    when(col(column).isNull, "null")
      .when(c.rlike("(?i)^\\s*(true|false)\\s*$"), "boolean")
      .when(c.try_cast("bigint").isNotNull, "integer")
      .when(c.try_cast("double").isNotNull, "fractional")
      // "date" only for strictly date-SHAPED strings: Spark's string→DATE cast accepts
      // full timestamps too (truncating), which would make the timestamp branch
      // unreachable if tested on cast success alone.
      .when(c.rlike("^\\s*\\d{4}-\\d{1,2}-\\d{1,2}\\s*$") &&
        c.try_cast("date").isNotNull, "date")
      .when(c.try_cast("timestamp").isNotNull, "timestamp")
      .otherwise("text")
  }
  val labels = Seq("null", "boolean", "integer", "fractional", "date", "timestamp", "text")
}

/** Type-consistency constraint: dominant inferred type must cover >= threshold of
  * non-null values (reference: constraints/consistency.rs:66-80, constraints/datatype.rs:142-170).
  */
final case class TypeConsistencyConstraint(
    column: String,
    threshold: Double,
    expected: Option[String] = None) extends Constraint {
  require(expected.forall(InferredType.labels.contains),
    s"unknown inferred-type label ${expected.orNull}; valid: ${InferredType.labels.mkString(", ")}")
  val name = expected match {
    case Some(t) => s"DataType($column == $t) >= $threshold"
    case None    => s"TypeConsistency($column) >= $threshold"
  }
  private val cls = InferredType.classifier(column)
  val aggregates: Seq[Column] =
    InferredType.labels.map(l => sum(when(cls === l, 1L).otherwise(0L)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val counts = InferredType.labels.zip(values.map(v => Num.toLong(v).getOrElse(0L))).toMap
    val nonNull = counts.filter(_._1 != "null").values.sum
    if (nonNull == 0L) return skipped("no non-null values")
    // Dominant type in fixed label order (maxBy keeps the FIRST max): a HashMap maxBy
    // picks an arbitrary label on count ties.
    val (domType, domCount) = InferredType.labels.filter(_ != "null")
      .map(l => l -> counts(l)).maxBy(_._2)
    val metric = MetricValue.MapMetric(counts.map { case (k, v) => k -> MetricValue.LongMetric(v) })
    expected match {
      case Some(t) =>
        val ratio = counts.getOrElse(t, 0L).toDouble / nonNull
        if (ratio >= threshold) success(metric)
        else failure(Some(metric), f"only ${ratio * 100}%.2f%% of values are $t (need ${threshold * 100}%.0f%%)")
      case None =>
        val ratio = domCount.toDouble / nonNull
        if (ratio >= threshold) success(metric, s"dominant type $domType")
        else failure(Some(metric), f"dominant type $domType covers only ${ratio * 100}%.2f%%")
    }
  }
}
