package graft.constraints

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ratio-of-rows-satisfying-predicate constraint — the shared engine behind containment,
  * compliance, format, and custom-SQL checks
  * (reference: analyzers/advanced/compliance.rs:153-158, constraints/values.rs:245-251).
  * Counts are conditional aggregates: `sum(when(p,1))` — one shared scan when batched.
  */
final case class ComplianceConstraint(
    label: String,
    predicate: Column,
    assertion: Assertion,
    ignoreNulls: Option[Column] = None) extends Constraint {
  val name = s"Compliance($label) ${assertion.describe}"
  private val base: Column = ignoreNulls match {
    case Some(c) => when(c.isNotNull, when(predicate, 1L).otherwise(0L))
    case None    => when(predicate, 1L).otherwise(0L)
  }
  private val denom: Column = ignoreNulls match {
    case Some(c) => count(c)
    case None    => count(lit(1))
  }
  val aggregates: Seq[Column] = Seq(denom, sum(base))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val total = Num.toLong(values(0)).getOrElse(0L)
    if (total == 0L) return skipped("empty input")
    val matching = Num.toLong(values(1)).getOrElse(0L)
    assertOn(matching.toDouble / total.toDouble, assertion)
  }
}

object ComplianceConstraint {
  /** Containment: fraction of non-null values in the allowed set
    * (reference: constraints/values.rs:245-251).
    */
  def containedIn(column: String, allowed: Seq[Any], assertion: Assertion = Assertion.GreaterThanOrEqual(1.0)): ComplianceConstraint =
    ComplianceConstraint(s"$column in (${allowed.mkString(",")})",
      col(column).isin(allowed: _*), assertion, ignoreNulls = Some(col(column)))

  /** Arbitrary SQL predicate after sandbox validation
    * (reference: constraints/custom_sql.rs:42-100; `satisfies` in core/check.rs:685).
    */
  def satisfies(predicateSql: String, label: String, assertion: Assertion): ComplianceConstraint = {
    Sandbox.validatePredicate(predicateSql)
    ComplianceConstraint(label, expr(predicateSql), assertion)
  }
}

/** Training-set decontamination as a first-class constraint: the fraction of validated
  * docs sharing any word `ngramWords`-gram with the reference corpus must satisfy the
  * assertion (default: exactly zero contaminated docs). Join-based — runs its own jobs
  * via [[graft.operators.Dedup.crossCorpusContamination]]; the corpus side never
  * shuffles (broadcast probe-hash semi-join at the corpus scan), so the validated
  * (probe) side must be the smaller one — eval/test sets are.
  */
final case class DecontaminationConstraint(
    corpus: DataFrame,
    corpusTextCol: String,
    idCol: String,
    textCol: String,
    ngramWords: Int = 8,
    assertion: Assertion = Assertion.Equals(0.0)) extends MultiJobConstraint {
  val name = s"Decontamination($textCol, $ngramWords-gram) ${assertion.describe}"
  override def evaluate(df: DataFrame): ConstraintResult = {
    // Denominator = distinct probe IDS, matching the numerator's granularity: the
    // operator groupBys on probe_id, so duplicate-id docs merge into ONE output row —
    // counting input ROWS here would understate the ratio whenever ids repeat (10
    // contaminated rows sharing one id: contaminated=1 vs total=10 → 0.1, not 1.0).
    // Zero-token docs (dropped by the operator as trivially uncontaminated) still
    // count: their ids are in the distinct set unless shared with a token-bearing doc,
    // in which case the id is judged by that doc — id-granular either way.
    val total = df.select(col(idCol)).distinct().count()
    if (total == 0L) skipped("empty input")
    else {
      val row = graft.operators.Dedup.crossCorpusContamination(
          corpus, df, corpusTextCol, idCol, textCol, ngramWords)
        .agg(coalesce(sum(when(col("ngrams_matched") > 0, 1L).otherwise(0L)), lit(0L))).head()
      val contaminated = Num.toLong(row.get(0)).getOrElse(0L)
      assertOn(contaminated.toDouble / total.toDouble, assertion)
    }
  }
}

/** Predicate sandbox: rejects statement-level SQL in user predicates
  * (reference: constraints/custom_sql.rs:97-190, security.rs:89-190). The Column API makes
  * injection structurally impossible; this guards the one stringly-typed entry point.
  */
object Sandbox {
  private val tokens = Seq(";", "--", "/*")
  private val keywords = Seq(
    "insert", "update", "delete", "drop", "create", "alter", "truncate",
    "grant", "revoke", "attach", "copy", "merge")
  def validatePredicate(sql: String): Unit = {
    // Scan with string literals blanked: a '--' or keyword INSIDE a quoted literal is
    // data, not SQL. Keywords match on word boundaries — the old "kw + space" form
    // missed "delete\ttable" while false-flagging literals. Spark treats DOUBLE-quoted
    // text as string literals too (default spark.sql.parser.quotedRegexColumnNames
    // off), so blank those as well — `action != "insert"` is a data comparison, not
    // an INSERT statement. ONE alternation pass, leftmost-first: two sequential
    // replaceAlls let a double-quote match SPAN two single-quoted literals (e.g.
    // `a = 'x"' ; drop t ; b = '"y'`), erasing forbidden tokens outside any literal.
    // Literal grammar includes BACKSLASH ESCAPES (\' continues the literal in Spark's
    // parser): without the \\. alternative the scan would end a literal at \' , expose
    // the literal's tail to the keyword scan, and falsely reject predicates like
    // remark != 'don\'t delete'.
    val noLiterals = sql.replaceAll(
      "'(?:[^'\\\\]|\\\\.|'')*'|\"(?:[^\"\\\\]|\\\\.|\"\")*\"", "''")
    val lower = noLiterals.toLowerCase
    tokens.foreach { t =>
      require(!lower.contains(t), s"predicate contains forbidden token '$t'")
    }
    keywords.foreach { kw =>
      require(("\\b" + kw + "\\b").r.findFirstIn(lower).isEmpty,
        s"predicate contains forbidden keyword '$kw'")
    }
  }
}

/** String-length constraint (reference: constraints/length.rs:37-43). */
final case class LengthConstraint(column: String, assertion: Assertion, stat: Stat = Stat.Max)
    extends Constraint {
  require(stat == Stat.Min || stat == Stat.Max || stat == Stat.Mean,
    s"LengthConstraint supports Min/Max/Mean, got ${stat.describe} — other stats would " +
      "silently aggregate the raw VALUES instead of their lengths")
  val name = s"Length($column).${stat.describe} ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(stat match {
    case Stat.Min  => min(length(col(column)))
    case Stat.Max  => max(length(col(column)))
    case _         => avg(length(col(column)))
  })
  def fromAggregates(values: Seq[Any]): ConstraintResult =
    Num.toDouble(values.head) match {
      case None    => skipped("no non-null values")
      case Some(v) => assertOn(v, assertion)
    }
}

/** Built-in format library (reference: FormatType::get_pattern,
  * constraints/format.rs:217-268). Patterns are kept engine-portable (no lookbehind).
  */
sealed abstract class FormatType(val label: String, val pattern: String)
object FormatType {
  case object Email extends FormatType("email", "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")
  case object Url extends FormatType("url", "^(https?|ftp)://[^\\s/$.?#].[^\\s]*$")
  case object Uuid extends FormatType("uuid", "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
  case object Ipv4 extends FormatType("ipv4", "^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$")
  // Exhaustive '::' placement alternation (RE2-safe, no lookahead): the naive
  // "{0,6}::{0,6}" form accepted >8 hextet groups (e.g. '1:2:3:4:5:6:7::8'),
  // passing malformed addresses in exactly the direction that hides bad data.
  case object Ipv6 extends FormatType("ipv6",
    "^(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|([0-9A-Fa-f]{1,4}:){1,7}:|" +
      "([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}|" +
      "([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}|" +
      "([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}|" +
      "([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}|" +
      "([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}|" +
      "[0-9A-Fa-f]{1,4}:(:[0-9A-Fa-f]{1,4}){1,6}|" +
      ":((:[0-9A-Fa-f]{1,4}){1,7}|:))$")
  case object CreditCard extends FormatType("credit_card", "^[0-9]{13,19}$")
  // Delegate to the country-parameterized patterns: the hand-copied duplicates had
  // already drifted (the old PhoneUS decoupled '+' from the '1' and accepted
  // '+4155551234'), so two checks both claiming "US phone" disagreed on the same value.
  case object PhoneUS extends FormatType("phone_us", FormatType.phonePattern(Some("US")))
  case object PostalCodeUS extends FormatType("postal_us", FormatType.postalPattern(Some("US")))
  case object Iso8601 extends FormatType("iso8601", "^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?(Z|[+-]\\d{2}:?\\d{2})?)?$")
  case object Json extends FormatType("json", "") // validated structurally, not by regex

  /** Country-parameterized phone validation (reference: format.rs:250-258). `None` (or
    * an unrecognized country, mirroring the reference's fallthrough) = generic E.164.
    */
  final case class Phone(country: Option[String] = None) extends FormatType(
    country.fold("phone_e164")(c => s"phone_${c.toLowerCase}"),
    FormatType.phonePattern(country))

  /** Country-parameterized postal-code validation (reference: format.rs:261-272).
    * `None`/unrecognized = the reference's generic 3-10 alphanumeric form.
    */
  final case class PostalCode(country: Option[String] = None) extends FormatType(
    country.fold("postal_generic")(c => s"postal_${c.toLowerCase}"),
    FormatType.postalPattern(country))

  /** US Social Security Number, usually with detect=true to FLAG presence (reference:
    * format.rs:289-295). Valid area ranges enumerated (001-899 minus 666) instead of
    * lookahead — DuckDB's RE2 oracle dialect has no lookahead.
    */
  case object SocialSecurityNumber extends FormatType("ssn",
    "^(00[1-9]|0[1-9][0-9]|[1-5][0-9]{2}|6[0-5][0-9]|66[0-5]|66[7-9]|6[7-9][0-9]|[78][0-9]{2})" +
      "-?(0[1-9]|[1-9][0-9])-?(000[1-9]|00[1-9][0-9]|0[1-9][0-9]{2}|[1-9][0-9]{3})$")

  /** Country phone patterns. Two DELIBERATE divergences from the reference
    * (format.rs:250-258), both objectively wrong there:
    *  - UK/DE/FR accept the canonical international form where the trunk '0' is
    *    dropped after +CC ("+44 20 7946 0958"); the reference requires the 0 even
    *    after +44, rejecting every correctly-formatted international number.
    *  - Generic E.164 caps at 15 digits per the spec; the reference's `[1-9]\d{0,15}`
    *    accepts 16.
    * Subscriber groups may carry the conventional internal separator (UK space
    * groupings, FR digit pairs).
    */
  private[constraints] def phonePattern(country: Option[String]): String =
    country.map(_.toUpperCase) match {
      case Some("US") | Some("CA") =>
        "^(\\+?1[-.\\s]?)?\\(?[0-9]{3}\\)?[-.\\s]?[0-9]{3}[-.\\s]?[0-9]{4}$"
      case Some("UK") =>
        "^((\\+44\\s?)?(\\(?0\\d{4}\\)?\\s?\\d{3}\\s?\\d{3}|\\(?0\\d{3}\\)?\\s?\\d{3}\\s?\\d{4}|\\(?0\\d{2}\\)?\\s?\\d{4}\\s?\\d{4})" +
          "|\\+44\\s?(\\(?\\d{4}\\)?\\s?\\d{3}\\s?\\d{3}|\\(?\\d{3}\\)?\\s?\\d{3}\\s?\\d{4}|\\(?\\d{2}\\)?\\s?\\d{4}\\s?\\d{4}))$"
      case Some("DE") =>
        "^((\\+49\\s?)?\\(?0\\d{2,5}\\)?\\s?\\d{4,12}|\\+49\\s?\\(?\\d{2,5}\\)?\\s?\\d{4,12})$"
      case Some("FR") =>
        "^((\\+33\\s?)?\\(?0\\d\\)?|\\+33\\s?[1-9])\\s?\\d{2}([\\s.-]?\\d{2}){3}$"
      case _          => "^\\+?[1-9]\\d{0,14}$" // E.164: at most 15 digits total
    }

  private[constraints] def postalPattern(country: Option[String]): String =
    country.map(_.toUpperCase) match {
      case Some("US")             => "^\\d{5}(-\\d{4})?$"
      case Some("CA")             => "^[A-Za-z]\\d[A-Za-z][ -]?\\d[A-Za-z]\\d$"
      // Uppercase-only is REFERENCE PARITY (format.rs:263 — CA accepts both cases,
      // UK does not; the asymmetric case policy is the reference's own, pinned by
      // the ConstraintSpec fixtures). Normalize case upstream for lowercase feeds.
      case Some("UK")             => "^[A-Z]{1,2}\\d[A-Z\\d]?\\s?\\d[A-Z]{2}$"
      case Some("DE") | Some("FR") => "^\\d{5}$"
      case Some("JP")             => "^\\d{3}-\\d{4}$"
      case Some("AU")             => "^\\d{4}$"
      case _                      => "^[A-Za-z0-9\\s-]{3,10}$"
    }

  val all: Seq[FormatType] = Seq(Email, Url, Uuid, Ipv4, Ipv6, CreditCard, PhoneUS,
    PostalCodeUS, Iso8601, Json, Phone(), PostalCode(), SocialSecurityNumber)
}

/** Format constraint: fraction of non-null values matching a format; `detect=true`
  * inverts the check to flag sensitive data presence (reference: format.rs:812-820).
  * JSON validity is checked structurally via try_parse_json instead of regex
  * (better than the reference's regex approach).
  */
final case class FormatConstraint(
    column: String, format: FormatType, assertion: Assertion, detect: Boolean = false)
    extends Constraint {
  val name = s"Format($column, ${format.label}${if (detect) ", detect" else ""}) ${assertion.describe}"
  // Both branches resolve the column the SAME way (Column API): the Json branch
  // previously went through a SQL-string identifier (literal name) while the regex
  // branch dot-parsed, so the same constructor string could address different
  // columns — or crash in one branch and work in the other.
  // Deliberate dotted-name semantics (constraint-layer convention, unlike the
  // Profiler whose names come from df.columns and stay literal via SqlIdent): a
  // dot here means struct-field access, as everywhere else in this package; a
  // column literally named "a.b" must be addressed as "`a.b`", Spark's own
  // col() convention.
  private val matches: Column = format match {
    case FormatType.Json => try_parse_json(col(column)).isNotNull
    case f               => col(column).rlike(f.pattern)
  }
  val aggregates: Seq[Column] = Seq(
    count(col(column)),
    sum(when(col(column).isNotNull && matches, 1L).otherwise(0L)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val nonNull = Num.toLong(values(0)).getOrElse(0L)
    if (nonNull == 0L) return skipped("no non-null values")
    val m = Num.toLong(values(1)).getOrElse(0L)
    val ratio = m.toDouble / nonNull.toDouble
    assertOn(if (detect) 1.0 - ratio else ratio, assertion)
  }
}

/** Regex-pattern constraint with a caller-supplied pattern. */
final case class PatternConstraint(column: String, pattern: String, assertion: Assertion)
    extends Constraint {
  // Fail at construction, not inside the shared batched scan: rlike compiles its
  // pattern lazily at execution, so one typo'd regex would fail the shared job at
  // runtime, pass the analysis-only health probe, and sink every batchable
  // constraint into the N-individual-scans fallback.
  try java.util.regex.Pattern.compile(pattern) catch {
    case e: java.util.regex.PatternSyntaxException =>
      throw new IllegalArgumentException(
        s"invalid regex for Pattern($column): ${e.getMessage}")
  }
  val name = s"Pattern($column, $pattern) ${assertion.describe}"
  val aggregates: Seq[Column] = Seq(
    count(col(column)),
    sum(when(col(column).rlike(pattern), 1L).otherwise(0L)))
  def fromAggregates(values: Seq[Any]): ConstraintResult = {
    val nonNull = Num.toLong(values(0)).getOrElse(0L)
    if (nonNull == 0L) return skipped("no non-null values")
    assertOn(Num.toLong(values(1)).getOrElse(0L).toDouble / nonNull.toDouble, assertion)
  }
}
