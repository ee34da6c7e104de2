package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A PII class: a detection regex and the token that replaces each match.
  *
  * Regexes are restricted to the Java-regex ∩ RE2 common subset (no lookaround, no
  * backreferences — only literals, classes, `\b`, `\d`, bounded quantifiers) so the
  * same pattern string is bit-identical under Spark's Java engine and RE2-based SQL
  * engines, and every pattern stays inside Spark's codegen'd `RLike`/`RegExpReplace`.
  */
final case class PiiPattern(name: String, regex: String, replacement: String) {
  require(name.nonEmpty, "PiiPattern name must be non-empty")
  // Fail at construction, not inside a 100 TB job's first task.
  java.util.regex.Pattern.compile(regex)
}

/** PII detection and redaction over a text column — the scrubbing pass every
  * large-scale training-data pipeline runs before anything else sees the text
  * (reference scope: the format library's SSN/Phone/Email detectors,
  * `term-guard/src/constraints/format.rs` — here extended from *validation of a
  * whole column* to *detection and removal inside free text*).
  *
  * 100 TB shape: everything is a row-local projection — chained codegen'd
  * `regexp_count` / `regexp_replace` over the text column, no UDFs, no shuffle. The
  * only aggregation is the per-pattern stats rollup (one partial-agg scan). Redaction
  * of a corpus is a map-only job that preserves the input partitioning.
  *
  * Precedence: [[redact]] applies patterns IN ORDER and replacement destroys the
  * matched span, so when two patterns could overlap (an email's host looking like a
  * domain, an id-like digit run inside a URL) the earlier pattern wins. The default
  * order (email → card → ssn → phone → ipv4) redacts the most-structured spans first.
  */
object Pii {

  /** `user@host.tld` — local part per RFC-ish pragmatism, TLD ≥ 2 letters. */
  val Email: PiiPattern =
    PiiPattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")

  /** 16-digit card number in 4-4-4-4 groups separated by space or hyphen. */
  val CreditCard: PiiPattern =
    PiiPattern("credit_card", "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b", "[CARD]")

  /** US SSN `AAA-GG-SSSS`. Word-bounded so digit runs inside longer numbers don't
    * trigger; disjoint from [[Phone]] (3-2-4 vs 3-3-4 grouping).
    */
  val Ssn: PiiPattern = PiiPattern("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]")

  /** US-style `NNN-NNN-NNNN` phone. */
  val Phone: PiiPattern = PiiPattern("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]")

  /** Dotted-quad IPv4. Deliberately permissive (no 0-255 octet check — that needs
    * alternations that hurt readability for marginal precision); version strings like
    * `1.2.3.4` DO match, the standard trade every regex-PII pass makes.
    */
  val IPv4: PiiPattern =
    PiiPattern("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]")

  /** Default pass, most-structured first (see precedence note above). */
  val Defaults: Seq[PiiPattern] = Seq(Email, CreditCard, Ssn, Phone, IPv4)

  /** Matches of one pattern in `c` (codegen'd `RegExpCount`; NULL text → NULL). */
  def matchCount(c: Column, p: PiiPattern): Column = regexp_count(c, lit(p.regex))

  /** True iff any of `patterns` matches (NULL text → false, like a non-match). */
  def containsPii(c: Column, patterns: Seq[PiiPattern] = Defaults): Column =
    patterns.map(p => coalesce(matchCount(c, p) > 0, lit(false))).reduce(_ || _)

  /** The text with every `patterns` match replaced, applied in order (one fused
    * projection — Catalyst nests the `regexp_replace`s into a single codegen'd pass).
    */
  def redact(c: Column, patterns: Seq[PiiPattern] = Defaults): Column =
    patterns.foldLeft(c)((acc, p) => regexp_replace(acc, p.regex, p.replacement))

  /** `df` with `textCol` redacted in place (map-only, partitioning preserved). */
  def redactDf(df: DataFrame, textCol: String,
      patterns: Seq[PiiPattern] = Defaults): DataFrame =
    df.withColumn(textCol, redact(col(textCol), patterns))

  /** Per-pattern detection stats in ONE scan: `pii_type`, `docs_matched` (rows with
    * ≥1 match), `total_matches`. A NULL text matches nothing and counts in neither.
    *
    * Shape: all per-pattern counts are aggregated in a single pass (partial agg →
    * one-row exchange), then the one wide row is unpivoted driver-side into the
    * per-pattern frame — no per-pattern scans, no data-scale shuffle.
    */
  def piiStats(df: DataFrame, textCol: String,
      patterns: Seq[PiiPattern] = Defaults): DataFrame = {
    require(patterns.nonEmpty, "piiStats needs at least one pattern")
    val aggs = patterns.flatMap { p =>
      val m = matchCount(col(textCol), p)
      Seq(
        coalesce(sum(when(m > 0, 1L).otherwise(0L)), lit(0L)).as(s"_docs_${p.name}"),
        coalesce(sum(m), lit(0L)).as(s"_tot_${p.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    patterns.zipWithIndex
      .map { case (p, i) => (p.name, row.getLong(2 * i), row.getLong(2 * i + 1)) }
      .toDF("pii_type", "docs_matched", "total_matches")
  }
}
