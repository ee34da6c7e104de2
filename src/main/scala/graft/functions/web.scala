package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction for web-corpus pipelines.
  *
  * Web crawls carry the same page under many spellings — scheme/host case, default
  * ports, `www.`, trailing slashes, tracking parameters, fragments — and URL-level
  * dedup / per-domain capping (the C4 and RefinedWeb pre-passes) only works after
  * canonicalization. Everything here is a pure codegen'd `Column` expression
  * (row-local, no UDFs, no shuffle): it runs inline in a 100 TB scan.
  *
  * ASCII-only lowercasing via `translate` (hostnames are ASCII post-IDNA; `lower()`
  * is avoided per the repo-wide rule — its first use pays a multi-second collation
  * init in this Spark build).
  */
object WebFunctions {

  private val Upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  /** ASCII lowercase (A-Z only) — exactly what scheme/host canonicalization needs. */
  def asciiLower(c: Column): Column = translate(c, Upper, Lower)

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Query parameters stripped during normalization: analytics/click-tracking noise
    * that changes per referral without changing the resource.
    */
  val TrackingParamRe = "^(?i)(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|ref)="

  /** Canonical form of an absolute URL:
    *  - fragment removed;
    *  - scheme and host ASCII-lowercased; leading `www.` dropped;
    *  - default port dropped (`:80` for http, `:443` for https);
    *  - trailing slashes trimmed from the path (`/a/` ≡ `/a`, root `/` ≡ none);
    *  - tracking parameters ([[TrackingParamRe]]) and empty parameters removed,
    *    the survivors sorted byte-lexicographically (param order never
    *    distinguishes resources) and re-joined; a now-empty query drops its `?`.
    *
    * Strings WITHOUT a `scheme://` prefix are returned trimmed but otherwise
    * untouched (no guessing relative references into URLs); NULL stays NULL.
    */
  def urlNormalize(u: Column): Column = urlParts(u).getField("norm")

  /** One-pass native parse → struct(norm, host, domain) — the hot path (the regex
    * chain below was the single most expensive projection in the bench; the kernel
    * is ~5× cheaper and computes all three outputs in one walk). Pulling several
    * fields from the same call costs ONE parse per row (subexpression elimination
    * dedups the shared struct inside a projection).
    */
  def urlParts(u: Column,
      suffixLabels: Seq[String] = DefaultSuffixLabels): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      UrlParts(org.apache.spark.sql.GraftSqlBridge.expression(u), suffixLabels))

  /** One-pass native HTML extraction → struct(title, text) — the step between
    * WARC [[graft.operators.Warc.responseTexts]] output (raw crawled HTML) and
    * the text-curation chain. Tags stripped (block tags → newlines), script/
    * style/comments dropped, `<title>` captured separately, entities decoded,
    * whitespace normalized; total on hostile input ([[HtmlKernel]]). Pulling
    * both fields from one call costs ONE parse per row (subexpression
    * elimination dedups the shared struct inside a projection).
    */
  def htmlParts(h: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HtmlParts(org.apache.spark.sql.GraftSqlBridge.expression(h)))

  /** Visible text of an HTML page — [[htmlParts]]`.text`. */
  def htmlToText(h: Column): Column = htmlParts(h).getField("text")

  /** `<title>` of an HTML page (NULL when absent/empty) — [[htmlParts]]`.title`. */
  def htmlTitle(h: Column): Column = htmlParts(h).getField("title")

  /** MAIN-content variant of [[htmlParts]]: blocks dominated by link text
    * (nav bars, footers, sidebars, "related links" — anchor chars ≥ 1/2 of the
    * block's visible chars, or ≥ 1/3 on short blocks) are dropped, so one-off
    * page chrome never reaches the curation chain (corpus-wide line dedup
    * catches the REPEATED kind; this catches the rest). Same struct shape.
    *
    * KNOWN DEVIATION (fail-open, spec-pinned): a QUOTED XHTML-style self-close
    * (`<a href="x"/>`) is treated as not opening an anchor, while the HTML
    * tokenizer ignores the trailing '/' on non-void start tags — real HTML
    * written that way counts its link text as prose, so such nav chrome can
    * survive the density filter (content is kept, never lost). Unquoted
    * `<a href=/>` follows the tokenizer exactly ('/' is a value char).
    */
  def htmlMainParts(h: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HtmlMainParts(org.apache.spark.sql.GraftSqlBridge.expression(h)))

  /** Main-content prose of an HTML page — [[htmlMainParts]]`.text`. */
  def htmlMainText(h: Column): Column = htmlMainParts(h).getField("text")

  /** The original Column-pipeline normalization — retained as the executable
    * SPECIFICATION of [[urlParts]] (spec-pinned equivalent on newline-free input;
    * Java regex `$` matches before a trailing newline where the kernel treats `#`
    * cuts literally, so embedded-newline URLs — not URLs at all — may differ).
    */
  def urlNormalizeColumns(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*$", "")
    val scheme = asciiLower(regexp_extract(noFrag, SchemeRe, 1))
    val hostRaw = asciiLower(regexp_extract(noFrag, SchemeRe + "([^/?#]*)", 2))
    val host0 = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(noFrag, SchemeRe + "[^/?#]*(.*)$", 2)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamRe)))
    val queryPart = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    when(t.rlike(SchemeRe), concat(scheme, lit("://"), host, path, queryPart))
      .otherwise(t)
  }

  /** Host (with port stripped) of an absolute URL, lowercased, `www.` removed —
    * empty string when `u` has no `scheme://`. */
  def hostOf(u: Column): Column = urlParts(u).getField("host")

  /** Column-pipeline host extraction — the executable specification of
    * [[urlParts]]'s `host` field. */
  def hostOfColumns(u: Column): Column = {
    val raw = asciiLower(regexp_extract(trim(u), SchemeRe + "([^/?#]*)", 2))
    regexp_replace(regexp_replace(raw, ":\\d+$", ""), "^www\\.", "")
  }

  /** Second-level labels that act as country-level suffixes (`example.co.uk` →
    * `example.co.uk`, not `co.uk`). A pragmatic subset of the public-suffix list —
    * the full list is data, swap it in by passing `extraSuffixLabels`.
    */
  val DefaultSuffixLabels: Seq[String] = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Registered domain of a host: the last two labels, or the last THREE when the
    * second-to-last is a public-suffix label with at least three labels present
    * (`a.b.example.co.uk` → `example.co.uk`). Hosts with fewer than two labels
    * (e.g. `localhost`, an IP would also pass through) return as-is.
    */
  def registeredDomainOfHost(host: Column,
      suffixLabels: Seq[String] = DefaultSuffixLabels): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val secondLevel = element_at(labels, -2)
    val take3 = n >= 3 && secondLevel.isInCollection(suffixLabels)
    when(n >= 2,
      when(take3, array_join(slice(labels, -3, 3), "."))
        .otherwise(array_join(slice(labels, -2, 2), ".")))
      .otherwise(host)
  }

  /** Registered domain straight from a URL — the per-domain capping key. */
  def domainOf(u: Column, suffixLabels: Seq[String] = DefaultSuffixLabels): Column =
    urlParts(u, suffixLabels).getField("domain")

  /** Column-pipeline registered domain — the executable specification of
    * [[urlParts]]'s `domain` field. */
  def domainOfColumns(u: Column, suffixLabels: Seq[String] = DefaultSuffixLabels): Column =
    registeredDomainOfHost(hostOfColumns(u), suffixLabels)
}
