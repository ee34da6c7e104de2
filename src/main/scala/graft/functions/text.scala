package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here is a pure `Column` expression (codegen'd, no UDFs, no shuffles):
  * language ID, quality scoring, token counting, shingling, fingerprinting. Designed to
  * run inside one projection over a 100 TB corpus.
  *
  * NOTE: deliberately avoids lower()/upper() (multi-second first-use collation init in
  * Spark 4) — case-insensitivity is done with (?i) Java regex.
  */
object TextFunctions {

  /** The engine's MATCHING tokenizer ([[SegmentTokens]]): whitespace words outside
    * the no-space scripts, overlapping character bigrams for contiguous
    * Han/Kana/Thai/Lao/Myanmar/Khmer runs — see [[SegmentKernel]] for the exact
    * contract. On text with no such scripts this is bit-identical to
    * [[whitespaceTokens]] (the old `split("\\s+")` form). Every shingle/stat
    * consumer (MinHash, contamination, Gopher, TF-IDF, vocab, token counts) rides
    * this; text-REBUILDING consumers (chunk windows, span removal) must use
    * [[whitespaceTokens]] — rejoining overlapping bigrams duplicates characters.
    */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SegmentTokens(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Plain ASCII-whitespace tokens (empty tokens removed) — the SPLITTING
    * tokenizer: token bounds are disjoint source spans, so text rebuilt by joining
    * consecutive tokens with single spaces only canonicalizes whitespace. Use for
    * chunking/span-cutting; use [[tokens]] for matching and statistics.
    */
  def whitespaceTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: letter runs, digit runs, punctuation runs, contractions —
    * a GPT-2-style pre-tokenizer regex as a cheap proxy for real BPE token counts.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c,
      lit("'(?:s|t|re|ve|m|ll|d)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"), lit(0)))

  def charCount(c: Column): Column = length(c)

  /** Ratio helpers; all exact integer-count divisions. */
  private def ratioOf(part: Column, whole: Column): Column =
    when(whole > 0, part.cast("double") / whole.cast("double")).otherwise(lit(0.0))

  def punctRatio(c: Column): Column =
    ratioOf(length(regexp_replace(c, "[^\\p{Punct}]", "")), length(c))
  def digitRatio(c: Column): Column =
    ratioOf(length(regexp_replace(c, "[^0-9]", "")), length(c))
  def upperRatio(c: Column): Column =
    ratioOf(length(regexp_replace(c, "[^A-Z]", "")), length(c))
  def whitespaceRatio(c: Column): Column =
    ratioOf(length(c) - length(regexp_replace(c, "\\s", "")), length(c))

  def meanWordLength(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Linear text-classifier score (fastText-style shallow quality/domain classifier
    * with an explicit vocabulary): `sigmoid(bias + Σ_token weight(token))`. Row-local
    * fold of the token array against a literal map — codegen'd, zero shuffles, zero
    * UDFs: the way to run a bounded-vocabulary classifier over a 100 TB corpus inside
    * the scan projection. For learned vocabularies too large to inline in the plan,
    * explode tokens and broadcast-join a weights table instead. NULL text ⇒ NULL
    * score (no content, no verdict); a doc with no vocabulary hits scores
    * `sigmoid(bias)` — the classifier's prior, not NULL.
    */
  def linearScore(c: Column, weights: Map[String, Double], bias: Double): Column = {
    require(weights.nonEmpty, "classifier weights must be non-empty")
    // Deterministic literal order (sorted keys): the map literal is part of the plan
    // and of plan canonicalization/caching — unordered Map iteration would make two
    // identical calls build different (cache-missing) plans.
    val m = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val z = aggregate(tokens(c), lit(bias),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0.0)))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Deflate compression ratio ([[DeflateRatio]]): `compressed/raw` bytes as raw
    * deflate at level 6 — LOWER = more repetitive. The CCNet/RedPajama-style quality signal
    * for template spam (compresses hard) and noise (doesn't compress). NULL ⇒
    * NULL; empty text ⇒ 1.0. No SQL oracle exists for deflate — spec-gated.
    */
  def deflateRatio(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DeflateRatio(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Feature-hashed bag-of-words document embedding ([[HashedEmbedding]]): a
    * deterministic, model-free unit vector per document whose cosine approximates
    * token-multiset overlap — the bridge from text into the embedding operators
    * (ANN, SemDeDup, int8 quantization) when no learned encoder is available.
    * Tokenless text yields the zero vector (excluded by every downstream
    * zero-norm guard); NULL stays NULL.
    */
  def hashedEmbedding(c: Column, dim: Int = 128): Column = HashedEmbedding(c, dim)

  /** Fraction of tokens found in the given (small) word set — e.g. stopwords. */
  def wordSetRatio(c: Column, words: Seq[String]): Column = {
    val t = tokens(c)
    val set = array(words.map(lit): _*)
    when(size(t) > 0,
      size(filter(t, x => array_contains(set, x))).cast("double") / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "be", "this", "are", "from", "but")

  /** Composite quality score in [0,1]: rewards mid-length docs, clean punctuation
    * density, whitespace sanity, and (for Latin-script text) stopword presence.
    * Heuristic shape follows common pretraining-corpus filters (C4/Gopher-style rules).
    */
  def qualityScore(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      QualityScoreExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  // ---- language identification (n-gram/marker heuristic) ----

  /** Marker words per language; scoring = fraction of tokens that are markers.
    * CJK detected by codepoint class ratio instead.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "eine"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "en", "por", "para", "una"))

  /** Best-scoring language tag, "zh" for CJK-dominant text, "und" when nothing scores.
    * Native one-pass kernel ([[LangIdExpr]]): one tokenizer walk + Han code-point count
    * instead of a regexp_replace plus four filter/array_contains lambda pipelines.
    */
  def langId(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LangIdExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  // ---- fingerprinting / shingling ----

  /** Normalized 64-bit content fingerprint (whitespace-collapsed). NULL in ⇒ NULL out:
    * xxhash64 SKIPS null inputs and would return the bare seed, silently giving every
    * null-text doc one shared "real" fingerprint (and diverging from SQL engines,
    * where hashing NULL yields NULL and count(DISTINCT) excludes it).
    */
  def fingerprint(c: Column): Column =
    when(c.isNotNull, xxhash64(regexp_replace(trim(c), "\\s+", " ")))

  /** Character n-gram shingles (distinct). NULL text yields NULL, not a pseudo-shingle
    * set: the `otherwise(array(c))` short-text fallback would hand every null-text doc
    * the shared set [null] — whose hashes are all xxhash64's bare seed (xxhash64 SKIPS
    * null inputs, see [[fingerprint]]) — and null docs would jaccard-match each other
    * at 1.0.
    */
  def charShingles(c: Column, n: Int): Column = {
    require(n > 0, s"shingle size must be positive, got $n")
    when(c.isNotNull,
      when(length(c) >= n,
        array_distinct(transform(
          sequence(lit(0), length(c) - lit(n)),
          i => c.substr(i + lit(1), lit(n)))))
        .otherwise(array(c)))
  }

  /** Word k-gram shingles (distinct), joined with single spaces. NULL text yields NULL
    * (same hazard as [[charShingles]]: the fallback would be the shared set [""]).
    */
  def wordShingles(c: Column, k: Int): Column = {
    require(k > 0, s"shingle size must be positive, got $k")
    val t = tokens(c)
    when(c.isNotNull,
      when(size(t) >= k,
        array_distinct(transform(
          sequence(lit(0), size(t) - lit(k)),
          i => concat_ws(" ", slice(t, i + 1, lit(k))))))
        .otherwise(array(concat_ws(" ", t))))
  }

  /** `xxhash64` of each distinct word k-gram — the NATIVE drop-in for
    * `xxhash64(explode(wordShingles(c, k)))` (same distinct-first-occurrence order,
    * same shorter-than-k whole-doc fallback, bit-identical hashes — spec-pinned).
    * [[wordShingles]] stays as the executable specification and for callers that
    * need the gram TEXT; every hash-only pipeline should use this: the Column
    * composition interprets `transform`/`slice`/`concat_ws` per gram, this is one
    * codegen'd byte-walk per document.
    */
  def wordShingleHashes(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(WordGramHashes(
      org.apache.spark.sql.GraftSqlBridge.expression(c), k, distinct = true))

  /** `xxhash64` of the word k-gram at EVERY position 0..n−k (non-distinct, ordered;
    * empty below n = k) — the native drop-in for the duplicate-span family's
    * `transform(sequence(0, n−k), i -> xxhash64(concat_ws(" ", slice(t, i+1, k))))`.
    * `segmented = false` selects [[whitespaceTokens]] — the span family cuts and
    * rejoins the tokens its positions index, so they must be disjoint source spans.
    */
  def wordGramHashesAt(c: Column, k: Int, segmented: Boolean = true): Column =
    org.apache.spark.sql.GraftSqlBridge.column(WordGramHashes(
      org.apache.spark.sql.GraftSqlBridge.expression(c), k, distinct = false,
      segment = segmented))

  /** Rolling 64-bit hashes of the character n-grams — the document-fingerprint set. */
  def shingleHashes(c: Column, n: Int): Column =
    transform(charShingles(c, n), s => xxhash64(s))

  // ---- intra-document repetition (Gopher-style quality signals) ----

  /** Fraction of the text's char n-grams that repeat an earlier one: 1 − distinct/total.
    * 0 for texts shorter than n. High values flag boilerplate/looping generations
    * (the "duplicate n-gram fraction" family of pretraining filters). Native
    * codegen'd kernel ([[DupNgramFraction]]) — one byte-walk per document instead of
    * materializing the L-element shingle array.
    */
  def dupNgramFraction(c: Column, n: Int): Column = {
    require(n > 0, s"n-gram size must be positive, got $n")
    org.apache.spark.sql.GraftSqlBridge.column(
      DupNgramFraction(org.apache.spark.sql.GraftSqlBridge.expression(c), n, word = false))
  }

  /** Word-level duplicate k-gram fraction: 1 − distinct/total over whitespace-token
    * k-grams. 0 for texts with fewer than k tokens. Same native kernel, word mode.
    */
  def dupWordNgramFraction(c: Column, k: Int): Column = {
    require(k > 0, s"k-gram size must be positive, got $k")
    org.apache.spark.sql.GraftSqlBridge.column(
      DupNgramFraction(org.apache.spark.sql.GraftSqlBridge.expression(c), k, word = true))
  }

  /** Unicode NFC canonicalization (é ≡ e+COMBINING ACUTE) — run before any
    * hash/fingerprint/dedup step so canonically-equal text collides. Native codegen'd
    * [[UnicodeNormalize]]; already-normalized text (all ASCII included) returns the
    * input buffer without copying.
    */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      UnicodeNormalize(org.apache.spark.sql.GraftSqlBridge.expression(c), "NFC"))

  /** Unicode NFKC compatibility fold (ﬁ → fi, fullwidth → ASCII, superscripts →
    * digits) — the aggressive canonicalization most tokenizer pipelines apply.
    */
  def nfkcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      UnicodeNormalize(org.apache.spark.sql.GraftSqlBridge.expression(c), "NFKC"))

  /** Duplicate-line fraction: 1 − distinct/total over trimmed non-empty lines. */
  def dupLineFraction(c: Column): Column = {
    val ls = filter(transform(split(c, "\n"), l => trim(l)), l => length(l) > 0)
    when(size(ls) > 0,
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls).cast("double"))
      .otherwise(lit(0.0))
  }

  // ---- Gopher-style document quality rules ----

  /** Thresholds for [[gopherFlags]] — defaults follow the published Gopher corpus
    * filter (Rae et al. 2021, appendix A): word count in [50, 100k], mean word length
    * in [3, 10], symbol-to-word ratio ("#"/ellipsis) ≤ 0.1, ≤ 90% bullet-started and
    * ≤ 30% ellipsis-ended lines, ≥ 80% of words containing a letter, ≥ 2 stopword
    * hits. All tunable per-corpus.
    */
  final case class GopherConfig(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFraction: Double = 0.9,
      maxEllipsisLineFraction: Double = 0.3,
      minAlphaWordFraction: Double = 0.8,
      minStopwordHits: Int = 2) {
    require(minWords >= 1 && maxWords >= minWords, s"bad word bounds [$minWords,$maxWords]")
  }

  object GopherConfig {
    /** Preset for the bigram-segmented scripts (zh/ja/th/…): the English priors are
      * wrong there — segmented tokens are (mostly) length-2 character bigrams, so the
      * [3,10] mean-word-length band auto-rejects every page, and the English stopword
      * probe never hits. Word-count and line-shape rules keep their defaults (a
      * segmented unit ≈ a word for the length budget; bullets/ellipses are
      * script-independent). Public precedent: CCNet/Gopher route quality thresholds
      * per language rather than applying English constants corpus-wide.
      */
    val cjk: GopherConfig = GopherConfig(
      minMeanWordLen = 1.0, maxMeanWordLen = 4.0, minStopwordHits = 0)
  }

  /** Per-language Gopher threshold routing: evaluate [[langId]] once and apply the
    * matching config, falling back to `default` for unrouted languages. One
    * lazily-evaluated CaseWhen — only the selected config's kernel runs per row.
    * Output struct adds a `lang` field ahead of the flag fields so downstream
    * corpus stats can group the gate decisions by routed language.
    */
  def gopherFlagsRouted(c: Column,
      configs: Map[String, GopherConfig] = Map("zh" -> GopherConfig.cjk),
      default: GopherConfig = GopherConfig()): Column = {
    require(configs.nonEmpty, "routing map must be non-empty (else call gopherFlags)")
    val lang = langId(c)
    val flags = configs.toSeq.sortBy(_._1).foldRight(gopherFlags(c, default)) {
      case ((l, cfg), acc) => when(lang === l, gopherFlags(c, cfg)).otherwise(acc)
    }
    when(c.isNotNull, struct(lang.as("lang"), flags.as("flags")))
  }

  /** Per-language quality-score gate: `qualityScore(c) >= threshold(langId(c))`,
    * with `default` for unrouted languages. NULL text ⇒ NULL (no verdict).
    */
  def qualityKeepRouted(c: Column, thresholds: Map[String, Double],
      default: Double): Column = {
    val thr =
      if (thresholds.isEmpty) lit(default)
      else coalesce(element_at(
        map(thresholds.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*), langId(c)), lit(default))
    when(c.isNotNull, qualityScore(c) >= thr)
  }

  /** The Gopher stopword probe set (Rae et al. 2021): a doc with fewer than 2 hits is
    * unlikely to be running English prose. Case-insensitive whole-token match.
    */
  private val GopherStopwordRe = "(?i)^(the|be|to|of|and|that|have|with)$"

  /** Per-document Gopher quality flags as one struct column — each field TRUE when the
    * document PASSES that rule, plus `keep` = all rules pass. NULL text ⇒ NULL struct
    * (a doc with no content has no quality verdict; counting it either way would skew
    * corpus stats). One codegen'd projection, no UDFs, no shuffle — runs inline in a
    * 100 TB scan. Reference behavior: repetition-family rules live in
    * [[dupNgramFraction]]/[[dupLineFraction]]; this struct is the structural-rule half.
    */
  def gopherFlags(c: Column, cfg: GopherConfig = GopherConfig()): Column =
    org.apache.spark.sql.GraftSqlBridge.column(GopherFlagsExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(c), cfg))

  /** The executable SPECIFICATION of [[gopherFlags]] — the original Column
    * formulation, kept verbatim: PropertySpec pins the native kernel against it
    * bit-for-bit on hostile inputs (multi-terminator lines, non-BMP tokens, every
    * ASCII whitespace class). Production callers use [[gopherFlags]]: the five
    * `filter`/`transform` higher-order lambdas here are CodegenFallback-interpreted
    * per token/line, measured ~4x slower than the kernel's single pass.
    */
  def gopherFlagsSpec(c: Column, cfg: GopherConfig = GopherConfig()): Column = {
    val t = tokens(c)
    val nW = size(t)
    // Non-overlapping "#" / "..." / "…" matches — both engines scan leftmost-first, so
    // "....." counts one 3-dot symbol (the trailing ".." is not an ellipsis).
    val nSymbols = size(regexp_extract_all(c, lit("#|\\.{3}|…"), lit(0)))
    val lines = filter(transform(split(c, "\n"), l => trim(l)), l => length(l) > 0)
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => l.rlike("^[•‣▪*-]")))
    val nEllipsisEnd = size(filter(lines, l => l.rlike("(\\.{3}|…)$")))
    val nAlphaWords = size(filter(t, x => x.rlike("\\p{L}")))
    val nStopwordHits = size(filter(t, x => x.rlike(GopherStopwordRe)))
    val wordCountOk = nW >= cfg.minWords && nW <= cfg.maxWords
    val meanLenOk = {
      val m = meanWordLength(c)
      nW > 0 && m >= cfg.minMeanWordLen && m <= cfg.maxMeanWordLen
    }
    // Ratio rules divide by word/line count; a doc with zero words fails the word
    // rules outright (no denominator to pass "by vacuity"), while a doc with zero
    // non-empty LINES passes the line rules (there is nothing bullet-ish about it).
    val symbolOk = nW > 0 && nSymbols.cast("double") <= lit(cfg.maxSymbolWordRatio) * nW.cast("double")
    val bulletOk = nLines === 0 ||
      nBullet.cast("double") <= lit(cfg.maxBulletLineFraction) * nLines.cast("double")
    val ellipsisOk = nLines === 0 ||
      nEllipsisEnd.cast("double") <= lit(cfg.maxEllipsisLineFraction) * nLines.cast("double")
    val alphaOk = nW > 0 &&
      nAlphaWords.cast("double") >= lit(cfg.minAlphaWordFraction) * nW.cast("double")
    val stopwordOk = nStopwordHits >= cfg.minStopwordHits
    when(c.isNotNull, struct(
      wordCountOk.as("word_count_ok"),
      meanLenOk.as("mean_word_len_ok"),
      symbolOk.as("symbol_ratio_ok"),
      bulletOk.as("bullet_lines_ok"),
      ellipsisOk.as("ellipsis_lines_ok"),
      alphaOk.as("alpha_words_ok"),
      stopwordOk.as("stopword_ok"),
      (wordCountOk && meanLenOk && symbolOk && bulletOk && ellipsisOk &&
        alphaOk && stopwordOk).as("keep")))
  }
}
