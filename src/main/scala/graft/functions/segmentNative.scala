package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Script-aware tokenization — the engine's single MATCHING tokenizer.
  *
  * Whitespace tokenization (`split("\\s+")`) is wrong for the scripts that do not
  * separate words with spaces: a Chinese/Japanese/Thai page is one giant "token",
  * so MinHash/contamination shingles are empty (dedup-blind), mean-word-length is
  * degenerate (Gopher gates auto-reject the page), and vocab/TF-IDF are
  * meaningless. The public-pipeline fix (CCNet, BigScience/ROOTS, Gopher's
  * char-level handling) is character n-grams for those scripts; this kernel emits
  * overlapping character BIGRAMS for contiguous runs of the no-space scripts and
  * plain whitespace words everywhere else.
  *
  * CONTRACT (the one tokenization every matching consumer shares — word shingles,
  * MinHash/SimHash, contamination grams, Gopher word stats, quality score, TF-IDF,
  * vocab, token counts):
  *
  *  1. The text splits on ASCII whitespace runs (space, \t, \n, \x0B, \f, \r) —
  *     exactly the old `\s+` Java-regex split; empties dropped.
  *  2. Within a whitespace-delimited run, code points group into UNITS: a base
  *     code point plus any trailing JOINERS (combining marks Mn/Mc/Me, ZWNJ/ZWJ
  *     U+200C/D, kana voiced-sound marks U+309B/C and halfwidth U+FF9E/F — so a
  *     bigram boundary can never split a grapheme-ish cluster: か+゛ stays one
  *     unit, as does a Thai base consonant with its vowel/tone marks).
  *  3. Each unit classifies by its BASE code point: SEG when in [[SegRanges]]
  *     (Han incl. extensions + compatibility, Hiragana/Katakana incl. halfwidth
  *     and phonetic extensions and the prolonged-sound/iteration marks, Thai,
  *     Lao, Myanmar, Khmer), OTHER otherwise. The CJK middle dots U+30FB/U+FF65
  *     are deliberately OTHER — they ARE word separators in Japanese. Hangul is
  *     deliberately OTHER: Korean is written with spaces.
  *  4. Maximal same-class unit sequences form segments. An OTHER segment emits
  *     ONE token (its whole byte range — for text with no SEG scripts this
  *     reproduces the whitespace tokenization byte-for-byte, which is what keeps
  *     every existing corpus, oracle and stored bloom bit-identical). A SEG
  *     segment of m units emits the m−1 OVERLAPPING bigrams (units j, j+1); a
  *     single-unit segment emits that unit alone.
  *
  * Token bounds may therefore OVERLAP in the source. This is the MATCHING
  * tokenizer: token streams feed hashes, counts and statistics. Operators that
  * REBUILD text from tokens (chunking windows, duplicate-span removal) keep
  * [[TextFunctions.whitespaceTokens]] — rejoining overlapping bigrams would
  * duplicate characters.
  *
  * DuckDB oracle equivalence: [[segTokensSql]]-built SQL replays rules 1/3/4
  * (rule 2's joiners are unrepresentable in one regex pass; oracle fixtures keep
  * joiners away from SEG runs — the joiner paths are spec-pinned instead).
  */
object SegmentKernel {

  /** Inclusive (lo, hi) code-point ranges of the bigram-segmented scripts, sorted,
    * flattened. The SINGLE source of truth — [[isSeg]] and the DuckDB oracle
    * fragment both derive from it.
    */
  val SegRanges: Array[Int] = Array(
    0x0E00, 0x0EFF, // Thai + Lao
    0x1000, 0x109F, // Myanmar
    0x1780, 0x17FF, // Khmer
    0x3040, 0x30FA, // Hiragana + Katakana (U+30FB middle dot excluded: a separator)
    0x30FC, 0x30FF, // prolonged sound mark + kana iteration marks
    0x31F0, 0x31FF, // Katakana Phonetic Extensions
    0x3400, 0x4DBF, // CJK Extension A
    0x4E00, 0x9FFF, // CJK Unified Ideographs
    0xF900, 0xFAFF, // CJK Compatibility Ideographs
    0xFF66, 0xFF9D, // Halfwidth Katakana (U+FF65 middle dot out; U+FF9E/F are joiners)
    0x1B000, 0x1B16F, // Kana Supplement + Extended-A
    0x20000, 0x3FFFF) // CJK Extensions B.. (whole SIP/TIP planes — over-approximate)

  def isSeg(cp: Int): Boolean = {
    if (cp < 0x0E00) return false
    var i = 0
    while (i < SegRanges.length) {
      if (cp <= SegRanges(i + 1)) return cp >= SegRanges(i)
      i += 2
    }
    false
  }

  /** Characters that attach to the PRECEDING unit and never start or split one. */
  def isJoiner(cp: Int): Boolean = {
    if (cp < 0x80) return false
    if (cp == 0x200C || cp == 0x200D) return true // ZWNJ / ZWJ
    if (cp == 0x309B || cp == 0x309C) return true // kana voiced marks (non-combining)
    if (cp == 0xFF9E || cp == 0xFF9F) return true // halfwidth kana voiced marks
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** ASCII whitespace BYTE — exact for any UTF-8 input (these byte values never
    * occur inside multibyte sequences).
    */
  def isWsByte(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Bytes consumed by the character starting at `i`: 1 for ASCII and for any
    * malformed lead (bare continuation bytes included), else the lead byte's
    * declared length TRUNCATED at the first non-continuation byte. This makes
    * every walk SELF-SYNCHRONIZING on malformed input: a truncated multibyte
    * lead can never swallow a following ASCII whitespace byte or the next
    * character's lead (Spark does not validate UTF-8, so crawl-scale corpora can
    * carry such bytes into UDF-visible UTF8Strings).
    */
  def charLen(bytes: Array[Byte], i: Int, len: Int): Int = {
    val b = bytes(i)
    if (b >= 0) return 1
    val nb = UTF8String.numBytesForFirstByte(b)
    if (nb <= 1) return 1
    var j = i + 1
    val end = math.min(i + nb, len)
    while (j < end && (bytes(j) & 0xC0) == 0x80) j += 1
    j - i
  }

  /** Code point of the character at `i` that [[charLen]] measured as `cl` bytes.
    * Malformed input (truncated/invalid sequences, bare continuations,
    * surrogate-range or out-of-range scalars) decodes to U+FFFD — what
    * String/Column-level decoding sees, so per-code-point classification
    * (letters, scripts, joiners) agrees with the Column specifications. (Overlong
    * encodings are NOT rejected — a non-shortest form decodes to its scalar;
    * none of those scalars change a classification class boundary.)
    */
  def codePointAt(bytes: Array[Byte], i: Int, len: Int, cl: Int): Int = {
    val b0 = bytes(i) & 0xFF
    if (cl <= 1) return if (b0 < 0x80) b0 else 0xFFFD
    // cl > 1 only when the lead declared a multibyte length; malformed if truncated
    if (cl != UTF8String.numBytesForFirstByte(bytes(i))) return 0xFFFD
    var cp = cl match {
      case 2 => b0 & 0x1F
      case 3 => b0 & 0x0F
      case _ => b0 & 0x07
    }
    var j = i + 1
    val end = i + cl
    while (j < end) {
      cp = (cp << 6) | (bytes(j) & 0x3F)
      j += 1
    }
    if (cp > 0x10FFFF || cp < 0 || (cp >= 0xD800 && cp <= 0xDFFF)) 0xFFFD else cp
  }

  /** Growable packed (start, end) bounds buffer. */
  private final class BoundsBuf {
    var arr: Array[Int] = new Array[Int](64)
    var n: Int = 0
    def add(s: Int, e: Int): Unit = {
      if (n * 2 == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n * 2) = s
      arr(n * 2 + 1) = e
      n += 1
    }
  }

  /** Flush an open SEG segment of `m` units (starts in `us`, segment ending at
    * `segEnd`): m−1 overlapping bigrams, or the single unit when m == 1.
    */
  private def flushSeg(buf: BoundsBuf, us: Array[Int], m: Int, segEnd: Int): Unit = {
    if (m == 0) return
    if (m == 1) { buf.add(us(0), segEnd); return }
    var j = 0
    while (j < m - 1) {
      buf.add(us(j), if (j + 2 < m) us(j + 2) else segEnd)
      j += 1
    }
  }

  /** MATCHING-tokenizer token bounds as packed (startByte, endByte) pairs plus the
    * count. Bounds may OVERLAP (SEG bigrams). On text containing no SEG-script
    * code points this is byte-identical to the old whitespace `tokenBounds`.
    */
  def tokenBounds(bytes: Array[Byte], len: Int): (Array[Int], Int) = {
    val buf = new BoundsBuf
    var unitStarts = new Array[Int](16)
    var m = 0 // open SEG segment unit count
    var otherStart = -1
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (isWsByte(b)) {
        if (m > 0) { flushSeg(buf, unitStarts, m, i); m = 0 }
        if (otherStart >= 0) { buf.add(otherStart, i); otherStart = -1 }
        i += 1
      } else {
        // one unit: base code point + trailing joiners (charLen-advance is
        // self-synchronizing — malformed leads never swallow whitespace)
        val u0 = i
        val cl = charLen(bytes, i, len)
        val cp = codePointAt(bytes, i, len, cl)
        i += cl
        var more = true
        while (more && i < len && !isWsByte(bytes(i))) {
          val cl2 = charLen(bytes, i, len)
          if (isJoiner(codePointAt(bytes, i, len, cl2))) i += cl2
          else more = false
        }
        if (isSeg(cp)) {
          if (otherStart >= 0) { buf.add(otherStart, u0); otherStart = -1 }
          if (m == unitStarts.length)
            unitStarts = java.util.Arrays.copyOf(unitStarts, unitStarts.length * 2)
          unitStarts(m) = u0
          m += 1
        } else {
          if (m > 0) { flushSeg(buf, unitStarts, m, u0); m = 0 }
          if (otherStart < 0) otherStart = u0
        }
      }
    }
    if (m > 0) flushSeg(buf, unitStarts, m, len)
    if (otherStart >= 0) buf.add(otherStart, len)
    (buf.arr, buf.n)
  }

  /** Plain ASCII-whitespace token bounds (the SPLITTING tokenizer,
    * [[TextFunctions.whitespaceTokens]]) — disjoint source spans for consumers
    * that rebuild text from tokens (chunk windows, span removal).
    */
  def wsTokenBounds(bytes: Array[Byte], len: Int): (Array[Int], Int) = {
    var bounds = new Array[Int](32)
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && isWsByte(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWsByte(bytes(i))) i += 1
        if (n * 2 == bounds.length) bounds = java.util.Arrays.copyOf(bounds, bounds.length * 2)
        bounds(n * 2) = start
        bounds(n * 2 + 1) = i
        n += 1
      }
    }
    (bounds, n)
  }

  /** [[TextFunctions.tokens]] kernel entry: the token array as zero-copy views
    * over the input's bytes.
    */
  def tokensOf(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val (bounds, n) = tokenBounds(bytes, bytes.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromBytes(bytes, bounds(i * 2), bounds(i * 2 + 1) - bounds(i * 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The DuckDB replay of rules 1/3/4 as a SQL expression over `e` (a text
    * expression): the segmented token LIST. Spaces are first inserted at
    * SEG/OTHER class boundaries (two non-overlapping regex passes), the result
    * whitespace-splits as before, and each SEG token of length > 1 expands to its
    * overlapping bigrams. Joiners (rule 2) are not representable here — oracle
    * fixtures keep them away from SEG runs; specs pin those paths.
    */
  def segTokensSql(e: String): String = {
    val seg = SegRanges.grouped(2)
      .map(r => f"\\x{${r(0)}%04X}-\\x{${r(1)}%04X}").mkString
    val ws = " \\t\\n\\x0b\\f\\r"
    s"""flatten(list_transform(
       |  list_filter(string_split_regex(
       |    regexp_replace(regexp_replace($e,
       |      '([$seg])([^$seg$ws])', '\\1 \\2', 'g'),
       |      '([^$seg$ws])([$seg])', '\\1 \\2', 'g'),
       |    '[$ws]+'), x -> x != ''),
       |  t -> CASE WHEN length(t) > 1 AND regexp_matches(t, '^[$seg]')
       |       THEN list_transform(range(1, length(t)), i -> substring(t, CAST(i AS INT), 2))
       |       ELSE [t] END))""".stripMargin.replaceAll("\n\\s*", " ")
  }
}

/** Codegen'd MATCHING tokenizer (see [[SegmentKernel]]) — array of tokens,
  * whitespace words outside the no-space scripts, overlapping character bigrams
  * inside them. NULL in ⇒ NULL out (like `split`).
  */
case class SegmentTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "seg_tokens"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else SegmentKernel.tokensOf(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SegmentKernel.tokensOf($c);")

  override protected def withNewChildInternal(newChild: Expression): SegmentTokens =
    copy(child = newChild)
}
