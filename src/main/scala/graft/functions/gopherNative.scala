package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Gopher quality-rule kernel — one pass over the document, replacing the
  * Column composition in [[TextFunctions.gopherFlags]]'s doc (tokens + five
  * `filter`/`transform` higher-order lambdas + per-token/per-line `rlike`, all
  * CodegenFallback-interpreted: the hottest remaining HOF pipeline after the
  * word-gram kernel landed).
  *
  * BIT-FOR-BIT with the Column formulation (PropertySpec pins it on hostile inputs);
  * the subtle semantics replicated here, each matching the exact Spark/Java-regex
  * behavior of the original:
  *  - tokens: the shared MATCHING tokenizer ([[SegmentKernel.tokenBounds]] — ASCII
  *    `\s+` words outside the no-space scripts, character bigrams inside them)
  *  - token char counts are CODE POINTS ([[UTF8String]].numChars), not UTF-16 units
  *  - `\p{L}` per token == any code point in a Unicode letter category
  *  - stopword probe `(?i)^(the|be|to|of|and|that|have|with)$` == ASCII-case-folded
  *    whole-token equality (Java (?i) without UNICODE_CASE folds ASCII only)
  *  - symbol count: NON-OVERLAPPING leftmost-first `#|\.{3}|…` scan ("....." = one)
  *  - lines: literal '\n' split keeping trailing empties, Spark `trim` (strips
  *    0x20 ONLY — not \r), non-empty lines counted
  *  - bullet rule `^[•‣▪*-]`: first char of the trimmed line
  *  - ellipsis rule `(\.{3}|…)$`: Java non-MULTILINE `$` also matches before ONE
  *    final line terminator (\r, U+0085, U+2028, U+2029 — a split line cannot hold
  *    \n), so "abc...\r" MATCHES; exactly one trailing terminator is ignored
  */
object GopherKernel {
  private val Stopwords: Array[Array[Byte]] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Whole-token stopword probe replicating `(?i)^(the|...)$` under Java's
    * non-MULTILINE `$`: the anchor also matches before ONE final line terminator,
    * and the terminators that survive ASCII `\s+` tokenization are U+0085, U+2028,
    * U+2029 — so "the<U+2028>" IS a stopword hit. Back off exactly one such char.
    */
  private def isStopword(b: Array[Byte], from: Int, until0: Int): Boolean = {
    // Back off exactly one trailing U+0085 (C2 85) / U+2028 (E2 80 A8) /
    // U+2029 (E2 80 A9) \u2014 the `$` anchor's one-terminator allowance, on bytes.
    var until = until0
    if (until - from >= 2 && b(until - 2) == 0xC2.toByte && b(until - 1) == 0x85.toByte)
      until -= 2
    else if (until - from >= 3 && b(until - 3) == 0xE2.toByte &&
      b(until - 2) == 0x80.toByte &&
      (b(until - 1) == 0xA8.toByte || b(until - 1) == 0xA9.toByte))
      until -= 3
    val len = until - from
    var w = 0
    while (w < Stopwords.length) {
      val sw = Stopwords(w)
      if (sw.length == len) {
        var i = 0
        var ok = true
        while (ok && i < len) {
          var c = b(from + i)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          ok = c == sw(i)
          i += 1
        }
        if (ok) return true
      }
      w += 1
    }
    false
  }

  /** The eight flags, positionally matching gopherFlags' struct fields. */
  def flags(u: UTF8String,
      minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolWordRatio: Double, maxBulletLineFraction: Double,
      maxEllipsisLineFraction: Double, minAlphaWordFraction: Double,
      minStopwordHits: Int): InternalRow = {
    // Single materialization: every pass below is a byte walk (ASCII structure
    // bytes never occur inside multibyte sequences; the multibyte literals —
    // ellipsis, bullets, line terminators — are matched by their exact UTF-8
    // sequences, which self-synchronize).
    val bytes = u.getBytes
    val n = bytes.length

    // ---- token pass (shared MATCHING tokenizer): count, summed code-point
    // lengths, alpha words, stopwords. SEG bigrams count length 2 and are alpha
    // (Han/Kana/Thai are letters); stopwords stay ASCII-only probes. ----
    val (bounds, nTok) = SegmentKernel.tokenBounds(bytes, bytes.length)
    var nW = 0L
    var charSum = 0L
    var nAlpha = 0L
    var nStop = 0L
    var ti = 0
    while (ti < nTok) {
      val ts = bounds(ti * 2)
      val te = bounds(ti * 2 + 1)
      nW += 1
      var alpha = false
      var j = ts
      while (j < te) {
        val cl = SegmentKernel.charLen(bytes, j, te)
        if (!alpha &&
          Character.isLetter(SegmentKernel.codePointAt(bytes, j, te, cl))) alpha = true
        charSum += 1
        j += cl
      }
      if (alpha) nAlpha += 1
      if (isStopword(bytes, ts, te)) nStop += 1
      ti += 1
    }

    // ---- symbol pass: non-overlapping leftmost-first `#|\.{3}|\u2026`
    // (ellipsis = E2 80 A6; an E2 lead byte always consumes exactly its two
    // continuation bytes, so the three-byte match can never span characters) ----
    var nSym = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == '#') { nSym += 1; i += 1 }
      else if (b == '.' && i + 2 < n && bytes(i + 1) == '.' && bytes(i + 2) == '.') {
        nSym += 1; i += 3
      }
      else if (b == 0xE2.toByte && i + 2 < n && bytes(i + 1) == 0x80.toByte &&
        bytes(i + 2) == 0xA6.toByte) { nSym += 1; i += 3 }
      else i += 1
    }

    // ---- line pass: '\n' split, space-only trim, bullet / ellipsis-end rules ----
    var nLines = 0L
    var nBullet = 0L
    var nEllipsis = 0L
    var lineStart = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || bytes(pos) == '\n') {
        var a = lineStart
        var b = pos
        while (a < b && bytes(a) == ' ') a += 1
        while (b > a && bytes(b - 1) == ' ') b -= 1
        if (b > a) {
          nLines += 1
          // bullet rule: U+2022 E2 80 A2, U+2023 E2 80 A3, U+25AA E2 96 AA, '*', '-'
          val f = bytes(a)
          val bullet = f == '*' || f == '-' ||
            (b - a >= 3 && f == 0xE2.toByte &&
              ((bytes(a + 1) == 0x80.toByte &&
                (bytes(a + 2) == 0xA2.toByte || bytes(a + 2) == 0xA3.toByte)) ||
                (bytes(a + 1) == 0x96.toByte && bytes(a + 2) == 0xAA.toByte)))
          if (bullet) nBullet += 1
          // `$` ignores ONE final line terminator: \r / NEL (C2 85) /
          // LS (E2 80 A8) / PS (E2 80 A9); no \n survives the split
          var e = b
          if (bytes(e - 1) == '\r') e -= 1
          else if (e - a >= 2 && bytes(e - 2) == 0xC2.toByte && bytes(e - 1) == 0x85.toByte)
            e -= 2
          else if (e - a >= 3 && bytes(e - 3) == 0xE2.toByte && bytes(e - 2) == 0x80.toByte &&
            (bytes(e - 1) == 0xA8.toByte || bytes(e - 1) == 0xA9.toByte)) e -= 3
          val ell =
            (e - a >= 3 && bytes(e - 1) == '.' && bytes(e - 2) == '.' &&
              bytes(e - 3) == '.') ||
              (e - a >= 3 && bytes(e - 3) == 0xE2.toByte && bytes(e - 2) == 0x80.toByte &&
                bytes(e - 1) == 0xA6.toByte)
          if (ell) nEllipsis += 1
        }
        lineStart = pos + 1
      }
      pos += 1
    }

    val wordCountOk = nW >= minWords && nW <= maxWords
    val mean = if (nW > 0) charSum.toDouble / nW.toDouble else 0.0
    val meanLenOk = nW > 0 && mean >= minMeanWordLen && mean <= maxMeanWordLen
    val symbolOk = nW > 0 && nSym.toDouble <= maxSymbolWordRatio * nW.toDouble
    val bulletOk = nLines == 0L ||
      nBullet.toDouble <= maxBulletLineFraction * nLines.toDouble
    val ellipsisOk = nLines == 0L ||
      nEllipsis.toDouble <= maxEllipsisLineFraction * nLines.toDouble
    val alphaOk = nW > 0 && nAlpha.toDouble >= minAlphaWordFraction * nW.toDouble
    val stopwordOk = nStop >= minStopwordHits
    new GenericInternalRow(Array[Any](
      wordCountOk, meanLenOk, symbolOk, bulletOk, ellipsisOk, alphaOk, stopwordOk,
      wordCountOk && meanLenOk && symbolOk && bulletOk && ellipsisOk &&
        alphaOk && stopwordOk))
  }

  val StructFields: StructType = StructType(Seq(
    StructField("word_count_ok", BooleanType, nullable = false),
    StructField("mean_word_len_ok", BooleanType, nullable = false),
    StructField("symbol_ratio_ok", BooleanType, nullable = false),
    StructField("bullet_lines_ok", BooleanType, nullable = false),
    StructField("ellipsis_lines_ok", BooleanType, nullable = false),
    StructField("alpha_words_ok", BooleanType, nullable = false),
    StructField("stopword_ok", BooleanType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))
}

/** Codegen'd Gopher-flags struct. NULL text ⇒ NULL struct (the `when(isNotNull)`
  * wrapper of the Column formulation).
  */
case class GopherFlagsExpr(child: Expression, cfg: TextFunctions.GopherConfig)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = GopherKernel.StructFields
  override def prettyName: String = "gopher_flags"

  private def call(u: UTF8String): InternalRow =
    GopherKernel.flags(u, cfg.minWords, cfg.maxWords, cfg.minMeanWordLen,
      cfg.maxMeanWordLen, cfg.maxSymbolWordRatio, cfg.maxBulletLineFraction,
      cfg.maxEllipsisLineFraction, cfg.minAlphaWordFraction, cfg.minStopwordHits)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else call(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherExpr", this, classOf[GopherFlagsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernelCall($c);")
  }

  /** Codegen entry (referenced object call keeps the cfg without spelling every
    * parameter into generated source).
    */
  def kernelCall(u: UTF8String): InternalRow = call(u)

  override protected def withNewChildInternal(newChild: Expression): GopherFlagsExpr =
    copy(child = newChild)
}
