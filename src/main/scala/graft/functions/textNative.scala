package graft.functions

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass duplicate n-gram fraction kernels (static so generated code can call them
  * directly). The Column-level formulation (`transform(sequence(...))` →
  * `array_distinct`) materializes an L-element substring array per document and runs
  * interpreted per-element lambdas — ~10× the work of one byte-walk, and higher-order
  * functions neither codegen nor participate in subexpression elimination. Semantics
  * are EXACT distinct-substring counts (a hash set of byte-slice views, full equality
  * on collision — not a fingerprint approximation), matching the SQL-oracle forms.
  */
object DupNgramKernel {

  /** `1 − distinct(char n-grams)/total`; 0.0 when fewer than n chars. N-grams are in
    * CODE POINTS (like `substr`), computed over the UTF-8 bytes with one offset walk.
    */
  def charFraction(s: UTF8String, n: Int): Double = {
    val bytes = s.getBytes
    // Char-start byte offsets: offs(i) = byte position of code point i.
    val offs = new Array[Int](bytes.length + 1)
    var i = 0
    var chars = 0
    while (i < bytes.length) {
      offs(chars) = i
      chars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(chars) = bytes.length
    if (chars < n) return 0.0
    val total = chars - n + 1
    val set = new java.util.HashSet[UTF8String](initialCapacity(total))
    var k = 0
    while (k < total) {
      // Zero-copy view over the shared byte array; HashSet compares bytes on collision.
      set.add(UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k)))
      k += 1
    }
    1.0 - set.size.toDouble / total
  }

  /** `1 − distinct(word k-grams)/total` over MATCHING-tokenizer tokens
    * ([[SegmentKernel.tokenBounds]]: `\s+` words outside the no-space scripts,
    * overlapping character bigrams inside them) joined by single spaces; 0.0 when
    * fewer than k tokens.
    */
  def wordFraction(s: UTF8String, k: Int): Double = {
    val bytes = s.getBytes
    val (bounds, nt) = SegmentKernel.tokenBounds(bytes, bytes.length)
    if (nt < k) return 0.0
    // Canonical buffer: tokens joined by single spaces (k-grams must compare equal
    // regardless of the separator run that appeared in the source text). Token
    // bounds may OVERLAP (SEG bigrams) — size from the bounds, not the doc length.
    var canonLen = nt // separators upper bound
    var t = 0
    while (t < nt) { canonLen += bounds(t * 2 + 1) - bounds(t * 2); t += 1 }
    val canon = new Array[Byte](canonLen)
    val starts = new Array[Int](nt)
    val ends = new Array[Int](nt)
    var w = 0
    t = 0
    while (t < nt) {
      if (t > 0) { canon(w) = ' '; w += 1 }
      starts(t) = w
      val bs = bounds(t * 2)
      val be = bounds(t * 2 + 1)
      System.arraycopy(bytes, bs, canon, w, be - bs)
      w += be - bs
      ends(t) = w
      t += 1
    }
    val total = nt - k + 1
    val set = new java.util.HashSet[UTF8String](initialCapacity(total))
    var j = 0
    while (j < total) {
      set.add(UTF8String.fromBytes(canon, starts(j), ends(j + k - 1) - starts(j)))
      j += 1
    }
    1.0 - set.size.toDouble / total
  }

  private def initialCapacity(expected: Int): Int =
    math.min(expected.toLong * 4 / 3 + 1, 1L << 17).toInt.max(4)
}

/** One-pass quality-score kernel (static so generated code can call it directly).
  * Replaces three regexp_replace passes + an aggregate lambda per row with a single
  * code-point walk. The arithmetic replicates the Column formulation BIT-EXACTLY,
  * including its null semantics (Spark's `least` SKIPS nulls, so a null text scores
  * lengthScore=1.0, and every ratio helper's `otherwise(0.0)` turns a null input into
  * ratio 0.0 — punct then PASSES its `< 0.2` check while ws/word-length fail their
  * `between`) and `round(_, 6)`'s scala-BigDecimal HALF_UP.
  */
object QualityScoreKernel {

  def qualityScore(s: UTF8String): Double = {
    val bytes = s.getBytes
    // Code-point / ASCII-class counts in one byte walk (ASCII classes are exact on
    // bytes — those values never occur inside multibyte sequences).
    var chars = 0
    var punct = 0
    var ws = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      chars += 1
      if (b >= 0) {
        if (b == 0x20 || (b >= 0x09 && b <= 0x0D)) ws += 1
        // Java \p{Punct}: the four ASCII punctuation ranges.
        else if ((b >= 0x21 && b <= 0x2f) || (b >= 0x3a && b <= 0x40) ||
          (b >= 0x5b && b <= 0x60) || (b >= 0x7b && b <= 0x7e)) punct += 1
        i += 1
      } else i += SegmentKernel.charLen(bytes, i, bytes.length)
    }
    // Token stats ride the shared MATCHING tokenizer (SEG bigrams count length 2 —
    // CJK text gets a sane mean word length instead of one giant pseudo-word).
    val (bounds, nt) = SegmentKernel.tokenBounds(bytes, bytes.length)
    var sumTokChars = 0L
    var t = 0
    while (t < nt) {
      var j = bounds(t * 2)
      val e = bounds(t * 2 + 1)
      while (j < e) {
        sumTokChars += 1
        j += SegmentKernel.charLen(bytes, j, e)
      }
      t += 1
    }
    val len = chars.toDouble
    val lengthScore = math.min(len / 200.0, 1.0) * (if (chars > 20000) 0.5 else 1.0)
    val punctRatio = if (chars > 0) punct.toDouble / len else 0.0
    val wsRatio = if (chars > 0) ws.toDouble / len else 0.0
    val mwl = if (nt > 0) sumTokChars.toDouble / nt.toDouble else 0.0
    score(lengthScore, punctRatio, wsRatio, mwl)
  }

  /** Null text: `least` skips the null length (score 1.0); every ratio helper's
    * `otherwise(0.0)` yields 0.0 for a null input, so punctRatio=0.0 PASSES `< 0.2`
    * (punctScore 1.0) while wsRatio=0.0 and meanWordLength=0.0 fail their `between`
    * checks (0.7 / 0.6) — total 0.86, pinned by PropertySpec against the Column form.
    */
  def nullScore: Double = score(1.0, 0.0, 0.0, 0.0)

  private def score(lengthScore: Double, punctRatio: Double, wsRatio: Double,
      mwl: Double): Double = {
    val punctScore = if (punctRatio < 0.2) 1.0 else 0.5
    val wsScore = if (wsRatio >= 0.05 && wsRatio <= 0.35) 1.0 else 0.7
    val wordLenScore = if (mwl >= 2.0 && mwl <= 12.0) 1.0 else 0.6
    val raw = lengthScore * 0.4 + punctScore * 0.2 + wsScore * 0.2 + wordLenScore * 0.2
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}

/** Codegen'd composite quality score — see [[QualityScoreKernel]]. */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) QualityScoreKernel.nullScore
    else QualityScoreKernel.qualityScore(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        double ${ev.value} = ${c.isNull} ?
          graft.functions.QualityScoreKernel.nullScore() :
          graft.functions.QualityScoreKernel.qualityScore(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

/** One-pass language-ID kernel (static so generated code can call it directly).
  * Exactly replicates the Column formulation it replaces — Han-script code-point
  * ratio for "zh", marker-token fraction per language with array_max's (score, lang)
  * struct ordering (ties prefer the lexicographically LARGER tag), 0.05 floor,
  * "und" fallback — in one tokenizer walk instead of four filter/array_contains
  * lambda pipelines plus a regexp_replace per row.
  */
object LangIdKernel {
  private val markers: Array[(String, Array[Array[Byte]])] =
    TextFunctions.LangMarkers.toArray.map { case (lang, ws) =>
      (lang, ws.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray)
    }
  private val maxMarkerLen = markers.flatMap(_._2).map(_.length).max
  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")

  private def matchesMarker(bytes: Array[Byte], s: Int, e: Int, m: Array[Byte]): Boolean = {
    if (e - s != m.length) return false
    var i = 0
    while (i < m.length) {
      if (bytes(s + i) != m(i)) return false
      i += 1
    }
    true
  }

  def langId(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    // Code-point walk: total chars + Han chars (matches Spark length()/\p{IsHan}).
    var chars = 0
    var han = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      chars += 1
      if (b >= 0) i += 1
      else {
        val cl = SegmentKernel.charLen(bytes, i, bytes.length)
        val cp = SegmentKernel.codePointAt(bytes, i, bytes.length, cl)
        if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) han += 1
        i += cl
      }
    }
    if (chars > 0 && han.toDouble / chars > 0.2) return zh
    // MATCHING-tokenizer tokens (the shared SegmentKernel walk): marker hits can
    // only be ASCII words, but the denominator counts every token — segmented
    // bigrams dilute marker fractions on mixed-script pages exactly like the
    // Column formulation over tokens() does.
    val (bounds, nt) = SegmentKernel.tokenBounds(bytes, bytes.length)
    val counts = new Array[Int](markers.length)
    var t = 0
    while (t < nt) {
      val ts = bounds(t * 2)
      val te = bounds(t * 2 + 1)
      if (te - ts <= maxMarkerLen) {
        var m = 0
        while (m < markers.length) {
          val ms = markers(m)._2
          var w = 0
          var hit = false
          while (!hit && w < ms.length) {
            hit = matchesMarker(bytes, ts, te, ms(w))
            w += 1
          }
          if (hit) counts(m) += 1
          m += 1
        }
      }
      t += 1
    }
    if (nt == 0) return und
    // array_max over (score, lang) structs: max score, ties to the LARGER lang tag.
    var bestScore = -1.0
    var bestLang: String = null
    var m = 0
    while (m < markers.length) {
      val score = counts(m).toDouble / nt
      if (score > bestScore || (score == bestScore && markers(m)._1.compareTo(bestLang) > 0)) {
        bestScore = score
        bestLang = markers(m)._1
      }
      m += 1
    }
    if (bestScore > 0.05) UTF8String.fromString(bestLang) else und
  }

  def undTag: UTF8String = und
}

/** Codegen'd language ID — see [[LangIdKernel]]. NULL input ⇒ "und", matching the
  * Column form (null lengths fall through every `when` to the "und" branch).
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LangIdKernel.undTag else LangIdKernel.langId(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        UTF8String ${ev.value} = ${c.isNull} ?
          graft.functions.LangIdKernel.undTag() :
          graft.functions.LangIdKernel.langId(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Codegen'd duplicate n-gram fraction (char or word mode) — the repetition-filter
  * kernel (Gopher-style "duplicate n-gram fraction" pretraining signal) as a single
  * fused byte-walk per document. NULL input ⇒ 0.0, matching the Column form
  * `when(length >= n, …).otherwise(0.0)` and the SQL oracle's `CASE … ELSE 0.0`.
  */
case class DupNgramFraction(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression {
  require(n > 0, s"n-gram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (word) "dup_word_ngram_fraction" else "dup_ngram_fraction"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0
    else if (word) DupNgramKernel.wordFraction(v.asInstanceOf[UTF8String], n)
    else DupNgramKernel.charFraction(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val fn = if (word) "wordFraction" else "charFraction"
    ev.copy(
      code = c.code + code"""
        double ${ev.value} = ${c.isNull} ? 0.0 :
          graft.functions.DupNgramKernel.$fn(${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DupNgramFraction =
    copy(child = newChild)
}
