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

  /** `1 − distinct(word k-grams)/total` over whitespace tokens joined by single
    * spaces; 0.0 when fewer than k tokens. Tokenization matches `split(c, "\\s+")`
    * with empties removed: maximal runs of non-whitespace bytes (Java `\s` is ASCII
    * [ \t\n\x0B\f\r], so a byte-level scan is exact for any UTF-8 input).
    */
  def wordFraction(s: UTF8String, k: Int): Double = {
    val bytes = s.getBytes
    // Canonical buffer: tokens joined by single spaces (k-grams must compare equal
    // regardless of the separator run that appeared in the source text).
    val canon = new Array[Byte](bytes.length)
    val starts = new Array[Int](bytes.length / 2 + 2)
    val ends = new Array[Int](bytes.length / 2 + 2)
    var w = 0
    var nt = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        if (nt > 0) { canon(w) = ' '; w += 1 }
        starts(nt) = w
        while (i < bytes.length && !isWs(bytes(i))) { canon(w) = bytes(i); w += 1; i += 1 }
        ends(nt) = w
        nt += 1
      }
    }
    if (nt < k) return 0.0
    val total = nt - k + 1
    val set = new java.util.HashSet[UTF8String](initialCapacity(total))
    var j = 0
    while (j < total) {
      set.add(UTF8String.fromBytes(canon, starts(j), ends(j + k - 1) - starts(j)))
      j += 1
    }
    1.0 - set.size.toDouble / total
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

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
    val str = s.toString
    var chars = 0
    var punct = 0
    var ws = 0
    var nt = 0
    var sumTokChars = 0L
    var inTok = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      chars += 1
      val isWs = cp == ' ' || (cp >= '\t' && cp <= '\r')
      if (isWs) ws += 1
      // Java \p{Punct}: the four ASCII punctuation ranges.
      if ((cp >= 0x21 && cp <= 0x2f) || (cp >= 0x3a && cp <= 0x40) ||
        (cp >= 0x5b && cp <= 0x60) || (cp >= 0x7b && cp <= 0x7e)) punct += 1
      if (isWs) inTok = false
      else {
        if (!inTok) { nt += 1; inTok = true }
        sumTokChars += 1
      }
      i += Character.charCount(cp)
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
  private val markers: Array[(String, java.util.HashSet[String])] =
    TextFunctions.LangMarkers.toArray.map { case (lang, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (lang, s)
    }
  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")

  def langId(s: UTF8String): UTF8String = {
    val str = s.toString
    // Code-point walk: total chars + Han chars (matches Spark length()/\p{IsHan}).
    var chars = 0
    var han = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      chars += 1
      if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) han += 1
      i += Character.charCount(cp)
    }
    if (chars > 0 && han.toDouble / chars > 0.2) return zh
    // Whitespace tokens (same ASCII-run scan as DupNgramKernel.wordFraction).
    var nt = 0
    val counts = new Array[Int](markers.length)
    var j = 0
    while (j < str.length) {
      while (j < str.length && isWsChar(str.charAt(j))) j += 1
      if (j < str.length) {
        val start = j
        while (j < str.length && !isWsChar(str.charAt(j))) j += 1
        nt += 1
        val tok = str.substring(start, j)
        var m = 0
        while (m < markers.length) {
          if (markers(m)._2.contains(tok)) counts(m) += 1
          m += 1
        }
      }
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

  private def isWsChar(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')
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
