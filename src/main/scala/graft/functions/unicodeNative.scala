package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization kernel (static so generated code calls it directly).
  *
  * Training-data pipelines canonicalize text before hashing/dedup — NFC so that
  * `é` (U+00E9) and `e`+COMBINING ACUTE compare equal, NFKC to additionally fold
  * compatibility forms (ﬁ → fi, fullwidth → ASCII). Spark has no built-in for this;
  * the JDK's `java.text.Normalizer` implements the full UAX #15 algorithm.
  */
object UnicodeNormKernel {

  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // isNormalized is a quick-check walk (pure-ASCII and most already-normal text
    // short-circuits) — avoids allocating a copy for the overwhelmingly common case.
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** Codegen'd `normalize(text, form)`; `form` is one of NFC/NFD/NFKC/NFKD, validated
  * at construction (it is interpolated into generated Java as an enum reference).
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = s"unicode_${form.toLowerCase(java.util.Locale.ROOT)}"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.normalize(input.asInstanceOf[UTF8String],
      java.text.Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormKernel.normalize($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
