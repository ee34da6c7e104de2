package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of a float-vector column against a
  * fixed probe vector — the hot inner loop of brute-force ANN scoring.
  *
  * This is the "(b) custom Catalyst `Expression`" tier: unlike a Scala UDF it
  * participates in whole-stage codegen (no UDF serialization boundary, no
  * `Seq[Float]` boxing of every row's array — the generated code reads the
  * `UnsafeArrayData` floats in place), and unlike `zip_with`/`aggregate` Columns it is
  * one fused loop instead of interpreted per-element lambdas.
  *
  * Null array ⇒ null result; null elements contribute nothing; zero vectors yield NaN
  * (same as the UDF and higher-order formulations).
  */
case class CosineToProbe(child: Expression, probe: IndexedSeq[Double])
    extends UnaryExpression {
  // probe is an IndexedSeq, NOT an Array: a case-class Array field compares by
  // reference, so two semantically identical expressions would never be equal and
  // Catalyst subexpression elimination / exchange reuse could not dedupe them. The
  // hot loops read the cached primitive array below — no per-element boxing.
  private lazy val probeArr: Array[Double] = probe.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"cosine_to_probe requires array<float>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_to_probe"

  private lazy val probeNorm: Double = math.sqrt(probeArr.map(v => v * v).sum)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val p = probeArr
    val n = arr.numElements()
    if (n != p.length) throw CosineToProbe.dimMismatch(prettyName, n, p.length)
    var dot = 0.0
    var nv = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getFloat(i).toDouble
        dot += x * p(i)
        nv += x * x
      }
      i += 1
    }
    dot / (math.sqrt(nv) * probeNorm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probeRef = ctx.addReferenceObj("probe", probeArr, "double[]")
    // The norm must be emitted as a VALID Java literal: "${NaN}D" would be the token
    // `NaND` and kill whole-stage codegen for the stage (janino compile failure →
    // interpreted fallback).
    val normLit =
      if (probeNorm.isNaN) "Double.NaN"
      else if (probeNorm == Double.PositiveInfinity) "Double.POSITIVE_INFINITY"
      else s"${probeNorm}D"
    nullSafeCodeGen(ctx, ev, c => {
      val dot = ctx.freshName("dot")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      s"""
         |double $dot = 0.0;
         |double $nv = 0.0;
         |int $n = $c.numElements();
         |if ($n != $probeRef.length) {
         |  throw graft.functions.CosineToProbe.dimMismatch("cosine_to_probe", $n, $probeRef.length);
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    double $x = (double) $c.getFloat($i);
         |    $dot += $x * $probeRef[$i];
         |    $nv += $x * $x;
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nv) * $normLit);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CosineToProbe =
    copy(child = newChild)
}

object CosineToProbe {
  /** Fail-loud on a vector/probe dimension mismatch — scoring a PREFIX would
    * silently degrade every downstream score (same rule as `ivfAssign` and
    * `Dedup.bucketFor`). Called from generated code via the static forwarder, so
    * it returns the exception for a Java-side `throw`.
    */
  def dimMismatch(fn: String, vecDims: Int, probeDims: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"$fn: vector has $vecDims dims but the probe/weight vector has $probeDims — " +
        "refusing to score a prefix; re-embed or fix the model dimensions")
}

/** Native pairwise cosine similarity of two float-vector columns — the verify-stage
  * kernel of embedding near-dup (runs once per candidate pair). Same tier rationale as
  * [[CosineToProbe]]: whole-stage codegen reads both `UnsafeArrayData` inputs in place,
  * where the UDF formulation boxes each row's arrays into `Seq[Float]`.
  *
  * Any null array ⇒ null; null elements contribute nothing; zero vectors yield NaN
  * (matching the UDF it replaces).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(s"cosine_sim requires (array<float>, array<float>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
      }
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |double $dot = 0.0;
         |double $nx = 0.0;
         |double $ny = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $nx += $xi * $xi;
         |    $ny += $yi * $yi;
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Native Jaccard of two SORTED distinct long arrays (the hashed shingle sets of
  * [[graft.operators.Dedup.shingleHashSet]]) — the verify-stage kernel of MinHash
  * near-dup, run once per candidate pair. One fused merge loop over both
  * `UnsafeArrayData` inputs inside whole-stage codegen; the UDF it replaces boxed both
  * arrays into `Seq[Long]` per pair, which dominates at 10^5+ candidates.
  *
  * Inputs MUST be sorted ascending with distinct elements (what `shingleHashSet`
  * emits). Any null array ⇒ null; any null ELEMENT also ⇒ null (reading a null slot
  * from `UnsafeArrayData` would silently yield garbage, so nulls poison instead —
  * relevant for the SQL-registered form, where inputs aren't under library control);
  * two empty sets ⇒ 1.0.
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(s"jaccard_sorted requires (array<bigint>, array<bigint>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var k = 0
    while (k < nx) { if (x.isNullAt(k)) return null; k += 1 }
    k = 0
    while (k < ny) { if (y.isNullAt(k)) return null; k += 1 }
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val union = ctx.freshName("union")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |boolean $hasNull = false;
         |for (int $k = 0; $k < $nx && !$hasNull; $k++) { $hasNull = $a.isNullAt($k); }
         |for (int $k = 0; $k < $ny && !$hasNull; $k++) { $hasNull = $b.isNullAt($k); }
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0; int $j = 0; int $inter = 0;
         |  while ($i < $nx && $j < $ny) {
         |    long $xi = $a.getLong($i);
         |    long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $inter++; $i++; $j++; }
         |    else if ($xi < $yj) { $i++; } else { $j++; }
         |  }
         |  int $union = $nx + $ny - $inter;
         |  ${ev.value} = ($union == 0) ? 1.0 : ((double) $inter) / $union;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
/** `bias + Σ vec_i · weight_i` against a constant weight vector — the linear-model
  * scoring kernel (logistic / linear classifiers over a fixed fitted weight
  * vector). Same tier rationale as [[CosineToProbe]]: the `zip_with`/`aggregate`
  * Column formulation runs interpreted CodegenFallback lambdas per element on the
  * corpus-scan hot path; this is one fused loop over the unsafe float array.
  * Accumulation starts AT `bias` and adds terms in index order — bit-identical to
  * the left fold `aggregate(zip_with(v, w, _*_), bias, _+_)` it replaces.
  * Null array ⇒ null; null elements contribute nothing; a vector whose length
  * differs from `probe` throws (see [[CosineToProbe.dimMismatch]]).
  */
case class AffineToProbe(child: Expression, probe: IndexedSeq[Double], bias: Double)
    extends UnaryExpression {
  private lazy val probeArr: Array[Double] = probe.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"affine_to_probe requires array<float>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "affine_to_probe"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val p = probeArr
    val n = arr.numElements()
    if (n != p.length) throw CosineToProbe.dimMismatch(prettyName, n, p.length)
    var acc = bias
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc += arr.getFloat(i).toDouble * p(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probeRef = ctx.addReferenceObj("weights", probeArr, "double[]")
    val biasLit =
      if (bias.isNaN) "Double.NaN"
      else if (bias == Double.PositiveInfinity) "Double.POSITIVE_INFINITY"
      else if (bias == Double.NegativeInfinity) "Double.NEGATIVE_INFINITY"
      else s"${bias}D"
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $acc = $biasLit;
         |int $n = $c.numElements();
         |if ($n != $probeRef.length) {
         |  throw graft.functions.CosineToProbe.dimMismatch("affine_to_probe", $n, $probeRef.length);
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) $acc += ((double) $c.getFloat($i)) * $probeRef[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineToProbe =
    copy(child = newChild)
}

object VectorFunctions {
  def cosineToProbe(vec: Column, probe: Seq[Float]): Column =
    GraftSqlBridge.column(
      CosineToProbe(GraftSqlBridge.expression(vec), probe.map(_.toDouble).toIndexedSeq))

  def affineToProbe(vec: Column, weights: Seq[Double], bias: Double): Column =
    GraftSqlBridge.column(
      AffineToProbe(GraftSqlBridge.expression(vec), weights.toIndexedSeq, bias))

  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def jaccardSorted(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaccardSorted(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
