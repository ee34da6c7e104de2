package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches as DataFrame columns — the mergeable distinct-count family that,
  * unlike HLL, supports SET ALGEBRA: intersection and difference, not just union.
  * That is exactly what corpus comparison needs at 100 TB: "how many distinct
  * shingles do sources A and B SHARE" is an intersection — with per-source sketches
  * stored once, every pairwise overlap is a driver-side set operation on ~100 KiB
  * binaries instead of a vocabulary×vocabulary join per pair.
  *
  * Determinism: a theta sketch retains the k smallest value hashes under a fixed
  * seed — a pure function of the value SET (order- and partition-independent), so
  * estimates are stable facts across reruns and engines. Below k distinct values
  * the sketch is in exact mode and the estimate IS the distinct count.
  *
  * Sketch bytes are the standard DataSketches compact-sketch encoding — readable by
  * any DataSketches binding (the same cross-system contract the analyzer-state HLL
  * keeps).
  */
object ThetaKernel {
  /** Relative standard error at lgK: ~1/sqrt(2^lgK) — 14 ⇒ ~0.78%. */
  def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(wrap(a))
    in.intersect(wrap(b))
    in.getResult.getEstimate
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    // Max nominal entries (2^26): the default builder (lgK 12) would DOWNSAMPLE the
    // union below the inputs' own resolution — two exact-mode lgK-14 sketches with a
    // 12k-value union would come back approximate, breaking the "exact below 2^lgK"
    // contract. The union's retained entries stay bounded by the inputs' (≤ 2^lgK
    // each), so the high cap costs nothing; intersection/AnotB results are bounded
    // by their inputs and need no cap.
    val u = SetOperation.builder().setLogNominalEntries(26).buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    u.getResult.getEstimate
  }

  /** Distinct values in A not in B. */
  def differenceEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate
}

/** `theta_sketch_agg(value)` → compact-sketch bytes. NULL inputs contribute nothing
  * (SQL distinct semantics); an input with no non-NULL values yields the EMPTY
  * sketch (non-NULL bytes, estimate exactly 0) — mirroring Spark's own
  * `hll_sketch_agg`. Strings hash by UTF-8 bytes, integrals by their 64-bit value,
  * binaries by content.
  *
  * One documented divergence from `count_distinct`: EMPTY strings/binaries are
  * ignored too — DataSketches' update of an empty byte array is a no-op by the
  * library's own cross-binding convention, and re-encoding them here would break
  * the standard sketch-bytes interop this aggregate promises. A corpus where the
  * empty string is a meaningful distinct value counts one fewer (spec-pinned).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg lgK must be in [4,26], got $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires string/binary/integral input, got $other")
  }

  override def createAggregationBuffer(): Union = ThetaKernel.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case ShortType => buffer.update(v.asInstanceOf[Short].toLong)
      case ByteType => buffer.update(v.asInstanceOf[Byte].toLong)
      case other => throw new IllegalStateException(s"unreachable input type $other")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaKernel.newUnion(lgK)
    u.union(ThetaKernel.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
}

/** `theta_estimate(sketch)` → double distinct-count estimate (NULL in ⇒ NULL out). */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"theta_estimate requires binary, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(input: Any): Any =
    ThetaKernel.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaKernel.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Binary set-algebra estimates over two sketch columns. `op` ∈ intersection /
  * union / difference (A\B). NULL if either side is NULL.
  */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression {
  // ONE op→kernel resolution drives BOTH eval paths: the interpreted call and the
  // generated code invoke the same ThetaKernel method by the same name, so a new
  // op added to this table cannot drift between the two.
  private val kernelFn: (String, (Array[Byte], Array[Byte]) => Double) =
    ThetaSetEstimate.kernels.getOrElse(op,
      throw new IllegalArgumentException(s"unknown theta set op '$op'"))
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_${op}_estimate requires (binary, binary), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"theta_${op}_estimate"
  override def nullSafeEval(a: Any, b: Any): Any =
    kernelFn._2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaKernel.${kernelFn._1}($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaSetEstimate =
    copy(left = l, right = r)
}

object ThetaSetEstimate {
  /** op → (ThetaKernel method name, the method itself) — the single source of truth
    * for interpreted AND generated evaluation. */
  val kernels: Map[String, (String, (Array[Byte], Array[Byte]) => Double)] = Map(
    "intersection" -> (("intersectionEstimate", ThetaKernel.intersectionEstimate _)),
    "union" -> (("unionEstimate", ThetaKernel.unionEstimate _)),
    "difference" -> (("differenceEstimate", ThetaKernel.differenceEstimate _)))
  val ops: Set[String] = kernels.keySet
}

/** User-facing Column API for the theta family. */
object SketchFunctions {
  def thetaSketch(c: Column, lgK: Int = 14): Column =
    GraftSqlBridge.column(
      ThetaSketchAgg(GraftSqlBridge.expression(c), lgK).toAggregateExpression())

  def thetaEstimate(c: Column): Column =
    GraftSqlBridge.column(ThetaEstimate(GraftSqlBridge.expression(c)))

  def thetaIntersectionEstimate(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetEstimate(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "intersection"))

  def thetaUnionEstimate(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetEstimate(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "union"))

  def thetaDifferenceEstimate(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetEstimate(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "difference"))
}
