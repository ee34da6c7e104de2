package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-facing registration of graft's native Catalyst expressions, so `spark.sql(...)`
  * users get the same codegen'd kernels as the `Column` API.
  *
  * Two entry points, same function set:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) — the library-integration path,
  *    applied at session construction.
  *  - [[GraftFunctions.register]] — imperative registration on an existing session.
  *
  * Functions:
  *  - `graft_cosine(array<float>, array<float>)` → double — pairwise cosine.
  *  - `graft_cosine_to_probe(array<float>, array(<double literals>))` → double — cosine
  *    against a constant probe vector; the probe argument must be foldable (it is baked
  *    into the generated code as a `double[]` reference).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "math_funcs", "4.0.0", "", "scala_udf")

  private def buildCosine(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => CosineSim(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_cosine expects 2 arguments, got ${other.length}")
  }

  private def buildCosineToProbe(args: Seq[Expression]): Expression = args match {
    case Seq(vec, probeExpr) if probeExpr.foldable =>
      val probe = probeExpr.eval() match {
        case arr: ArrayData if probeExpr.dataType.isInstanceOf[ArrayType] =>
          val et = probeExpr.dataType.asInstanceOf[ArrayType].elementType
          val cast = org.apache.spark.sql.catalyst.expressions.Cast(
            Literal.create(arr, probeExpr.dataType), ArrayType(DoubleType))
          cast.eval().asInstanceOf[ArrayData].toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"graft_cosine_to_probe probe must be an array literal, got $other")
      }
      CosineToProbe(vec, probe)
    case Seq(_, probeExpr) => throw new IllegalArgumentException(
      "graft_cosine_to_probe probe argument must be foldable (a constant array)")
    case other => throw new IllegalArgumentException(
      s"graft_cosine_to_probe expects 2 arguments, got ${other.length}")
  }

  /** (identifier, info, builder) triples in the exact shape
    * `SparkSessionExtensions.injectFunction` and `FunctionRegistry.registerFunction`
    * consume.
    */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors"),
      buildCosine _),
    (FunctionIdentifier("graft_cosine_to_probe"),
      info("graft_cosine_to_probe",
        "graft_cosine_to_probe(vec, probe) - cosine of vec against a constant probe vector"),
      buildCosineToProbe _))

  /** Register the functions on an already-running session (temporary-function registry,
    * session-scoped — the imperative twin of [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = descriptors.foreach { case (id, fi, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
  }
}
