package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> catalyst Expression conversions, needed to
  * expose graft's native (codegen'd) Catalyst expressions as user-facing `Column`s.
  * The standard extension-library pattern: one object inside the sql package, nothing
  * else reaches across the boundary.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. [[expression]] wraps the column node lazily
    * (`ColumnNodeExpression`), which only the Dataset API boundary unwraps — inside a
    * `FunctionRegistry` builder the analyzer would see an Unevaluable leftover and fail
    * at codegen. This converts the whole node tree to catalyst immediately (nested
    * functions become ordinary `UnresolvedFunction`s the analyzer then resolves).
    */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Drain the Spark listener bus (bounded wait). QueryExecutionListener events are
    * delivered asynchronously; a debug capture that unregisters its listener without
    * draining would race its own events. `waitUntilEmpty` is `private[spark]`, hence
    * surfaced here.
    */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
