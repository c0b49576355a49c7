package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into Spark's `private[sql]` Column⇄Expression
  * converters — the supported pattern for external connectors/extensions
  * that define native Catalyst expressions (the public API deliberately
  * hides Expression behind ColumnNode since Spark 4). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a [[org.apache.spark.sql.SparkSessionExtensions]]' injected
    * functions to a registry (the hook the session builder calls —
    * `private[sql]`, bridged for extension tests). */
  def registerFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)

  /** Fully CONVERT a Column tree to a Catalyst expression (recursing
    * through the ColumnNode), unlike [[expression]] which returns a
    * lazy wrapper the analyzer treats as opaque — required when the
    * result is handed to the function registry. */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
