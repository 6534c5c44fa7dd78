package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column⇄Expression conversion so
  * graft's custom codegen Expressions ([[graft.functions.L2Normalize]])
  * can be used as plain Columns without a per-session function-registry
  * round-trip. Lives under `org.apache.spark.sql` solely for the access
  * scope; no Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
