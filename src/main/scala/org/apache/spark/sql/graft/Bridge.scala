package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: Spark 4 hides Expression↔Column conversion behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). Custom
  * Catalyst expressions (e.g. [[graft.functions.expressions.DotProductLong]])
  * need exactly these two conversions to surface as `Column` functions, so we
  * expose them from inside the sql package — the same pattern third-party
  * Spark extensions use. Nothing else from the internals is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
