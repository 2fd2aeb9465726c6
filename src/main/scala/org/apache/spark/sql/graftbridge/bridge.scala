package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 marks `ExpressionUtils`
  * private[sql], so third-party native expressions (graft.functions.*)
  * reach it through this one-file shim in the sql namespace — the same
  * technique Delta/Frameless-style extension libraries use. Nothing
  * else of Spark's internals is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
