package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`; extension libraries that ship custom Catalyst
  * expressions conventionally expose this pair from inside the package
  * (the supported alternative — registering a FunctionBuilder — buys
  * nothing for an internal, non-SQL-facing expression).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
