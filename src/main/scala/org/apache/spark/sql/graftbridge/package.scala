package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for the package-private Column <-> Expression
  * converters — the supported pattern for third-party Catalyst expression
  * libraries on Spark 4 (the classic `new Column(expr)` constructor moved
  * behind `private[sql] ExpressionUtils`).
  */
package object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
