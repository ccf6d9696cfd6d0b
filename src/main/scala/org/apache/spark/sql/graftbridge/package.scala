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

  /** Re-bind an analyzed logical plan to another session — the private
    * `Dataset.ofRows`. Used by iterative operators that run their loop in
    * a conf-isolated cloned session (same SparkContext and shared state,
    * separate SQLConf) so per-loop tuning never mutates the caller's
    * session configuration.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
