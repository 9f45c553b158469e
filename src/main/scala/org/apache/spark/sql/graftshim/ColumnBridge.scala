package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one Spark-internal bridge this library uses: Column <->
  * Expression conversion, which Spark 4 moved behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Needed to expose a
  * custom codegen'd Catalyst `Expression` through the public Column
  * API. Kept to exactly these two one-line delegations so the internal
  * surface area is minimal and auditable.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
