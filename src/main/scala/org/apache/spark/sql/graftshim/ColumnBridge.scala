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

/** Session-level native-function registration (FunctionRegistry is
  * reachable only through the `private[sql]` sessionState) — lets
  * `Graft.ensure` expose codegen'd expressions in SQL for sessions not
  * configured with `spark.sql.extensions=graft.plans.GraftExtensions`. */
object FunctionShim {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def register(spark: SparkSession, name: String, info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

/** Mixin giving a unary expression an implicit cast of its input to
  * string — the behavior a registered Scala UDF with a String
  * parameter had. Lives here because `AbstractDataType` (the
  * `inputTypes` element type) is `private[sql]` in Spark 4. */
trait StringInputCast
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}
