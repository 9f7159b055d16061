package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters so graft's
  * native Catalyst expressions (graft.functions.NativeExprs) can be
  * exposed as plain `Column`s. This is the same mechanism Spark's own
  * `functions` object uses; nothing else from the private API is
  * touched.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Install a function builder into an existing session's registry —
    * `sessionState` is `private[sql]`, hence this bridge member. */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** DataFrame from a (resolved) logical plan — used to hand graft's
    * custom logical operators (e.g. graft.plans.GroupedTopK) back to the
    * session, exactly as Dataset.ofRows does internally. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
