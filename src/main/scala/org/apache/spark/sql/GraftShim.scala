package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API.
  *
  * Spark 4 rebased `Column` onto `ColumnNode` (connect/classic split), so
  * the Spark-3-era `new Column(expr)` is gone; the supported conversion
  * helpers live in `org.apache.spark.sql.classic` with `private[sql]`
  * visibility. This object sits in the `org.apache.spark.sql` package for
  * access, and is the ONLY place in graft that does so.
  */
object GraftShim {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Recover the Catalyst expression behind a (classic) Column. */
  def toExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom LogicalPlan as a DataFrame — the entry point for
    * graft's injected plan nodes (e.g. [[graft.plans.AsOfJoinPlan]]).
    * `Dataset.ofRows` is private[sql]; this is the sanctioned crossing.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
  ): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until every queued listener event (including
    * QueryExecutionListener dispatches, which ride the shared
    * LiveListenerBus) has been delivered — lets a writer read
    * listener-captured observed metrics immediately after its write
    * action returns. `waitUntilEmpty` is private[spark]; this shim is
    * the sanctioned crossing point.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a custom expression under a SQL function name, so
    * `spark.sql("SELECT graft_erf(x) ...")` works alongside the Column API.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression,
  ): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
