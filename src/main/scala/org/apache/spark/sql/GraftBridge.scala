package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: Spark 4 made direct
  * Column<->Expression conversion internal (`classic.ExpressionUtils`);
  * third-party native expressions still need it. This file lives in the
  * `org.apache.spark.sql` package solely to re-export those two calls —
  * the standard extension-library pattern. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a `SparkSessionExtensions`' injected functions to a registry —
    * `registerFunctions` is `private[sql]`; exposed so the GraftExtensions
    * injection path is testable without tearing down the shared session. */
  def applyInjectedFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : Unit = ext.registerFunctions(registry)
}
