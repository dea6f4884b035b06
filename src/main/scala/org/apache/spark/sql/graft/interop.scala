/*
 * Interop shim: bridges graft's custom Catalyst Expressions to the public
 * Column API. Spark 4 made Column a thin wrapper over ColumnNode and moved
 * the Expression<->Column conversions behind `private[sql]`
 * (org.apache.spark.sql.classic.ExpressionUtils), so extension libraries
 * host this one-file accessor inside the org.apache.spark.sql package.
 * No Spark internals are modified; this only re-exports two conversions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object interop {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-export of the `private[sql]` AbstractDataType so graft expressions
    * can declare `ExpectsInputTypes.inputTypes` (plan-time type errors
    * instead of runtime ClassCastExceptions). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
