package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the classic converters
  * `private[sql]`, so extension libraries host this two-liner inside the
  * `org.apache.spark.sql` package tree — the standard pattern for
  * third-party Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; this public alias
    * lets our expressions declare `ExpectsInputTypes.inputTypes` (so
    * misuse fails at ANALYSIS time) from outside the package tree.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
