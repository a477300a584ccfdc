package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made `Column` connect-agnostic and hid the Column↔Expression
  * bridge behind `private[sql]` (`classic.ExpressionUtils`). Custom Catalyst
  * expressions still need it, so this one-file shim lives in the
  * `org.apache.spark.sql` namespace — the standard pattern used by Spark
  * extension libraries. No other internals are touched. */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
