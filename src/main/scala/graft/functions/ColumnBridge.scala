// Bridge into Spark's private[sql] Column<->Expression converters.
// Spark 4 hides the classic Column(expr) constructor behind
// private[sql] ExpressionUtils; custom Catalyst expressions (the
// supported extension mechanism for native functions) still need it.
// This one-file package intrusion is the conventional way to expose it.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same intrusion for the `private[sql]` type-expectation machinery:
  * `ExpectsInputTypes.inputTypes` is typed against `AbstractDataType`,
  * which custom expressions outside `org.apache.spark.sql` cannot name
  * directly. The alias + factory below let them declare analysis-time
  * input types (clean AnalysisException instead of a runtime
  * ClassCastException on misuse from SQL). */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  def oneOf(ts: AbstractType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(ts: _*)
}
