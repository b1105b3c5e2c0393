package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-mode Column ⇄ Expression conversion. Spark 4 wraps columns
  * in ColumnNode (Connect-compatible) and gates the Expression view
  * behind private[sql] ExpressionUtils; this package-nested forwarder
  * is the minimal hatch custom Catalyst expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
