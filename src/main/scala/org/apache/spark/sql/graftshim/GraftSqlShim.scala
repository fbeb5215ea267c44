package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4 moved
  * `new Column(expr)` behind `classic.ExpressionUtils`). Lives under the
  * `org.apache.spark.sql` package solely to satisfy the access modifier —
  * the standard pattern for Spark extension libraries shipping custom
  * Catalyst expressions.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
