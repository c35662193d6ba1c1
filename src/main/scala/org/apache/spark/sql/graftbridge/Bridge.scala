package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these `private[sql]`
  * (columnNodeSupport.scala); exposing them from inside the sql package
  * is the public-repo idiom for native-expression libraries (cf. the
  * package-placement pattern in SNIPPETS.md [2]/[3]). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
