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

  /** Register a function builder on an EXISTING session's registry —
    * `withExtensions` only applies to sessions it creates, so a library
    * attaching to a live session (notebooks, shared test JVMs) needs
    * the `private[sql]` `sessionState.functionRegistry` handle. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        info, builder)
}
