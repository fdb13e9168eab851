package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the direct Column(expr)
  * constructor internal; `org.apache.spark.sql.classic.ExpressionUtils` is
  * `private[sql]`, so this one-file shim lives under the org.apache.spark.sql
  * namespace to re-export the two conversions the graft engine needs for its
  * custom aggregate expressions. No Spark internals are forked. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
