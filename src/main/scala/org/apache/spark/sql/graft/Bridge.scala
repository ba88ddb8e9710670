package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Bridges the public Column API and Catalyst Expressions on Spark 4.x
 * (post-Connect split). Lives under org.apache.spark.sql so the
 * `private[sql]` classic converters are reachable; everything else in
 * graft uses only this narrow surface.
 */
object Bridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column into the Catalyst expression it denotes — eagerly
   * converted (a lazy ColumnNodeExpression wrapper would survive into
   * FunctionRegistry-built trees and fail codegen). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Parse a SQL expression string with the active session's parser. */
  def parse(sql: String): Expression =
    SparkSession.getActiveSession
      .map(_.sessionState.sqlParser.parseExpression(sql))
      .getOrElse(CatalystSqlParser.parseExpression(sql))
}
