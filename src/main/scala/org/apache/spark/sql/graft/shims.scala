package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into `private[sql]` Spark APIs: wrap a Catalyst [[Expression]] in a
  * user-facing [[Column]] and register SQL functions in the session registry.
  * Lives under `org.apache.spark.sql` solely for access; contains no logic. */
object Shims {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Nullability-insensitive schema equality (`DataType.sameType` is
    * `private[sql]`): same field names, types and order. */
  def sameType(a: org.apache.spark.sql.types.DataType,
               b: org.apache.spark.sql.types.DataType): Boolean =
    a.sameType(b)

  /** Catalyst predicate -> data source [[org.apache.spark.sql.sources.Filter]]
    * (`DataSourceStrategy.translateFilter` is `protected[sql]`): the exact
    * translation Spark's own pushdown performs, reused for file-granular
    * `where` scoping in maintenance procedures. */
  def translateFilter(predicate: Expression,
                      supportNestedPredicatePushdown: Boolean)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown)

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)
  }
}
