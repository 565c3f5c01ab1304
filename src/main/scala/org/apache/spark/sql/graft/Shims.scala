package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Bridge into `private[sql]` Spark internals (the standard extension-library
 * pattern: a shim object compiled into an org.apache.spark.sql subpackage).
 * Kept to the minimum surface: Column <-> Expression conversion and session
 * function registration for graft's native expressions.
 */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Page size for task-side external sorters (TaskMemoryManager is
    * private[spark]); call only inside a running task. */
  def taskPageSizeBytes(): Long =
    org.apache.spark.TaskContext.get().taskMemoryManager().pageSizeBytes()

  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
