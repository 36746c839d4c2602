package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression converters.
  *
  * Spark 4 hides these behind `private[sql]` (`classic.ExpressionUtils`
  * backs the public Column API itself); a one-object bridge inside the
  * sql package tree is the standard extension-library technique for
  * exposing custom native expressions as Columns — no Spark internals
  * are modified or copied.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The analyzed logical plan backing a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a (possibly custom) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame once every consumer has been MATERIALIZED (eager
    * checkpoints only — after the next checkpoint in a chain exists,
    * its predecessors' blocks are dead weight). localCheckpoint
    * persists the underlying RDD directly, bypassing the cache
    * manager, so `Dataset.unpersist()` can't reach it; the RDD handle
    * on the LogicalRDD leaf can. No-op for anything else.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
